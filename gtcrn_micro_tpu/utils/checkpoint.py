"""Orbax-backed checkpoint manager: {step, epoch, params, opt_state}.

Replaces the reference's ``torch.save({epoch, optimizer, scheduler, model})``
per-epoch tars (train.py:200-221) with orbax's atomic, async-friendly
checkpoints.  Best-model tracking by validation score and latest-checkpoint
resume (the reference sorts ``model_*.tar`` lexicographically,
train.py:224-226; orbax tracks steps natively).  The LR schedule is a pure
function of the optimizer step, so no scheduler state needs saving.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: dict, *, force: bool = False) -> None:
        self.manager.save(
            step, args=self._ocp.args.StandardSave(state), force=force
        )
        self.manager.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, step: int | None = None, template: Any = None) -> dict:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            template = jax.tree.map(np.asarray, template)
            return self.manager.restore(
                step, args=self._ocp.args.StandardRestore(template)
            )
        return self.manager.restore(step)

    def close(self) -> None:
        self.manager.close()


class BestTracker:
    """Track the best validation score and keep its state snapshot.

    The score is PERSISTED next to the snapshot (best_score.json) and
    reloaded on construction, so a resumed run cannot clobber the saved best
    checkpoint with a worse post-resume model."""

    def __init__(self, directory: str):
        import json

        self.directory = directory
        self.best_score = -np.inf
        self.best_step = None
        self._meta = os.path.join(directory, "best_score.json")
        if os.path.exists(self._meta):
            with open(self._meta) as f:
                meta = json.load(f)
            self.best_score = float(meta["best_score"])
            self.best_step = meta.get("best_step")

    def update(self, step: int, score: float, manager: CheckpointManager,
               state: dict) -> bool:
        import json

        if score > self.best_score:
            self.best_score = score
            self.best_step = step
            best = CheckpointManager(os.path.join(self.directory, "best"),
                                     max_to_keep=1)
            best.save(step, state, force=True)
            best.close()
            os.makedirs(self.directory, exist_ok=True)
            with open(self._meta, "w") as f:
                json.dump({"best_score": float(score), "best_step": step}, f)
            return True
        return False
