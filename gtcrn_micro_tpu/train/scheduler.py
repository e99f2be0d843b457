"""Linear-warmup + cosine-annealing LR schedule.

Pure function of the step (reference utils/scheduler.py:39-51): linear
0 -> max_lr over ``warmup_steps``, cosine max -> min until
``decay_until_step``, then ``min_lr``.  Jittable so it lives inside the
compiled update step (no host round-trip per step, unlike the torch
_LRScheduler machinery).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WarmupCosineConfig:
    warmup_steps: int = 25000
    decay_until_step: int = 250000
    max_lr: float = 1e-3
    min_lr: float = 1e-6


def warmup_cosine_lr(step, config: WarmupCosineConfig = WarmupCosineConfig()):
    """step: int array/scalar -> lr (float32), jit-safe."""
    step = jnp.asarray(step, jnp.float32)
    w = float(config.warmup_steps)
    d = float(config.decay_until_step)
    warm = config.max_lr * step / w
    decay_ratio = jnp.clip((step - w) / (d - w), 0.0, 1.0)
    coeff = 0.5 * (1.0 + jnp.cos(jnp.pi * decay_ratio))
    cosine = config.min_lr + coeff * (config.max_lr - config.min_lr)
    lr = jnp.where(step < w, warm, jnp.where(step > d, config.min_lr, cosine))
    return lr.astype(jnp.float32)
