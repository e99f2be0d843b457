"""Training entry point: ``python -m gtcrn_micro_tpu.train.train -C <cfg.yaml>``.

TPU-native counterpart of the reference trainer app (train.py:37-473).  One
process drives all local devices (single-controller JAX); for multi-host runs
call with ``--distributed`` which invokes ``jax.distributed.initialize()``
before building the mesh -- no mp.spawn / rank plumbing / NCCL env vars
(reference train.py:39-47, utils/distributed_utils.py).

Per epoch:
- per-epoch random file subsample (reference dataloader.py:108-111)
- jit'd sharded train step per batch (STFT+fwd+bwd+clip+Adam+BN fold fused)
- validation: hybrid loss + per-utterance quality score -- wideband PESQ when
  the ``pesq`` package is importable (reference train.py:356-358), otherwise
  SI-SNR (documented fallback; this environment has no pesq)
- checkpoint {step, epoch, params, opt_state} via orbax; best-by-score kept
- metrics to JSONL + TensorBoard; sample enhanced wavs every 10 epochs
"""

from __future__ import annotations

import argparse
import os
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from gtcrn_micro_tpu.dsp.stft import hann_window, istft
from gtcrn_micro_tpu.io.wav import write_wav
from gtcrn_micro_tpu.models.registry import get_model
from gtcrn_micro_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from gtcrn_micro_tpu.train.dataloader import PairedWavDataset, PrefetchLoader
from gtcrn_micro_tpu.train.loss import HybridLossConfig
from gtcrn_micro_tpu.train.scheduler import WarmupCosineConfig, warmup_cosine_lr
from gtcrn_micro_tpu.train.trainer import (
    TrainerConfig,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from gtcrn_micro_tpu.utils.checkpoint import BestTracker, CheckpointManager
from gtcrn_micro_tpu.utils.config import load_config
from gtcrn_micro_tpu.utils.logging import MetricWriter


import functools


@functools.cache
def _pesq_scorer():
    """Wideband PESQ scorer (resolved ONCE -- a per-utterance import retry
    costs a sys.path scan for every validation clip).  Prefers the ITU
    ``pesq`` package (bit-identical to the reference's validation criterion,
    reference train.py:356-362); falls back to the in-repo from-spec
    implementation (eval/pesq.py), so best-checkpoint selection follows the
    reference recipe -- best-by-PESQ -- in every environment."""
    try:
        from pesq import pesq  # type: ignore

        return lambda ref, est, fs: pesq(fs, ref, est, "wb")
    except ImportError:
        from gtcrn_micro_tpu.eval.pesq import pesq_wb

        return lambda ref, est, fs: pesq_wb(ref, est, fs)


def quality_score(clean: np.ndarray, enhanced: np.ndarray, fs: int) -> float:
    """Per-utterance validation score: wideband PESQ (reference recipe).
    Returns NaN on scorer failure (e.g. PESQ NoUtterancesError on silence);
    callers must aggregate nan-aware."""
    try:
        return float(_pesq_scorer()(clean, enhanced, fs))
    except Exception:
        return np.nan


def run(config, *, distributed: bool = False, max_steps: int | None = None):
    if distributed:
        jax.distributed.initialize()

    trainer_kw = {**config.get("trainer", {}), **config.get("trainer_overrides", {})}
    trainer_cfg = TrainerConfig(**{
        k: v for k, v in trainer_kw.items()
        if k in TrainerConfig.__dataclass_fields__
    })
    sched_cfg = WarmupCosineConfig(
        **{k: float(v) if "lr" in k else int(v)
           for k, v in config.get("scheduler", {}).get("kwargs", {}).items()}
    )
    loss_cfg = HybridLossConfig(
        **{k: v for k, v in config.get("loss", {}).items()
           if k in HybridLossConfig.__dataclass_fields__}
    )

    exp_path = trainer_cfg.exp_path
    if not trainer_cfg.resume:
        exp_path = exp_path + "_" + datetime.now().strftime("%Y-%m-%d-%Hh%Mm")
    elif not os.path.isdir(os.path.join(exp_path, "checkpoints")):
        # resume convenience: exp_path may be the undated prefix -- pick the
        # most recent dated run that actually has checkpoints (a silent
        # fresh restart while the user believes they resumed is the failure
        # mode to avoid)
        import glob as _glob

        candidates = sorted(
            d for d in _glob.glob(exp_path + "_*")
            if os.path.isdir(os.path.join(d, "checkpoints"))
        )
        if candidates:
            exp_path = candidates[-1]
        else:
            raise FileNotFoundError(
                f"resume=true but no checkpoints under {exp_path} or any "
                f"{exp_path}_* run"
            )
    os.makedirs(exp_path, exist_ok=True)
    writer = MetricWriter(os.path.join(exp_path, "logs"))
    ckpt = CheckpointManager(os.path.join(exp_path, "checkpoints"))

    # archive the resolved config (reference snapshots config+code,
    # train.py:172-186; here the git repo is the code archive)
    import yaml

    with open(os.path.join(exp_path, "config.yaml"), "w") as f:
        yaml.safe_dump(config.to_dict(), f)

    # data
    train_ds = PairedWavDataset(**config["train_dataset"])
    valid_ds = PairedWavDataset(**config["valid_dataset"])
    train_loader = PrefetchLoader(train_ds, **config.get("train_dataloader", {}))
    valid_loader = PrefetchLoader(
        valid_ds, shuffle=False, drop_last=False,
        **config.get("valid_dataloader", {}),
    )

    # model + optimizer + mesh
    model = get_model(config.get("network", "gtcrn_micro"),
                      **config.get("network_config", {}))
    params = model.init(jax.random.PRNGKey(config.get("seed", 43)))
    optimizer = make_optimizer(params, sched_cfg, trainer_cfg.clip_grad_norm)
    opt_state = optimizer.init(params)

    mesh = make_mesh()
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    compute_dtype = (
        jnp.bfloat16 if trainer_cfg.precision == "bf16" else None
    )
    train_step = jax.jit(make_train_step(model, optimizer, loss_cfg, trainer_cfg,
                                         compute_dtype=compute_dtype),
                         donate_argnums=(0, 1))
    eval_step = jax.jit(make_eval_step(model, loss_cfg, trainer_cfg))

    start_epoch = 1
    step = 0
    if trainer_cfg.resume and ckpt.latest_step() is not None:
        restored = ckpt.restore(template={
            "params": params, "opt_state": opt_state,
            "epoch": 0, "step": 0,
        })
        params = replicate(mesh, restored["params"])
        opt_state = replicate(mesh, restored["opt_state"])
        start_epoch = int(restored["epoch"]) + 1
        step = int(restored["step"])
        print(f"resumed from step {step} (epoch {start_epoch - 1})")

    window = hann_window(trainer_cfg.win_len)
    best = BestTracker(os.path.join(exp_path, "checkpoints"))
    fs = trainer_cfg.samplerate

    # ``epochs`` is the TOTAL epoch count (reference train.py:406: the loop
    # runs start_epoch..epochs inclusive) -- a resumed run finishes the same
    # recipe instead of appending `epochs` more on top of the restored state.
    for epoch in range(start_epoch, trainer_cfg.epochs + 1):
        # --- train ---
        train_ds.sample_data_per_epoch()
        t0 = time.time()
        total_loss, n_batches = 0.0, 0
        # Per-step losses stay ON DEVICE between log points: a float() per
        # step is a blocking device round-trip (~28 ms through the tunnel)
        # that also serializes dispatch.  Flushing every log_every steps
        # keeps dispatch async while bounding the in-flight queue.
        pending_losses: list = []

        def _flush_losses():
            nonlocal total_loss
            if pending_losses:
                total_loss += float(jnp.stack(pending_losses).sum())
                pending_losses.clear()

        for noisy, clean in train_loader:
            noisy_s, clean_s = shard_batch(mesh, (noisy, clean))
            params, opt_state, loss = train_step(params, opt_state, noisy_s, clean_s)
            pending_losses.append(loss)
            n_batches += 1
            step += 1
            if step % trainer_cfg.log_every == 0:
                _flush_losses()
                writer.scalars(
                    step,
                    train_loss=total_loss / n_batches,
                    lr=float(warmup_cosine_lr(step, sched_cfg)),
                )
            if max_steps is not None and step >= max_steps:
                break
        _flush_losses()
        train_loss = total_loss / max(n_batches, 1)
        print(f"epoch {epoch}: train_loss={train_loss:.3f} "
              f"({n_batches} steps, {time.time() - t0:.0f}s)")

        # --- validate ---
        val_loss, val_score, n_utts, n_val = 0.0, 0.0, 0, 0
        for vi, (noisy, clean) in enumerate(valid_loader):
            n_val += 1
            loss, enhanced_spec = eval_step(params, jnp.asarray(noisy),
                                            jnp.asarray(clean))
            val_loss += float(loss)
            wav = np.asarray(istft(enhanced_spec, window,
                                   length=clean.shape[1]))
            if clean.dtype == np.int16:  # int16 transfer path: score in f32
                clean = clean.astype(np.float32) / 32768.0
            for b in range(wav.shape[0]):
                s = quality_score(clean[b], wav[b], fs)
                if np.isfinite(s):  # nan-aware: one failed PESQ must not
                    val_score += s  # poison the epoch / best tracking
                    n_utts += 1
            if vi == 0 and (epoch == 1 or epoch % 10 == 0):
                sample_dir = os.path.join(exp_path, "val_samples")
                os.makedirs(sample_dir, exist_ok=True)
                write_wav(os.path.join(
                    sample_dir, f"sample_1_enh_epoch{epoch:03d}.wav"),
                    wav[0], fs)
        # val_loss is a mean over batches -- independent of PESQ success
        # (previously n_utts==0 collapsed the divisor to 1, turning val_loss
        # into a SUM exactly when scoring broke; an empty loader left vi
        # unbound)
        val_loss /= max(n_val, 1)
        score = val_score / max(n_utts, 1)
        writer.scalars(step, val_loss=val_loss, val_score=score, epoch=epoch)
        print(f"epoch {epoch}: val_loss={val_loss:.3f} score={score:.4f}")

        # --- checkpoint ---
        # best-by-score is evaluated EVERY epoch (reference train.py:217-221),
        # periodic full checkpoints on the configured interval
        state = {"params": jax.tree.map(np.asarray, params),
                 "opt_state": jax.tree.map(np.asarray, opt_state),
                 "epoch": epoch, "step": step}
        if epoch % trainer_cfg.save_checkpoint_interval == 0:
            ckpt.save(step, state)
        best.update(step, score, ckpt, state)

        if max_steps is not None and step >= max_steps:
            break

    writer.close()
    ckpt.close()
    print(f"Training done. exp_path={exp_path} "
          f"best_score={best.best_score:.4f}")
    return exp_path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-C", "--config", default="configs/cfg_train_dns3.yaml")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize()")
    parser.add_argument("--max-steps", type=int, default=None)
    args = parser.parse_args()
    config = load_config(args.config)
    run(config, distributed=args.distributed, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
