"""Data-parallel trainer: one jit-compiled update step over a device mesh.

TPU-native redesign of the reference Trainer (train.py:114-444):

- the whole hot path (STFT of noisy+clean -> forward -> loss -> backward ->
  clip -> Adam -> BN running-stat fold) is ONE jit'd function; the reference
  crosses Python/device boundaries several times per step
- data parallelism is SPMD: batch sharded over the ``data`` mesh axis, params
  replicated; XLA fuses the gradient all-reduce into the backward pass
  (replaces DDP + NCCL + DistributedSampler + mp.spawn, train.py:37-111,
  utils/distributed_utils.py)
- training analysis STFT uses the *plain* Hann window exactly like the
  reference trainer (train.py:252); the loss's internal iSTFT uses sqrt-Hann
  (loss.py:50) -- the reference's window inconsistency, preserved deliberately
- LR schedule is part of the compiled step (per-step warmup-cosine, matching
  scheduler update_interval=step in cfg_train_DNS3.yaml)
- ERB filters and BN running stats are frozen via optax.multi_transform
  (reference: requires_grad=False, gtcrn_micro.py:24-25)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gtcrn_micro_tpu.dsp.stft import hann_window, stft
from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
from gtcrn_micro_tpu.nn.core import Ctx
from gtcrn_micro_tpu.train.loss import HybridLossConfig, hybrid_loss
from gtcrn_micro_tpu.train.scheduler import WarmupCosineConfig, warmup_cosine_lr

BN_MOMENTUM = 0.1  # torch BatchNorm2d default


def _dequant_audio(x):
    """int16 PCM -> f32 in [-1, 1) ON DEVICE, identity for float input.

    The data path may ship raw 16-bit PCM to halve host->device transfer
    bytes (dataloader.PairedWavDataset transfer_dtype="int16"); the scale
    is a power of two and int16 is exactly representable in f32, so this
    is bit-identical to converting on the host (io/wav.read_wav).  jit
    specializes on input dtype, so the branch costs nothing.
    """
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) * (1.0 / 32768.0)
    return x


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    epochs: int = 400
    clip_grad_norm: float = 3.0
    save_checkpoint_interval: int = 1
    exp_path: str = "exp/gtcrn_micro"
    resume: bool = False
    samplerate: int = 16000
    n_fft: int = 512
    hop_len: int = 256
    win_len: int = 512
    log_every: int = 50
    # "fp32" (exact reference recipe) or "bf16" (mixed precision: bf16
    # forward/backward on f32 masters -- see make_train_step.compute_dtype)
    precision: str = "fp32"


def param_labels(params) -> Any:
    """'train' for trainable leaves, 'freeze' for ERB filters / BN stats."""

    def label(path, _v):
        p = jax.tree_util.keystr(path)
        frozen = "erb" in p or "running_mean" in p or "running_var" in p
        return "freeze" if frozen else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    params,
    sched_cfg: WarmupCosineConfig = WarmupCosineConfig(),
    clip_grad_norm: float = 3.0,
) -> optax.GradientTransformation:
    """clip-by-global-norm -> Adam with per-step warmup-cosine LR, frozen
    leaves excluded (matches reference train.py:90-92,282)."""
    schedule = lambda count: warmup_cosine_lr(count, sched_cfg)  # noqa: E731
    adam = optax.chain(
        optax.clip_by_global_norm(clip_grad_norm),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )
    return optax.multi_transform(
        {"train": adam, "freeze": optax.set_to_zero()}, param_labels(params)
    )


def apply_bn_stats(params, stats: dict, momentum: float = BN_MOMENTUM):
    """Fold collected batch stats into running stats (torch update rule:
    biased var normalises inside the forward, unbiased var accumulates here).

    Purely functional tree rebuild -- jit/tracer safe.
    """
    grouped: dict[tuple, dict] = {}
    for path, value in stats.items():
        *parts, leaf = path.split("/")
        grouped.setdefault(tuple(parts), {})[leaf] = value

    consumed = set()

    def rec(node, prefix):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            p = prefix + (k,)
            if p in grouped and isinstance(v, dict):
                upd = grouped[p]
                consumed.add(p)
                nv = dict(v)
                if "batch_mean" in upd:
                    nv["running_mean"] = (
                        (1.0 - momentum) * nv["running_mean"]
                        + momentum * upd["batch_mean"]
                    )
                if "batch_var" in upd:
                    nv["running_var"] = (
                        (1.0 - momentum) * nv["running_var"]
                        + momentum * upd["batch_var"]
                    )
                out[k] = nv
            else:
                out[k] = rec(v, p)
        return out

    new_params = rec(params, ())
    missing = set(grouped) - consumed
    if missing:
        raise KeyError(f"BN stats with no matching params: {sorted(missing)}")
    return new_params


def make_train_step(
    model: GTCRNMicro,
    optimizer: optax.GradientTransformation,
    loss_cfg: HybridLossConfig = HybridLossConfig(),
    trainer_cfg: TrainerConfig = TrainerConfig(),
    quantizer=None,
    freeze_bn: bool = False,
    compute_dtype=None,
) -> Callable:
    """Returns jit-able ``step(params, opt_state, noisy, clean) ->
    (params, opt_state, loss)`` with noisy/clean (B, samples).

    ``quantizer``: optional ctx.quant hook (e.g. ``quant.FakeQuantizer``)
    for quantization-aware training -- fake-quant is a straight-through
    estimator, so the same jitted step trains through the int8 grid.

    ``freeze_bn``: normalise with the checkpoint's running stats instead of
    batch stats and do not update them -- the standard recipe when
    fine-tuning a TRAINED checkpoint (QAT): tiny fine-tune batches would
    otherwise drag the running stats away from the distribution the weights
    were trained under.  Gradients still flow to gamma/beta.

    ``compute_dtype``: ``jnp.bfloat16`` enables mixed-precision training --
    the forward/backward runs in bf16 (params cast inside the step; the
    MXU's native bf16-multiply/f32-accumulate mode) while the MASTER params,
    gradients-at-leaves, Adam state, loss, STFT analysis and BN statistics
    all stay f32 (BatchNorm computes its batch stats in f32 regardless of
    the activation dtype, nn/core.py).  ``None`` (default) keeps the exact
    f32 recipe of the reference (train.py:245-299)."""
    window = hann_window(trainer_cfg.win_len)

    def compute_loss(params, noisy, clean):
        noisy = _dequant_audio(noisy)
        clean = _dequant_audio(clean)
        noisy_spec = stft(
            noisy, window, trainer_cfg.n_fft, trainer_cfg.hop_len, trainer_cfg.win_len
        )
        clean_spec = stft(
            clean, window, trainer_cfg.n_fft, trainer_cfg.hop_len, trainer_cfg.win_len
        )
        p = params
        if compute_dtype is not None:
            # grads flow through the cast back to the f32 masters
            p = jax.tree.map(lambda v: v.astype(compute_dtype), params)
            noisy_spec = noisy_spec.astype(compute_dtype)
        ctx = Ctx(training=not freeze_bn)
        ctx.quant = quantizer
        enhanced = model._forward(p, noisy_spec, ctx)
        enhanced = enhanced.astype(clean_spec.dtype)  # loss always f32
        return hybrid_loss(enhanced, clean_spec, loss_cfg), ctx.stats

    def train_step(params, opt_state, noisy, clean):
        (loss, stats), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            params, noisy, clean
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = apply_bn_stats(params, stats)  # no-op when stats == {}
        return params, opt_state, loss

    return train_step


def make_eval_step(
    model: GTCRNMicro,
    loss_cfg: HybridLossConfig = HybridLossConfig(),
    trainer_cfg: TrainerConfig = TrainerConfig(),
) -> Callable:
    """Returns jit-able ``eval_step(params, noisy, clean) ->
    (loss, enhanced_spec)`` using running BN stats (eval mode)."""
    window = hann_window(trainer_cfg.win_len)

    def eval_step(params, noisy, clean):
        noisy = _dequant_audio(noisy)
        clean = _dequant_audio(clean)
        noisy_spec = stft(
            noisy, window, trainer_cfg.n_fft, trainer_cfg.hop_len, trainer_cfg.win_len
        )
        clean_spec = stft(
            clean, window, trainer_cfg.n_fft, trainer_cfg.hop_len, trainer_cfg.win_len
        )
        enhanced = model.apply(params, noisy_spec)
        loss = hybrid_loss(enhanced, clean_spec, loss_cfg)
        return loss, enhanced

    return eval_step
