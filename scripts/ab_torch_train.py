"""Same-data torch-vs-JAX training A/B (r3 verdict #6).

Trains the REFERENCE recipe (torch model gtcrn_micro/models/gtcrn_micro.py,
HybridLoss, Adam lr=1e-3, LinearWarmupCosineAnnealingLR stepped per update,
grad clip 3.0, full-Hann training STFT -- train.py:245-299) and THIS
framework's jit'd train step on the IDENTICAL synthetic corpus, identical
batch order, identical initial weights (torch init exported and imported
through io/torch_ckpt), then compares the per-step loss curves and final
val SI-SNR.  Converts "the training stack looks right" into "the training
stack matches the reference recipe numerically".

The reference's own Dataset/Trainer need librosa/soundfile/omegaconf/pesq
(absent here, zero egress), so this driver feeds both trainers numpy
batches directly -- the compared surface is the full numerical recipe:
STFT -> forward (train-mode BN) -> loss -> backward -> clip -> Adam ->
scheduler -> BN running-stat update.

Runs on CPU (both sides; JAX pinned before first device op).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FS = 16000


def make_corpus(n_clips: int, seconds: float, seed: int = 43):
    """Deterministic tone-mixture corpus (the make_smoke_data recipe)."""
    rng = np.random.default_rng(seed)
    n = int(seconds * FS)
    t = np.arange(n) / FS
    clean, noisy = [], []
    for _ in range(n_clips):
        freqs = rng.uniform(100, 2000, size=3)
        amps = rng.uniform(0.05, 0.2, size=3)
        c = sum(a * np.sin(2 * np.pi * f * t)
                for a, f in zip(amps, freqs)).astype(np.float32)
        nz = rng.standard_normal(n).astype(np.float32)
        nz *= np.std(c) / np.std(nz) / 10 ** (5 / 20)
        clean.append(c)
        noisy.append(c + nz)
    return np.stack(noisy), np.stack(clean)


def batch_order(n_clips: int, batch: int, steps: int, seed: int = 7):
    """Fixed shared batch schedule: shuffled epochs of clip indices."""
    rng = np.random.default_rng(seed)
    order = []
    pool = []
    while len(order) < steps:
        if len(pool) < batch:
            pool = list(rng.permutation(n_clips))
        order.append([pool.pop() for _ in range(batch)])
    return np.asarray(order[:steps])


def run_torch(noisy, clean, idx, ns, init_ckpt):
    import torch

    sys.path.insert(0, "/root/reference")
    from gtcrn_micro.loss import HybridLoss
    from gtcrn_micro.models.gtcrn_micro import GTCRNMicro as TorchModel
    from gtcrn_micro.utils.scheduler import LinearWarmupCosineAnnealingLR
    sys.path.pop(0)

    torch.manual_seed(43)
    tm = TorchModel()
    torch.save({"model": tm.state_dict()}, init_ckpt)
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    sched = LinearWarmupCosineAnnealingLR(
        opt, warmup_steps=ns.warmup, decay_until_step=ns.decay_until,
        max_lr=1e-3, min_lr=1e-6,
    )
    loss_fn = HybridLoss()
    win = torch.hann_window(512)  # the reference trains with FULL hann

    tm.train()
    losses = []
    for step in range(ns.steps):
        b = idx[step]
        nt = torch.from_numpy(noisy[b])
        ct = torch.from_numpy(clean[b])
        nspec = torch.stft(nt, 512, 256, 512, win, return_complex=False)
        cspec = torch.stft(ct, 512, 256, 512, win, return_complex=False)
        loss = loss_fn(tm(nspec), cspec)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 3.0)
        opt.step()
        sched.step()
        losses.append(float(loss))

    # final val enhancement (eval mode, running BN stats)
    tm.eval()
    val_n = torch.from_numpy(noisy)
    with torch.no_grad():
        spec = torch.stft(val_n, 512, 256, 512,
                          torch.hann_window(512).pow(0.5),
                          return_complex=False)
        enh = tm(spec)
        wav = torch.istft(enh[..., 0] + 1j * enh[..., 1], 512, 256, 512,
                          window=torch.hann_window(512).pow(0.5),
                          length=noisy.shape[1])
    return losses, wav.numpy()


def run_jax(noisy, clean, idx, ns, init_ckpt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
    from gtcrn_micro_tpu.io import import_reference_checkpoint
    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
    from gtcrn_micro_tpu.train.scheduler import WarmupCosineConfig
    from gtcrn_micro_tpu.train.trainer import make_optimizer, make_train_step

    model = GTCRNMicro()
    params = import_reference_checkpoint(init_ckpt)
    optimizer = make_optimizer(
        params,
        WarmupCosineConfig(warmup_steps=ns.warmup,
                           decay_until_step=ns.decay_until,
                           max_lr=1e-3, min_lr=1e-6),
        clip_grad_norm=3.0,
    )
    step_fn = jax.jit(make_train_step(model, optimizer))
    opt_state = optimizer.init(params)

    losses = []
    for step in range(ns.steps):
        b = idx[step]
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(noisy[b]), jnp.asarray(clean[b])
        )
        losses.append(float(loss))

    w = sqrt_hann_window(512)
    enh = model.apply_jit(params, stft(jnp.asarray(noisy), w))
    wav = np.asarray(istft(enh, w, length=noisy.shape[1]))
    return losses, wav


def si_snr(ref: np.ndarray, est: np.ndarray) -> float:
    ref = ref - ref.mean(-1, keepdims=True)
    est = est - est.mean(-1, keepdims=True)
    s = (est * ref).sum(-1, keepdims=True) * ref / (ref**2).sum(
        -1, keepdims=True
    )
    e = est - s
    return float(np.mean(
        10 * np.log10((s**2).sum(-1) / np.maximum((e**2).sum(-1), 1e-20))
    ))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--clips", type=int, default=48)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--warmup", type=int, default=30)
    ap.add_argument("--decay_until", type=int, default=300)
    ap.add_argument("--out", default="/tmp/ab_torch_train.json")
    ns = ap.parse_args()

    noisy, clean = make_corpus(ns.clips, ns.seconds)
    idx = batch_order(ns.clips, ns.batch, ns.steps)
    init_ckpt = "/tmp/ab_torch_init.tar"

    print(f"torch side: {ns.steps} steps ...", flush=True)
    tl, twav = run_torch(noisy, clean, idx, ns, init_ckpt)
    print(f"jax side: {ns.steps} steps ...", flush=True)
    jl, jwav = run_jax(noisy, clean, idx, ns, init_ckpt)

    tl, jl = np.asarray(tl), np.asarray(jl)
    rel = np.abs(tl - jl) / np.abs(tl)
    for s in range(0, ns.steps, max(ns.steps // 10, 1)):
        print(f"step {s:4d}: torch {tl[s]:8.4f}  jax {jl[s]:8.4f}  "
              f"rel {rel[s]:.2e}", flush=True)
    base = si_snr(clean, noisy)
    tv, jv = si_snr(clean, twav), si_snr(clean, jwav)
    summary = {
        "steps": ns.steps,
        "loss_rel_diff_mean": float(rel.mean()),
        "loss_rel_diff_max": float(rel.max()),
        "first_loss": [float(tl[0]), float(jl[0])],
        "last10_loss_mean": [float(tl[-10:].mean()), float(jl[-10:].mean())],
        "val_sisnr_db": {"noisy_baseline": base, "torch": tv, "jax": jv},
    }
    print(json.dumps(summary), flush=True)
    with open(ns.out, "w") as f:
        json.dump({"torch_loss": tl.tolist(), "jax_loss": jl.tolist(),
                   **summary}, f)


if __name__ == "__main__":
    main()
