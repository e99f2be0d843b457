"""Loss + scheduler parity vs the reference implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from gtcrn_micro_tpu.train.loss import HybridLossConfig, hybrid_loss, si_snr_db
from gtcrn_micro_tpu.train.scheduler import WarmupCosineConfig, warmup_cosine_lr

torch = pytest.importorskip("torch")


def test_hybrid_loss_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from gtcrn_micro.loss import HybridLoss as TorchLoss
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(0)
    pred = rng.standard_normal((2, 257, 63, 2)).astype(np.float32)
    true = rng.standard_normal((2, 257, 63, 2)).astype(np.float32)

    ref = TorchLoss()(torch.from_numpy(pred), torch.from_numpy(true)).item()
    ours = float(hybrid_loss(jnp.asarray(pred), jnp.asarray(true)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_scheduler_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from gtcrn_micro.utils.scheduler import LinearWarmupCosineAnnealingLR
    finally:
        sys.path.pop(0)

    cfg = WarmupCosineConfig(
        warmup_steps=25000, decay_until_step=250000, max_lr=1e-3, min_lr=1e-6
    )
    for step in [0, 1, 100, 24999, 25000, 100000, 249999, 250000, 300000]:
        ref = LinearWarmupCosineAnnealingLR.compute_lr(
            step, 25000, 250000, 1e-3, 1e-6
        )
        ours = float(warmup_cosine_lr(step, cfg))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-12)


def test_si_snr_db_known_value():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(8000).astype(np.float32)
    noise = rng.standard_normal(8000).astype(np.float32)
    # est = ref + noise at -10 dB relative power
    est = x + noise * np.sqrt(np.mean(x**2) / np.mean(noise**2)) * 10 ** (-0.5)
    val = float(si_snr_db(jnp.asarray(x)[None], jnp.asarray(est)[None])[0])
    assert 9.0 < val < 11.0
