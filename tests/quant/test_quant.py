"""Quantization path tests: fake-quant properties, PTQ, path uniqueness,
quantized streaming == quantized offline (the golden property extended to the
int8 path -- reference utils/output_tests.py's tri-runtime parity, here one
graph)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.models import GTCRNMicro
from gtcrn_micro_tpu.quant import (
    act_qparams,
    fake_quant,
    make_quantized_model,
    observe_ranges,
    weight_qparams,
)


@pytest.fixture(scope="module")
def setup():
    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    calib = jnp.asarray(
        rng.standard_normal((4, 257, 16, 2)).astype(np.float32) * 0.3
    )
    return model, params, calib


def test_fake_quant_properties():
    qp = act_qparams(jnp.float32(-1.0), jnp.float32(3.0))
    # zero is exactly representable (zero-padding stays exact)
    assert float(fake_quant(jnp.float32(0.0), qp)) == 0.0
    # values round to within half a scale
    x = jnp.linspace(-1.0, 3.0, 1001)
    err = jnp.abs(fake_quant(x, qp) - x)
    assert float(err.max()) <= float(qp.scale) / 2 + 1e-7
    # out-of-range values clip
    assert float(fake_quant(jnp.float32(100.0), qp)) <= 3.01
    # straight-through gradient is identity inside the range
    g = jax.grad(lambda v: fake_quant(v, qp).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_int16_mode_finer_than_int8():
    lo, hi = jnp.float32(-2.0), jnp.float32(2.0)
    x = jnp.linspace(-2, 2, 4001)
    e8 = jnp.abs(fake_quant(x, act_qparams(lo, hi, 8)) - x).max()
    e16 = jnp.abs(fake_quant(x, act_qparams(lo, hi, 16)) - x).max()
    assert float(e16) < float(e8) / 100


def test_weight_qparams_per_channel():
    w = jnp.stack([jnp.ones((3, 3, 4)), 10 * jnp.ones((3, 3, 4))], axis=-1)
    qp = weight_qparams(w, channel_axis=3)
    assert qp.scale.shape == (1, 1, 1, 2)
    # each channel keeps full resolution despite the 10x range difference
    err = jnp.abs(fake_quant(w, qp) - w)
    assert float(err.max()) < 0.05


def test_observe_paths_unique(setup):
    """Regression: GTConvBlock/TCN pointwise layers must have distinct quant
    paths (a shared 'pw' name silently cross-applied qparams and cost 25 dB)."""
    model, params, calib = setup
    ranges = observe_ranges(model, params, calib, batch_size=4)
    # 1 sfe + 2 enc convs + 3 enc GTConv x5 + 8 TCN x3 + 3 dec GTConv x5
    # + 2 dec convs = 59 distinct activation paths
    assert len(ranges) == 59, sorted(ranges)
    assert "encoder/en2/pw1/in" in ranges
    assert "encoder/en2/pw2/in" in ranges
    assert "gtcn1/block0/pw1/in" in ranges
    assert "gtcn1/block0/pw3/in" in ranges


def test_quantized_offline_close_and_streaming_exact(setup):
    model, params, calib = setup
    qm = make_quantized_model(model, params, calib, batch_size=4,
                              percentile=100.0, act_bits=16)
    rng = np.random.default_rng(1)
    spec = jnp.asarray(rng.standard_normal((1, 257, 8, 2)).astype(np.float32) * 0.3)

    fp32 = model.apply(params, spec)
    q = qm.apply(params, spec)
    # int16 acts + int8 weights stay close to fp32 on in-distribution input
    assert float(jnp.abs(q - fp32).max()) < 0.1

    # quantized streaming == quantized offline (exact on CPU)
    state = qm.init_state(1)
    outs = []
    for t in range(spec.shape[2]):
        y, state = qm.step(params, state, spec[:, :, t : t + 1])
        outs.append(y)
    stream = jnp.concatenate(outs, axis=2)
    assert float(jnp.abs(stream - q).max()) < 1e-5


def test_per_channel_acts_streaming_exact_and_tighter(setup):
    """Per-channel activation scales (r4b, scripts/act_grid_perchannel.py):
    vector qparams per path, streaming == offline preserved, and the
    per-channel grid reconstructs a channel-range-spread tensor strictly
    better than the per-tensor grid."""
    model, params, calib = setup
    ranges = observe_ranges(model, params, calib, batch_size=4,
                            per_channel=True)
    assert len(ranges) == 59
    # minor-axis vectors, not scalars
    assert np.size(ranges["encoder/en2/pw1/in"][1]) > 1

    qm = make_quantized_model(model, params, calib, batch_size=4,
                              percentile=100.0, act_bits=8,
                              per_channel_acts=True)
    rng = np.random.default_rng(2)
    spec = jnp.asarray(
        rng.standard_normal((1, 257, 6, 2)).astype(np.float32) * 0.3)
    q = qm.apply(params, spec)

    state = qm.init_state(1)
    outs = []
    for t in range(spec.shape[2]):
        y, state = qm.step(params, state, spec[:, :, t : t + 1])
        outs.append(y)
    stream = jnp.concatenate(outs, axis=2)
    assert float(jnp.abs(stream - q).max()) < 1e-5

    # direct grid property: spread channels keep per-lane resolution
    x = jnp.concatenate(
        [jnp.linspace(-0.1, 0.1, 256)[:, None],
         jnp.linspace(-10.0, 10.0, 256)[:, None]], axis=1)
    pt = act_qparams(x.min(), x.max(), 8)
    pc = act_qparams(x.min(axis=0), x.max(axis=0), 8)
    e_pt = float(jnp.abs(fake_quant(x, pt) - x)[:, 0].max())
    e_pc = float(jnp.abs(fake_quant(x, pc) - x)[:, 0].max())
    assert e_pc < e_pt / 50


def test_qat_improves_post_quant_loss(setup):
    """QAT acceptance (VERDICT r1 item 3): a few straight-through QAT steps
    must REDUCE the quantized-path loss measured after quantization -- i.e.
    training through the int8 grid improves the int8 model, not just the
    fp32 weights underneath."""
    from gtcrn_micro_tpu.dsp.stft import hann_window, stft
    from gtcrn_micro_tpu.quant.fake_quant import act_qparams
    from gtcrn_micro_tpu.quant.ptq import FakeQuantizer
    from gtcrn_micro_tpu.train.loss import HybridLossConfig, hybrid_loss
    from gtcrn_micro_tpu.train.scheduler import WarmupCosineConfig
    from gtcrn_micro_tpu.train.trainer import make_optimizer, make_train_step

    model, params, _calib = setup
    rng = np.random.default_rng(2)
    clean = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32) * 0.05
    noisy = clean + jnp.asarray(
        rng.standard_normal((2, 4096)), jnp.float32) * 0.02

    window = hann_window(512)
    specs = np.asarray(stft(noisy, window))
    ranges = observe_ranges(model, params, specs, batch_size=2)
    qp = {k: act_qparams(jnp.float32(lo), jnp.float32(hi), 8)
          for k, (lo, hi) in ranges.items()}
    quantizer = FakeQuantizer(qp)

    def post_quant_loss(p):
        """Quantized forward in eval mode (running BN stats), HybridLoss."""
        from gtcrn_micro_tpu.nn.core import Ctx

        ctx = Ctx()
        ctx.quant = quantizer
        enh = model._forward(p, stft(noisy, window), ctx)
        return float(hybrid_loss(enh, stft(clean, window),
                                 HybridLossConfig()))

    before = post_quant_loss(params)

    opt = make_optimizer(params, WarmupCosineConfig(
        warmup_steps=2, decay_until_step=40, max_lr=2e-3))
    step = jax.jit(make_train_step(model, opt, quantizer=quantizer,
                                   freeze_bn=True))
    opt_state = opt.init(params)
    p = params
    for _ in range(10):
        p, opt_state, _loss = step(p, opt_state, noisy, clean)

    after = post_quant_loss(p)
    assert np.isfinite(after)
    assert after < before, (before, after)
    # freeze_bn really froze the running stats
    np.testing.assert_array_equal(
        np.asarray(p["encoder"]["en0"]["bn"]["running_mean"]),
        np.asarray(params["encoder"]["en0"]["bn"]["running_mean"]),
    )


def test_qat_pipeline_functions(tmp_path, setup):
    """quant/qat.py building blocks on synthetic wavs: corpus pairing,
    calibration, a fine-tune step, and the quality probe."""
    from gtcrn_micro_tpu.io.wav import write_wav
    from gtcrn_micro_tpu.quant.qat import (
        build_distill_corpus,
        calibrate_act_qparams,
        enhance_fp32,
        qat_finetune,
        quant_wav_snr,
    )

    model, params, _calib = setup
    rng = np.random.default_rng(11)
    paths = []
    for i in range(2):
        wav = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
        p = str(tmp_path / f"n{i}.wav")
        write_wav(p, wav, 16000)
        paths.append(p)

    noisy, target = build_distill_corpus(model, params, paths,
                                         segment_seconds=1.0)
    assert noisy.shape == target.shape == (4, 16000)
    # targets really are the fp32 model's own output per segment
    w0 = enhance_fp32(model, params, noisy[0])
    # (segment target comes from the full-wav enhancement; ends may differ
    # by edge effects, interiors must agree)
    np.testing.assert_allclose(target[0][2048:-2048], w0[2048:-2048],
                               atol=2e-3)

    act_qp = calibrate_act_qparams(model, params, noisy, act_bits=8)
    assert len(act_qp) == 59

    before = quant_wav_snr(model, params, act_qp, noisy[0], target[0])
    assert np.isfinite(before)

    qat_params, losses = qat_finetune(
        model, params, noisy, target, act_qp,
        steps=2, batch_size=2, max_lr=1e-4, log_every=0,
    )
    assert len(losses) == 2 and np.isfinite(losses).all()
    after = quant_wav_snr(model, qat_params, act_qp, noisy[0], target[0])
    assert np.isfinite(after)
