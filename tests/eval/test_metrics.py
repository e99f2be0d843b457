"""Metric + config + ONNX-executor unit tests."""

import os

import numpy as np
import pytest

from gtcrn_micro_tpu.eval.metrics import sdr_metric, sisnr_metric, stoi_metric

from gtcrn_micro_tpu.eval.dnsmos import DEFAULT_MODEL_DIR as DNSMOS_DIR


def _speechish(n=32000, seed=0):
    """Modulated multi-tone signal (STOI needs band-limited structure)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    env = 0.5 * (1 + np.sin(2 * np.pi * 4 * t))
    x = sum(np.sin(2 * np.pi * f * t) for f in (220, 440, 880, 1760))
    return (env * x / 4 + 0.01 * rng.standard_normal(n)).astype(np.float32)


def test_sdr_sisnr_basics():
    x = _speechish()
    noise = np.random.default_rng(1).standard_normal(len(x)).astype(np.float32)
    noisy = x + 0.1 * noise

    assert sdr_metric(x, x) > 60
    assert sisnr_metric(x, x) > 60
    # SI-SNR is scale invariant (at finite error -- the eps floor breaks
    # it only in the zero-error regime), SDR is not
    assert abs(sisnr_metric(x, 0.5 * noisy) - sisnr_metric(x, noisy)) < 1e-3
    assert sdr_metric(x, 0.5 * x) < 10
    # less noise -> better scores
    assert sisnr_metric(x, noisy) > sisnr_metric(x, x + 0.5 * noise)


def test_stoi_monotonic_in_snr():
    x = _speechish()
    noise = np.random.default_rng(2).standard_normal(len(x)).astype(np.float32)
    clean_score = stoi_metric(x, x)
    mid = stoi_metric(x, x + 0.2 * noise)
    bad = stoi_metric(x, x + 2.0 * noise)
    assert clean_score > 0.95
    assert clean_score >= mid >= bad
    assert bad < 0.8


def test_config_interpolation(tmp_path):
    from gtcrn_micro_tpu.utils.config import load_config

    p = tmp_path / "c.yaml"
    p.write_text(
        "a:\n  b: 3\n  c: ${a.b}\nd: ${a.c}\nnested:\n  e: ${a.b}\n"
    )
    cfg = load_config(str(p))
    assert cfg["a"]["c"] == 3
    assert cfg["d"] == 3
    assert cfg.nested.e == 3  # attribute access


@pytest.mark.skipif(not os.path.isdir(DNSMOS_DIR), reason="no DNSMOS models")
def test_onnx_executor_dnsmos_models():
    from gtcrn_micro_tpu.io.onnx import OnnxModel

    primary = OnnxModel(os.path.join(DNSMOS_DIR, "sig_bak_ovr.onnx"))
    assert primary.input_names == ["input_1"]
    x = np.zeros((1, 144160), np.float32)
    out = primary(x)
    assert out[0].shape == (1, 3)
    # deterministic
    np.testing.assert_array_equal(out[0], primary(x)[0])

    p808 = OnnxModel(os.path.join(DNSMOS_DIR, "model_v8.onnx"))
    mel = np.random.default_rng(0).random((1, 200, 120)).astype(np.float32)
    assert p808(mel)[0].shape == (1, 1)


def test_dnsmos_melspec_shape_and_scale():
    from gtcrn_micro_tpu.eval.dnsmos import audio_melspec, mel_filterbank

    fb = mel_filterbank(16000, 321, 120)
    assert fb.shape == (120, 161)
    assert (fb >= 0).all()
    mel = audio_melspec(_speechish(144000))
    assert mel.shape[1] == 120
    # (db+40)/40 scaling: max is (0+40)/40 = 1.0 exactly (ref=max)
    assert abs(float(mel.max()) - 1.0) < 1e-5
    assert float(mel.min()) >= (-80 + 40) / 40 - 1e-5
