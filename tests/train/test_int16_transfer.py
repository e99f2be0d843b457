"""int16 transfer path: raw PCM to device, dequantize in-graph, bit-exact.

The axon tunnel client journals every host->device payload for session
park/restore, so host RSS grows with bytes transferred (PERF.md r5 leak
probes).  The data path therefore ships raw 16-bit PCM — the wavs' native
encoding — and the jit'd step dequantizes ``x / 32768`` on device.  These
tests pin the contract that makes that free: the int16 path is BIT-exact
vs the reference-exact float32 host conversion, end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.io.wav import read_wav, write_wav
from gtcrn_micro_tpu.train.dataloader import PairedWavDataset


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("i16")
    rng = np.random.default_rng(0)
    for d in ("noisy", "clean"):
        (root / d).mkdir()
    for i in range(3):
        x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        n = x + (rng.standard_normal(16000) * 0.05).astype(np.float32)
        write_wav(str(root / "clean" / f"fileid_{i}.wav"), x, 16000)
        write_wav(str(root / "noisy" / f"fileid_{i}.wav"), n, 16000)
    return str(root)


def test_read_wav_int16_matches_float(corpus):
    p = f"{corpus}/noisy/fileid_0.wav"
    f32, fs = read_wav(p)
    i16, fs2 = read_wav(p, dtype=np.int16)
    assert fs == fs2 and i16.dtype == np.int16
    np.testing.assert_array_equal(i16.astype(np.float32) / 32768.0, f32)


def test_read_wav_int16_rejects_non_pcm16(tmp_path):
    # write a float32-format wav by hand: int16 read must refuse, not lie
    import struct
    import wave as _unused  # noqa: F401

    data = np.zeros(16, np.float32).tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    blob = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    p = tmp_path / "f32.wav"
    p.write_bytes(blob)
    with pytest.raises(ValueError, match="16-bit PCM"):
        read_wav(str(p), dtype=np.int16)


def test_dataset_int16_transfer_bit_exact(corpus):
    kw = dict(noisy_root=f"{corpus}/noisy", fs=16000, length_seconds=1.0,
              train=True, num_data_per_epoch=3)
    ds_f = PairedWavDataset(**kw)
    ds_i = PairedWavDataset(transfer_dtype="int16", **kw)
    nf, cf = ds_f.load_item(0)
    ni, ci = ds_i.load_item(0)
    assert ni.dtype == np.int16 and ci.dtype == np.int16
    np.testing.assert_array_equal(ni.astype(np.float32) / 32768.0, nf)
    np.testing.assert_array_equal(ci.astype(np.float32) / 32768.0, cf)


def test_train_and_eval_steps_bit_exact_on_int16(corpus):
    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro
    from gtcrn_micro_tpu.train.trainer import (
        make_eval_step, make_optimizer, make_train_step,
    )

    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(params)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(model, optimizer))
    eval_step = jax.jit(make_eval_step(model))

    ds = PairedWavDataset(noisy_root=f"{corpus}/noisy", fs=16000,
                          length_seconds=1.0, train=True,
                          num_data_per_epoch=3, transfer_dtype="int16")
    ni, ci = ds.load_item(0)
    ni = np.stack([ni, ni])
    ci = np.stack([ci, ci])
    nf = ni.astype(np.float32) / 32768.0
    cf = ci.astype(np.float32) / 32768.0

    p_i, o_i, loss_i = step(params, opt_state, jnp.asarray(ni),
                            jnp.asarray(ci))
    p_f, o_f, loss_f = step(params, opt_state, jnp.asarray(nf),
                            jnp.asarray(cf))
    assert float(loss_i) == float(loss_f)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p_i, p_f,
    )

    el_i, spec_i = eval_step(params, jnp.asarray(ni), jnp.asarray(ci))
    el_f, spec_f = eval_step(params, jnp.asarray(nf), jnp.asarray(cf))
    assert float(el_i) == float(el_f)
    np.testing.assert_array_equal(np.asarray(spec_i), np.asarray(spec_f))
