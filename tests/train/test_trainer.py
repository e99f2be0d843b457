"""Training-step correctness: loss decreases, freezing works, BN stats move,
and data-parallel execution over the 8-device CPU mesh matches single-device.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.models import GTCRNMicro
from gtcrn_micro_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from gtcrn_micro_tpu.train.scheduler import WarmupCosineConfig
from gtcrn_micro_tpu.train.trainer import (
    TrainerConfig,
    apply_bn_stats,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


@pytest.fixture(scope="module")
def setup():
    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    # fast warmup so the smoke test sees real updates
    sched = WarmupCosineConfig(warmup_steps=5, decay_until_step=100, max_lr=1e-3)
    opt = make_optimizer(params, sched)
    opt_state = opt.init(params)
    step_fn = jax.jit(make_train_step(model, opt))
    return model, params, opt, opt_state, step_fn


def _synthetic_batch(batch=4, n=4096, seed=0):
    rng = np.random.default_rng(seed)
    clean = rng.standard_normal((batch, n)).astype(np.float32) * 0.05
    noisy = clean + rng.standard_normal((batch, n)).astype(np.float32) * 0.02
    return jnp.asarray(noisy), jnp.asarray(clean)


def test_loss_decreases(setup):
    model, params, opt, opt_state, step_fn = setup
    noisy, clean = _synthetic_batch()
    losses = []
    for _ in range(12):
        params, opt_state, loss = step_fn(params, opt_state, noisy, clean)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_frozen_leaves_unchanged_and_bn_stats_move(setup):
    model, params0, opt, opt_state, step_fn = setup
    noisy, clean = _synthetic_batch(seed=1)
    params = params0
    for _ in range(3):
        params, opt_state, _ = step_fn(params, opt_state, noisy, clean)
    # ERB filters frozen
    np.testing.assert_array_equal(
        np.asarray(params["erb"]["bm_w"]), np.asarray(params0["erb"]["bm_w"])
    )
    # BN running stats DID move (via stat folding, not gradients)
    rm0 = np.asarray(params0["encoder"]["en0"]["bn"]["running_mean"])
    rm1 = np.asarray(params["encoder"]["en0"]["bn"]["running_mean"])
    assert np.abs(rm1 - rm0).max() > 0
    # trainable weights moved
    w0 = np.asarray(params0["encoder"]["en0"]["conv"]["w"])
    w1 = np.asarray(params["encoder"]["en0"]["conv"]["w"])
    assert np.abs(w1 - w0).max() > 0


def test_data_parallel_matches_single_device(setup):
    """Sharded batch over the fake 8-device mesh == single-device numerics."""
    model, params, opt, _, _ = setup
    step_fn = jax.jit(make_train_step(model, opt))
    noisy, clean = _synthetic_batch(batch=8, seed=2)

    # single device
    p1, s1, loss1 = step_fn(params, opt.init(params), noisy, clean)

    # 8-device data parallel
    mesh = make_mesh()
    assert mesh.devices.size == 8
    params_r = replicate(mesh, params)
    opt_r = replicate(mesh, opt.init(params))
    noisy_s, clean_s = shard_batch(mesh, (np.asarray(noisy), np.asarray(clean)))
    p8, s8, loss8 = step_fn(params_r, opt_r, noisy_s, clean_s)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    l1 = jax.tree.leaves(p1)
    l8 = jax.tree.leaves(p8)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_bf16_mixed_precision_step(setup):
    """compute_dtype=bf16: forward/backward in bf16, f32 masters/stats.

    The first-step loss must agree with the f32 step to bf16 resolution,
    every param leaf must stay f32 (masters never downcast), and weights +
    BN running stats must still move."""
    model, params0, opt, _, step_f32 = setup
    step_bf16 = jax.jit(
        make_train_step(model, opt, compute_dtype=jnp.bfloat16)
    )
    noisy, clean = _synthetic_batch(batch=4, seed=4)

    _, _, loss32 = step_f32(params0, opt.init(params0), noisy, clean)
    params = params0
    opt_state = opt.init(params0)
    losses = []
    for _ in range(3):
        params, opt_state, loss = step_bf16(params, opt_state, noisy, clean)
        losses.append(float(loss))

    assert np.isfinite(losses).all()
    # bf16 has ~8 bits of mantissa; the end-to-end loss should match f32
    # to a few percent on step one
    np.testing.assert_allclose(losses[0], float(loss32), rtol=0.05)
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32, leaf.dtype
    w0 = np.asarray(params0["encoder"]["en0"]["conv"]["w"])
    w1 = np.asarray(params["encoder"]["en0"]["conv"]["w"])
    assert np.abs(w1 - w0).max() > 0
    rm0 = np.asarray(params0["encoder"]["en0"]["bn"]["running_mean"])
    rm1 = np.asarray(params["encoder"]["en0"]["bn"]["running_mean"])
    assert np.abs(rm1 - rm0).max() > 0


def test_eval_step(setup):
    model, params, *_ = setup
    eval_fn = jax.jit(make_eval_step(model))
    noisy, clean = _synthetic_batch(batch=2, seed=3)
    loss, enhanced = eval_fn(params, noisy, clean)
    assert np.isfinite(float(loss))
    assert enhanced.shape[0] == 2 and enhanced.shape[3] == 2


def test_apply_bn_stats_unknown_path_raises():
    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(KeyError):
        apply_bn_stats(params, {"nonexistent/bn/batch_mean": jnp.zeros(16)})


def test_sharded_serving_step_matches_single_device():
    """Multi-chip serving: streams sharded over the 8-device mesh must equal
    the single-device streaming step (no cross-stream interaction)."""
    from gtcrn_micro_tpu.parallel.mesh import make_sharded_serving_step

    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    B, T = 16, 4
    spec = jnp.asarray(rng.standard_normal((B, 257, T, 2)).astype(np.float32))

    # single device
    state = model.init_state(B)
    ref = []
    for t in range(T):
        y, state = model.step_jit(params, state, spec[:, :, t : t + 1])
        ref.append(np.asarray(y))

    # 8-device sharded serving
    mesh = make_mesh()
    assert mesh.devices.size == 8
    step, place_state, place_spec = make_sharded_serving_step(model, mesh)
    params_r = replicate(mesh, params)
    state = place_state(model.init_state(B))
    out = []
    for t in range(T):
        y, state = step(params_r, state, place_spec(spec[:, :, t : t + 1]))
        out.append(np.asarray(y))

    np.testing.assert_allclose(
        np.concatenate(out, 2), np.concatenate(ref, 2), atol=1e-5
    )


def test_vctk_basename_pairing(tmp_path):
    """VCTK-DEMAND layout: identical basenames in noisy/clean dirs."""
    from gtcrn_micro_tpu.io.wav import write_wav
    from gtcrn_micro_tpu.train.dataloader import PairedWavDataset

    nd, cd = tmp_path / "noisy", tmp_path / "clean"
    nd.mkdir(), cd.mkdir()
    rng = np.random.default_rng(0)
    for name in ("p232_001.wav", "p232_002.wav"):
        write_wav(str(nd / name), rng.standard_normal(4000).astype(np.float32) * 0.1, 16000)
        write_wav(str(cd / name), rng.standard_normal(4000).astype(np.float32) * 0.1, 16000)
    ds = PairedWavDataset(noisy_root=str(nd), clean_root=str(cd),
                          length_seconds=0.25, pairing="basename", train=False)
    assert len(ds) == 2
    noisy, clean = ds.load_item(0)
    assert noisy.shape == clean.shape == (4000,)
