"""GPTQ unit + integration tests (quant/gptq.py).

Pins: the GPTQ core beats nearest rounding on its own objective and is the
identity on already-on-grid weights; the capture machinery's patch algebra
reproduces every conv boundary's output exactly (incl. grouped convs and
the lhs-dilated deconvs); the sequential driver bakes weights that are
on-grid, scale-invariant, and survive requantization — the contract the
GTM8 exporter and the fake-quant sim both rely on.

Reference context: the reference ships nearest-rounding PTQ only
(scripts/onnx2tf.sh); GPTQ is a beyond-reference addition motivated by the
r4b finding that the v3 artifact is weight-rounding-bound (EVAL.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.models import GTCRNMicro
from gtcrn_micro_tpu.models.folding import fold_bn_params
from gtcrn_micro_tpu.nn.core import Ctx
from gtcrn_micro_tpu.quant.fake_quant import (
    act_qparams,
    fake_quant,
    weight_qparams,
)
from gtcrn_micro_tpu.quant.gptq import (
    INT_HI,
    INT_LO,
    _boundary_groups,
    capture_boundaries,
    gptq_params,
    gptq_rows,
    local_error,
)
from gtcrn_micro_tpu.quant.ptq import observe_ranges


# ---------------------------------------------------------------------------
# core
# ---------------------------------------------------------------------------


def _random_problem(seed=1, d=32, m=8, n=2048):
    rng = np.random.default_rng(seed)
    mix = rng.normal(size=(d, d))
    p = rng.normal(size=(n, d)) @ mix  # correlated features
    w = rng.normal(size=(d, m)) * 0.1
    amax = np.abs(w).max(axis=0)
    scale = amax / INT_HI
    pin = np.abs(w) >= amax[None, :] - 1e-12
    return p, w, scale, pin, amax


def test_gptq_beats_nearest_on_local_error():
    p, w, scale, pin, _ = _random_problem()
    nearest = np.clip(np.round(w / scale), INT_LO, INT_HI) * scale
    w_q = gptq_rows(p, w, scale, pin)
    assert local_error(p, w, w_q) < local_error(p, w, nearest)


def test_gptq_on_grid_and_amax_invariant():
    p, w, scale, pin, amax = _random_problem(seed=2)
    w_q = gptq_rows(p, w, scale, pin)
    q = w_q / scale
    # every entry sits on an integer grid point (pinned entries carry the
    # original float, one ulp off the grid by design)
    assert np.allclose(q, np.round(q), atol=1e-6)
    assert np.round(np.abs(q)).max() <= INT_HI
    assert np.allclose(np.abs(w_q).max(axis=0), amax, rtol=0, atol=0)


def test_gptq_identity_on_grid():
    p, w, scale, pin, _ = _random_problem(seed=3)
    w_g = np.clip(np.round(w / scale), INT_LO, INT_HI) * scale
    amax = np.abs(w_g).max(axis=0)
    pin_g = np.abs(w_g) >= amax[None, :] - 1e-12
    w_q = gptq_rows(p, w_g, amax / INT_HI, pin_g)
    np.testing.assert_allclose(w_q, w_g, atol=1e-12)


def test_gptq_handles_dead_inputs():
    p, w, scale, pin, _ = _random_problem(seed=4)
    p[:, 5] = 0.0  # never-firing input: falls back to nearest, no NaN
    nearest = np.clip(np.round(w / scale), INT_LO, INT_HI) * scale
    w_q = gptq_rows(p, w, scale, pin)
    assert np.all(np.isfinite(w_q))
    np.testing.assert_allclose(w_q[5], nearest[5], atol=1e-12)


# ---------------------------------------------------------------------------
# capture + patch algebra on the real model graph
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup():
    model = GTCRNMicro()
    params = fold_bn_params(model.init(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    specs = jnp.asarray(rng.normal(size=(2, 257, 33, 2)) * 0.1, jnp.float32)
    ranges = observe_ranges(model, params, specs, batch_size=2,
                            per_channel=True)
    act_qp = {
        p: act_qparams(jnp.asarray(lo, jnp.float32),
                       jnp.asarray(hi, jnp.float32), 16)
        for p, (lo, hi) in ranges.items()
    }
    return model, params, act_qp, specs


def test_patch_algebra_reconstructs_every_conv_boundary(setup):
    """_boundary_groups asserts patches @ W == the recorded conv output for
    every conv boundary — covers strided convs, grouped/depthwise convs,
    dilated temporal convs and the lhs-dilated deconvs."""
    model, params, act_qp, specs = setup
    recs = capture_boundaries(model, params, act_qp, specs)
    assert len(recs) == 59
    kinds = {"conv": 0, "depth": 0, "pw": 0}
    for rec in recs:
        for _ in _boundary_groups(rec):  # raises on any mismatch
            pass
        if rec.cfg is not None:
            kinds["conv"] += 1
        elif rec.leaf == "depth_w":
            kinds["depth"] += 1
        else:
            kinds["pw"] += 1
    assert kinds == {"conv": 19, "depth": 6, "pw": 34}


def test_augmented_hessian_specs_shape_determinism(setup, tmp_path):
    """The input-only Hessian corpus builder (feeds the export CLI's
    --gptq path): correct spec shape for the requested clip count and
    length, finite, deterministic under a fixed seed, and actually
    diverse (clips are not replicas of one source)."""
    from gtcrn_micro_tpu.io.wav import write_wav
    from gtcrn_micro_tpu.quant.gptq import augmented_hessian_specs

    model, params, _, _ = setup
    rng = np.random.default_rng(7)
    for i in range(2):
        write_wav(str(tmp_path / f"n{i}.wav"),
                  rng.standard_normal(12000).astype(np.float32) * 0.1, 16000)

    kw = dict(n_clips=8, segment_seconds=0.5, seed=3)
    specs = augmented_hessian_specs(model, params, str(tmp_path), **kw)
    f_bins = model.config.win_len // 2 + 1
    t = 8000 // model.config.hop_len + 1  # center=True torch convention
    assert specs.shape == (8, f_bins, t, 2)
    assert specs.dtype == jnp.float32
    assert np.isfinite(np.asarray(specs)).all()

    again = augmented_hessian_specs(model, params, str(tmp_path), **kw)
    np.testing.assert_array_equal(np.asarray(specs), np.asarray(again))

    flat = np.asarray(specs).reshape(8, -1)
    assert len({round(float(np.linalg.norm(c)), 5) for c in flat}) >= 6


def test_gptq_params_bakes_on_grid_scale_invariant(setup):
    """The sequential driver: every quantized weight leaf ends on its grid
    with the identical per-channel scale (the export/sim contract), and
    the model still runs."""
    model, params, act_qp, specs = setup
    baked = gptq_params(model, params, act_qp, specs)

    recs = capture_boundaries(model, params, act_qp, specs, retain=set())
    from gtcrn_micro_tpu.quant.gptq import _tree_mapping

    mapping = _tree_mapping(recs, params)
    flat_old = dict(
        (jax.tree_util.keystr(p, simple=True, separator="/"), v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    )
    flat_new = dict(
        (jax.tree_util.keystr(p, simple=True, separator="/"), v)
        for p, v in jax.tree_util.tree_leaves_with_path(baked)
    )
    n_changed = 0
    for rec in recs:
        tpath = mapping[rec.path]
        w_old, w_new = flat_old[tpath], flat_new[tpath]
        qp_old = weight_qparams(w_old, rec.channel_axis)
        qp_new = weight_qparams(w_new, rec.channel_axis)
        np.testing.assert_array_equal(np.asarray(qp_old.scale),
                                      np.asarray(qp_new.scale))
        # requant round-trip is the identity (up to the pinned entries'
        # one-ulp grid snap)
        rq = fake_quant(w_new, qp_new)
        tol = 1e-6 * float(np.max(np.abs(np.asarray(w_new))) + 1e-12)
        np.testing.assert_allclose(np.asarray(rq), np.asarray(w_new),
                                   atol=tol)
        n_changed += int(
            np.any(np.asarray(w_old) != np.asarray(w_new))
        )
    assert n_changed >= 50  # gptq actually did something nearly everywhere

    # non-quantized leaves (biases etc.) are untouched
    quantized = {mapping[r.path] for r in recs}
    for k in flat_old:
        if k not in quantized:
            np.testing.assert_array_equal(np.asarray(flat_old[k]),
                                          np.asarray(flat_new[k]))

    out = model.apply_jit(baked, specs)
    assert np.isfinite(np.asarray(out)).all()
