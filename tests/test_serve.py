"""Cohort serving engine tests (serve.py): plan math, admission lifecycle,
and output correctness (each cohort's stream equals the offline pass)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.models import GTCRNMicro
from gtcrn_micro_tpu.serve import CohortServer, plan_cohorts


def test_plan_math():
    p = plan_cohorts(step_time_s=0.00165, batch=8192)
    assert p.n_cohorts == 9  # 9*1.65=14.85<=16ms; 1.65+16/9=3.43<=10ms
    assert p.streams == 73728
    assert p.realtime_ok
    assert abs(p.worst_latency_s - (0.00165 + 0.016 / 9)) < 1e-9
    assert p.phase_of(3) == 3 * 0.016 / 9

    too_slow = plan_cohorts(step_time_s=0.017, batch=1024)
    assert too_slow.n_cohorts == 0 and not too_slow.realtime_ok


def test_cohort_streams_match_offline():
    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    # fp32 so the comparison to the offline pass is tight
    srv = CohortServer(model, params, batch=2, n_cohorts=3,
                       dtype=jnp.float32)

    rng = np.random.default_rng(0)
    T = 6
    specs = rng.standard_normal((3, 2, 257, T, 2)).astype(np.float32) * 0.4
    outs = [[] for _ in range(3)]
    for t in range(T):
        got = srv.round_robin(
            [jnp.asarray(specs[c][:, :, t : t + 1]) for c in range(3)]
        )
        for c in range(3):
            outs[c].append(np.asarray(got[c]))
    assert srv.frames_served == 3 * T

    for c in range(3):
        offline = np.asarray(model.apply_jit(params, jnp.asarray(specs[c])))
        streamed = np.concatenate(outs[c], axis=2)
        np.testing.assert_allclose(streamed, offline, atol=1e-5)


def test_admission_lifecycle():
    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    srv = CohortServer(model, params, batch=2, n_cohorts=2,
                       dtype=jnp.float32)
    a = srv.admit(0)
    b = srv.admit(0)
    assert {a, b} == {0, 1}
    try:
        srv.admit(0)
        raise AssertionError("expected full cohort to refuse admission")
    except RuntimeError:
        pass
    assert srv.next_cohort() == 1
    srv.release(0, a)
    # dirty the state, then reset the released slot and verify zeroed
    spec = jnp.ones((2, 257, 1, 2), jnp.float32)
    srv.step(0, spec)
    srv.reset_slot(0, a)
    for k, v in srv._states[0].items():
        if k == "step":
            continue
        assert float(jnp.abs(v[a]).max()) == 0.0, k
        assert float(jnp.abs(v[1 - a]).max()) > 0.0  # the live slot kept data


def test_slot_churn_second_stream_independent_of_first():
    """admit -> stream -> release -> admit reuse: the recycled slot must be
    auto-reset so the second stream's output carries nothing of the first's
    ring history (r3 verdict: dirty-slot reuse was a correctness + privacy
    bug -- the old admit() handed the slot back with stale state)."""
    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    srv = CohortServer(model, params, batch=2, n_cohorts=1,
                       dtype=jnp.float32)
    rng = np.random.default_rng(3)
    loud = jnp.asarray(rng.standard_normal((2, 257, 1, 2)), jnp.float32)

    a = srv.admit(0)
    b = srv.admit(0)
    for _ in range(4):  # fill slot a's rings with the first stream's history
        srv.step(0, loud)
    srv.release(0, a)
    a2 = srv.admit(0)  # cohort churned through every slot -> recycled reuse
    assert a2 == a

    # rings of the re-admitted slot are zeros; the live slot kept its state
    for k, v in srv._states[0].items():
        if k == "step":
            continue
        assert float(jnp.abs(v[a2]).max()) == 0.0, k
        assert float(jnp.abs(v[b]).max()) > 0.0, k

    # end-to-end: the second stream's output equals a fresh server's
    fresh = CohortServer(model, params, batch=2, n_cohorts=1,
                         dtype=jnp.float32)
    second = jnp.asarray(rng.standard_normal((2, 257, 1, 2)), jnp.float32)
    for _ in range(3):
        got = np.asarray(srv.step(0, second))
        want = np.asarray(fresh.step(0, second))
    np.testing.assert_allclose(got[a2], want[a2], atol=1e-6)

    # clean slots are preferred: releasing into a part-empty cohort must not
    # hand the dirty slot straight back
    srv2 = CohortServer(model, params, batch=2, n_cohorts=1,
                        dtype=jnp.float32)
    first = srv2.admit(0)
    srv2.step(0, loud)
    srv2.release(0, first)
    assert srv2.admit(0) != first  # the never-used slot goes first
    # explicit reset moves a recycled slot back to the clean pool
    srv2.reset_slot(0, first)
    assert first in srv2._free[0] and first not in srv2._recycled[0]


def test_psum_state_cohort_matches_offline():
    """CohortServer(state_opts={'l2_psum': True}) -- the bench phase-2b
    stretch layout -- must serve exactly like the offline pass."""
    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    srv = CohortServer(model, params, batch=2, n_cohorts=1,
                       dtype=jnp.float32, state_opts={"l2_psum": True})
    assert any(k.endswith("psum_a") for k in srv._states[0])
    rng = np.random.default_rng(5)
    T = 5
    spec = rng.standard_normal((2, 257, T, 2)).astype(np.float32) * 0.4
    outs = [np.asarray(srv.step(0, jnp.asarray(spec[:, :, t : t + 1])))
            for t in range(T)]
    offline = np.asarray(model.apply_jit(params, jnp.asarray(spec)))
    np.testing.assert_allclose(np.concatenate(outs, axis=2), offline,
                               atol=1e-5)
    # slot lifecycle works on the psum state tree too
    slot = srv.admit(0)
    srv.release(0, slot)
    srv.reset_slot(0, slot)


def test_audio_mode_matches_offline_pipeline():
    from gtcrn_micro_tpu.dsp import istft, sqrt_hann_window, stft

    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    srv = CohortServer(model, params, batch=2, n_cohorts=2,
                       dtype=jnp.float32, mode="audio", dft="fft")

    rng = np.random.default_rng(1)
    hops = 10
    x = rng.standard_normal((2, 2, 256 * hops)).astype(np.float32) * 0.3
    x[:, :, :257] = 0.0  # exact-equality regime (stream_dsp analysis)

    outs = [[] for _ in range(2)]
    for t in range(hops):
        got = srv.round_robin(
            [jnp.asarray(x[c][:, 256 * t : 256 * (t + 1)]) for c in range(2)]
        )
        for c in range(2):
            outs[c].append(np.asarray(got[c]))

    w = sqrt_hann_window(512)
    for c in range(2):
        spec = stft(jnp.asarray(x[c]), w)
        off = np.asarray(istft(model.apply_jit(params, spec), w,
                               length=x.shape[2]))
        y = np.concatenate(outs[c], axis=-1)[:, 256:]  # drop center trim
        np.testing.assert_allclose(y, off[:, : y.shape[1]], atol=5e-7)


def test_throughput_mode_t2_audio_matches_offline():
    """chunk_hops=2 (throughput mode): each step consumes two hops per
    stream; the served audio must still equal the offline pipeline."""
    from gtcrn_micro_tpu.dsp import istft, sqrt_hann_window, stft

    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    srv = CohortServer(model, params, batch=2, n_cohorts=1,
                       dtype=jnp.float32, mode="audio", dft="fft",
                       chunk_hops=2)

    rng = np.random.default_rng(3)
    hops = 12
    x = rng.standard_normal((2, 256 * hops)).astype(np.float32) * 0.3
    x[:, :257] = 0.0  # exact-equality regime (stream_dsp analysis)

    outs = []
    for t in range(hops // 2):
        got = srv.step(0, jnp.asarray(x[:, 512 * t : 512 * (t + 1)]))
        outs.append(np.asarray(got))
    assert srv.frames_served == hops

    w = sqrt_hann_window(512)
    spec = stft(jnp.asarray(x), w)
    off = np.asarray(istft(model.apply_jit(params, spec), w,
                           length=x.shape[1]))
    y = np.concatenate(outs, axis=-1)[:, 256:]  # drop center trim
    np.testing.assert_allclose(y, off[:, : y.shape[1]], atol=5e-7)


def test_throughput_plan_math():
    from gtcrn_micro_tpu.serve import CohortPlan, plan_cohorts

    # T=2, 3 ms step: keep-up K <= 32/3 -> 10; latency 16 + 32/K + 3
    plan = plan_cohorts(0.003, batch=12288, budget_s=0.040, chunk_hops=2)
    assert plan.n_cohorts == 10 and plan.interval_s == 0.032
    assert plan.worst_latency_s == pytest.approx(0.016 + 0.0032 + 0.003)
    assert not plan.realtime_ok  # violates the 10 ms interactive budget
    # the same step time in interactive mode plans fewer cohorts
    # (keep-up K*3 <= 16 -> K=5) and half the streams of the T=2 plan
    assert plan_cohorts(0.003, batch=12288).n_cohorts == 5
    # T=1 unchanged vs the original contract
    p1 = CohortPlan(batch=8192, n_cohorts=9, step_time_s=0.00165)
    assert p1.keep_up_ok and p1.realtime_ok

    with pytest.raises(ValueError):
        CohortServer(GTCRNMicro(), {}, batch=1, n_cohorts=1, chunk_hops=3)


def test_audio_mode_reset_zeroes_dsp_state():
    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    srv = CohortServer(model, params, batch=2, n_cohorts=1,
                       dtype=jnp.float32, mode="audio")
    srv.step(0, jnp.ones((2, 256), jnp.float32))
    srv.reset_slot(0, 0)
    assert float(jnp.abs(srv._dsp[0].in_buf[0]).max()) == 0.0
    assert float(jnp.abs(srv._dsp[0].in_buf[1]).max()) > 0.0


def test_sharded_cohort_server_matches_single_device():
    """mesh-sharded CohortServer == unsharded on the virtual 8-device mesh
    (pod-level serving: streams sharded, params replicated, no collectives)."""
    from gtcrn_micro_tpu.parallel.mesh import make_mesh

    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh()
    batch = 8  # one stream per virtual device
    rng = np.random.default_rng(2)

    # spec mode
    srv1 = CohortServer(model, params, batch=batch, n_cohorts=2,
                        dtype=jnp.float32)
    srv8 = CohortServer(model, params, batch=batch, n_cohorts=2,
                        dtype=jnp.float32, mesh=mesh)
    for t in range(5):
        frames = [jnp.asarray(
            rng.standard_normal((batch, 257, 1, 2)).astype(np.float32) * 0.4)
            for _ in range(2)]
        got1 = srv1.round_robin(frames)
        got8 = srv8.round_robin(frames)
        for a, b in zip(got1, got8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-6)

    # audio mode (the bench.py headline config, sharded)
    sa1 = CohortServer(model, params, batch=batch, n_cohorts=1,
                       dtype=jnp.float32, mode="audio", dft="mxu")
    sa8 = CohortServer(model, params, batch=batch, n_cohorts=1,
                       dtype=jnp.float32, mode="audio", dft="mxu", mesh=mesh)
    for t in range(4):
        chunk = jnp.asarray(
            rng.standard_normal((batch, 256)).astype(np.float32) * 0.3)
        a = np.asarray(sa1.step(0, chunk))
        b = np.asarray(sa8.step(0, chunk))
        np.testing.assert_allclose(a, b, atol=2e-5)

    # admission bookkeeping is mesh-independent
    c = sa8.next_cohort()
    slot = sa8.admit(c)
    sa8.release(c, slot)
    sa8.reset_slot(c, slot)
    assert sa8.frames_served == 4
