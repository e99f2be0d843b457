"""bench.py scheduling logic (r3 postmortem: the old sweep-first schedule
timed out before printing any JSON; r4 verifies the champion FIRST, holds a
wall-clock budget, and always emits exactly one best-so-far JSON line).

Measurements are monkeypatched -- this pins the schedule, not the device.
"""

import json

import pytest

import bench


@pytest.fixture(autouse=True)
def _reset_best(monkeypatch):
    monkeypatch.setitem(bench._BEST, "streams", 0)
    monkeypatch.setitem(bench._BEST, "emitted", False)
    monkeypatch.setattr(bench, "measure_rtt", lambda: 0.0)


def _last_json(capsys):
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    payloads = [ln for ln in lines if ln.startswith("{")]
    assert len(payloads) == 1, "exactly ONE JSON line"
    return json.loads(payloads[0]), lines


def test_champion_verified_first(monkeypatch, capsys):
    """A fast device window: champion 9x8192 passes immediately; K+1 and the
    sweep also run; the final JSON carries the best verified config."""
    calls = []

    def fake_rr(model, params, b, k, **kw):
        calls.append((b, k))
        # champion step time: K=9 passes, K=10 fails; alternates are slow
        return 0.00165 if b == 8192 else 0.0190

    monkeypatch.setattr(bench, "measure_round_robin", fake_rr)
    monkeypatch.setattr(
        bench, "measure_step_latency", lambda *a, **k: (0.0190, 0.0185, 0.0199)
    )
    bench.main()
    payload, lines = _last_json(capsys)
    # the VERY FIRST measurement is the champion config
    assert calls[0] == bench.CHAMPIONS[0][:2] == (8192, 9)
    assert payload["value"] == 73728
    assert payload["metric"] == "concurrent_realtime_streams"
    assert payload["vs_baseline"] == 73728 / 4096


def test_alternate_champion_rescues_slow_window(monkeypatch, capsys):
    """The r4 observed failure mode: 9x8192 misses keep-up on a slow window
    but the plateau-equivalent 6x12288 still passes -- phase 1 must try the
    alternate shapes before giving up the 73,728 headline."""
    calls = []

    def fake_rr(model, params, b, k, **kw):
        calls.append((b, k))
        return {8192: 0.0019, 12288: 0.00263, 9216: 0.0020}[b]

    monkeypatch.setattr(bench, "measure_round_robin", fake_rr)
    monkeypatch.setattr(
        bench, "measure_step_latency", lambda *a, **k: (0.0190, 0.0185, 0.0199)
    )
    bench.main()
    payload, _ = _last_json(capsys)
    assert calls[0] == (8192, 9)   # miss: 9*1.9 = 17.1 > 16
    assert calls[1] == (12288, 6)  # pass: 6*2.63 = 15.8 <= 16
    assert payload["value"] == 73728


def test_all_champions_miss_walks_down(monkeypatch, capsys):
    """Every champion shape misses: the last one walks K straight down to
    the measured ceiling so an honest lower number is still verified."""
    calls = []

    def fake_rr(model, params, b, k, **kw):
        calls.append((b, k))
        # keep-up ceilings: 8192 -> K<=8 would pass but we only try K=9;
        # 12288 -> K<=5; 9216 -> K<=7 (the walk-down target)
        return {8192: 0.0019, 12288: 0.0032, 9216: 0.0022}[b]

    monkeypatch.setattr(bench, "measure_round_robin", fake_rr)
    monkeypatch.setattr(
        bench, "measure_step_latency", lambda *a, **k: (0.0190, 0.0185, 0.0199)
    )
    bench.main()
    payload, _ = _last_json(capsys)
    assert calls[:4] == [(8192, 9), (12288, 6), (9216, 8), (9216, 7)]
    assert payload["value"] == 7 * 9216


def test_psum_stretch_wins_one_more_cohort(monkeypatch, capsys):
    """Phase 2b: when the ring layout misses K+1 but the ~2%-faster psum
    layout sustains it (PERF.md r4), the headline takes the psum plan."""
    def fake_rr(model, params, b, k, **kw):
        return 0.00158 if kw.get("l2_psum") else 0.00165  # psum: K=10 fits

    monkeypatch.setattr(bench, "measure_round_robin", fake_rr)
    monkeypatch.setattr(
        bench, "measure_step_latency", lambda *a, **k: (0.0190, 0.0185, 0.0199)
    )
    bench.main()
    payload, lines = _last_json(capsys)
    assert payload["value"] == 10 * 8192
    assert any("l2_psum" in ln and "best-so-far" in ln for ln in lines)


def test_deadline_cuts_sweep_but_emits(monkeypatch, capsys):
    """Budget exhausted right after the champion verify: no sweep, no K+1,
    but the champion headline is still emitted."""
    def fake_rr(model, params, b, k, **kw):
        bench._DEADLINE[0] = 0.0  # budget gone the moment we finish
        return 0.00165

    called_sweep = []
    monkeypatch.setattr(bench, "measure_round_robin", fake_rr)
    monkeypatch.setattr(
        bench, "measure_step_latency",
        lambda *a, **k: called_sweep.append(1) or (0.003, 0.003, 0.003),
    )
    bench.main()
    payload, _ = _last_json(capsys)
    assert payload["value"] == 73728
    assert not called_sweep


def test_emit_idempotent(capsys):
    bench._BEST["streams"] = 1234
    bench._emit()
    bench._emit()
    payload, lines = _last_json(capsys)
    assert payload["value"] == 1234


def test_signal_before_any_verification_prints_no_json(capsys):
    """SIGTERM during the attach hang (nothing verified): the signal path
    must NOT print `"value": 0` — a null capture is diagnosable, a zero
    reads as "serves zero streams"."""
    bench._emit(require_verified=True)
    out = capsys.readouterr().out
    assert not any(ln.startswith("{") for ln in out.splitlines())
    assert "nothing verified" in out
    # and a later verified result can still be emitted
    bench._BEST["streams"] = 4096
    bench._emit(require_verified=True)
    payload, _ = _last_json(capsys)
    assert payload["value"] == 4096
