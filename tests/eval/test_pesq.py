"""Wideband PESQ trust protocol (mirrors the STOI protocol the r2 verdict
endorsed): property tests, frozen goldens on the reference's shipped wav
pairs, and a gated numerical cross-check against the ITU-wrapping ``pesq``
package wherever that package exists.

Reference context: wideband PESQ is the reference's validation criterion
and headline quality metric (gtcrn_micro/train.py:356-362,
eval/eval_intrusive_metrics.py:46-60)."""

import os

import numpy as np
import pytest

from gtcrn_micro_tpu.eval.pesq import pesq_wb

WAV_DIR = "/root/reference/gtcrn_micro/examples/gtcrn_micro"
MAX_WB = 4.6439  # P.862.2 logistic map at raw = 4.5


def _speech(n=64000):
    from gtcrn_micro_tpu.io.wav import read_wav

    path = os.path.join(WAV_DIR, "enh1.wav")
    if not os.path.exists(path):
        pytest.skip("reference example wavs unavailable")
    x, fs = read_wav(path)
    if x.ndim > 1:
        x = x[:, 0]
    assert fs == 16000
    return x[:n].astype(np.float64)


def test_identical_signals_hit_the_ceiling():
    x = _speech()
    assert abs(pesq_wb(x, x) - MAX_WB) < 1e-3


def test_gain_invariance():
    """Level alignment must make the score invariant to global gain."""
    x = _speech()
    y = x + 0.03 * np.random.default_rng(0).standard_normal(len(x))
    a, b = pesq_wb(x, y), pesq_wb(x, 3.7 * y)
    assert abs(a - b) < 1e-2


def test_delay_invariance():
    """The alignment stage must absorb a constant delay."""
    x = _speech()
    y = np.concatenate([np.zeros(700), x])[: len(x)]
    assert abs(pesq_wb(x, y) - MAX_WB) < 5e-2


def test_utterance_align_inert_on_aligned_pairs():
    """The per-utterance refinement must not move scores of sample-aligned
    pairs (the frozen goldens' regime): shifts below the accept gate are
    rejected, so both paths are identical."""
    x = _speech()
    y = x + 0.05 * np.random.default_rng(1).standard_normal(len(x))
    assert pesq_wb(x, y) == pesq_wb(x, y, utterance_align=False)


def test_stepped_delay_scored_via_utterance_alignment():
    """A splice (the second half of the degraded signal shifted by 30 ms)
    must score close to the unspliced signal with utterance alignment, and
    far worse with only the global delay (the r3-verdict mis-scoring
    case)."""
    from gtcrn_micro_tpu.eval.pesq import _utterance_bounds

    x = _speech()
    rng = np.random.default_rng(2)
    y = x + 0.001 * rng.standard_normal(len(x))
    base = pesq_wb(x, y)

    # splice inside a silence gap between utterances: delay everything
    # after the first utterance boundary by 30 ms
    bounds = _utterance_bounds(x)
    assert len(bounds) >= 2, "fixture should contain multiple utterances"
    cut = (bounds[0][1] + bounds[1][0]) // 2
    shift = 480  # 30 ms
    spliced = np.concatenate([y[:cut], np.zeros(shift), y[cut:]])[: len(y)]

    aligned = pesq_wb(x, spliced)
    global_only = pesq_wb(x, spliced, utterance_align=False)
    assert aligned >= base - 0.25
    assert aligned >= global_only + 0.3


def test_monotone_in_noise_and_plausible_range():
    x = _speech()
    rng = np.random.default_rng(0)
    scores = []
    for snr in [40, 30, 20, 10, 0]:
        n = rng.standard_normal(len(x))
        n *= np.sqrt((x**2).mean() / (n**2).mean() / 10 ** (snr / 10))
        scores.append(pesq_wb(x, x + n))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.8  # 40 dB SNR is nearly transparent
    assert scores[-1] < 2.0  # 0 dB SNR is bad
    assert all(1.0 <= s <= MAX_WB + 1e-6 for s in scores)


# Literature-typical wideband-PESQ values for white noise added to clean
# speech at a given SNR (the curve every P.862.2 evaluation paper reports;
# the pesq package itself is not installable here, zero egress).  These are
# the calibration targets of eval/pesq.SL_SCALE -- this test pins the
# quantified statement "from-spec PESQ = published white-noise anchors
# +/- the rmse below" (EVAL.md 'metric provenance') and guards regressions.
WHITE_NOISE_ANCHORS = {40: 4.1, 30: 3.5, 20: 2.8, 10: 2.0, 0: 1.4}


def test_white_noise_ladder_tracks_published_anchors():
    x = _speech()
    rng = np.random.default_rng(0)
    errs = []
    for snr, want in sorted(WHITE_NOISE_ANCHORS.items()):
        n = rng.standard_normal(len(x))
        n *= np.sqrt((x**2).mean() / (n**2).mean() / 10 ** (snr / 10))
        got = pesq_wb(x, x + n)
        errs.append(got - want)
        assert abs(got - want) < 0.35, (snr, got, want)
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse < 0.20, (rmse, errs)


def test_degradation_type_ladders_are_monotone():
    """Qualitative P.862 behaviors beyond additive noise: heavier lowpass
    filtering and heavier clipping must strictly lower the score, and every
    score must sit inside the valid range."""
    x = _speech()

    def lowpass(sig, cutoff_hz):
        spec = np.fft.rfft(sig)
        freqs = np.fft.rfftfreq(len(sig), 1.0 / 16000)
        return np.fft.irfft(np.where(freqs <= cutoff_hz, spec, 0), len(sig))

    lp_scores = [pesq_wb(x, lowpass(x, c)) for c in (7000, 5000, 3000, 1500)]
    assert all(a > b for a, b in zip(lp_scores, lp_scores[1:])), lp_scores

    peak = np.abs(x).max()
    clip_scores = [
        pesq_wb(x, np.clip(x, -t * peak, t * peak))
        for t in (0.5, 0.2, 0.05)
    ]
    assert all(a > b for a, b in zip(clip_scores, clip_scores[1:])), clip_scores
    for s in lp_scores + clip_scores:
        assert 1.0 <= s <= MAX_WB + 1e-6


# Frozen goldens of THIS implementation on the reference's shipped pairs
# (enh as reference signal, noisy as degraded): regression pins, not ITU
# values.  Deterministic float64 numpy -> tight tolerance.
GOLDEN = {1: 3.3047, 2: 2.5628, 3: 2.8085, 4: 1.8376, 5: 2.2571}


@pytest.mark.parametrize("idx", sorted(GOLDEN))
def test_frozen_goldens(idx):
    from gtcrn_micro_tpu.io.wav import read_wav

    noisy_p = os.path.join(WAV_DIR, f"noisy{idx}.wav")
    enh_p = os.path.join(WAV_DIR, f"enh{idx}.wav")
    if not (os.path.exists(noisy_p) and os.path.exists(enh_p)):
        pytest.skip("reference example wavs unavailable")
    noisy, _ = read_wav(noisy_p)
    enh, _ = read_wav(enh_p)
    if noisy.ndim > 1:
        noisy = noisy[:, 0]
    if enh.ndim > 1:
        enh = enh[:, 0]
    n = min(len(noisy), len(enh))
    got = pesq_wb(enh[:n], noisy[:n])
    assert abs(got - GOLDEN[idx]) < 2e-3, (idx, got)


def test_cross_check_vs_itu_package():
    """Gated: where the ITU-wrapping ``pesq`` package exists, this
    implementation must track it.  Tolerance 0.35 MOS: the Bark band and
    absolute-threshold tables here are formula-derived, not the ITU
    tables (eval/pesq.py docstring), so a modest systematic offset is
    expected and this test bounds it."""
    itu = pytest.importorskip("pesq")
    x = _speech()
    rng = np.random.default_rng(1)
    for snr in [30, 15, 5]:
        n = rng.standard_normal(len(x))
        n *= np.sqrt((x**2).mean() / (n**2).mean() / 10 ** (snr / 10))
        ours = pesq_wb(x, x + n)
        theirs = itu.pesq(16000, x, x + n, "wb")
        assert abs(ours - theirs) < 0.35, (snr, ours, theirs)


def test_resample_skew_tracked_by_utterance_alignment():
    """r4 verdict #8: within-utterance delay DRIFT (resampling-rate skew)
    must be tracked, not just stepped delays.  A 0.05% clock skew smears
    8 ms of drift across 16 s of real speech -- with the crude->fine
    leaf track + smooth warp the score must recover to within noise of
    the unskewed pair, and far above the drifting (global-align-only)
    score."""
    x = _speech(n=256000)  # use the full clip: drift accumulates
    base = pesq_wb(x, x)
    # 0.1% / 0.2% skew = 16 / 32 ms of drift over 16 s: global-only
    # alignment collapses (measured 3.21 / 2.62) while the tracked warp
    # sits at the resampling ceiling (4.41 / 4.30 vs base 4.42)
    for skew, min_gain in ((1.001, 0.8), (1.002, 1.2)):
        xi = np.arange(len(x)) * skew
        xi = xi[xi < len(x) - 1]
        deg = np.pad(
            np.interp(xi, np.arange(len(x)), x), (0, len(x) - len(xi))
        )
        aligned = pesq_wb(x, deg)
        drifting = pesq_wb(x, deg, utterance_align=False)
        assert aligned > base - 0.25, (skew, aligned, base)
        assert aligned > drifting + min_gain, (skew, aligned, drifting)
