"""Hybrid spectral + SI-SNR loss (reference gtcrn_micro/loss.py:9-71).

Composition, replicated exactly (including the reference's quirks):

- power-law compressed real/imag MSE: real/imag divided by mag^0.7, weight 30
- compressed magnitude MSE: mag^0.3, weight 70
- SI-SNR on iSTFT'd waveforms with the *sqrt-Hann* window (loss.py:50) even
  though the trainer's analysis STFT uses plain Hann (train.py:252) -- this
  window inconsistency is part of the reference's training recipe and is
  deliberately preserved (SURVEY.md §7 hard part 3)
- the 30/70 weights are hard literals in the reference (loss.py:71) ignoring
  its own ctor args; here they're real config defaults with the same values

Fully jittable; runs on-device inside the training step so spectra never
leave HBM.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window


@dataclasses.dataclass(frozen=True)
class HybridLossConfig:
    n_fft: int = 512
    hop_len: int = 256
    win_len: int = 512
    compress_factor: float = 0.3
    eps: float = 1e-12
    lamda_ri: float = 30.0
    lamda_mag: float = 70.0


def hybrid_loss(
    pred_stft: jax.Array,
    true_stft: jax.Array,
    config: HybridLossConfig = HybridLossConfig(),
) -> jax.Array:
    """pred/true: (B, F, T, 2) -> scalar loss."""
    pr, pi = pred_stft[..., 0], pred_stft[..., 1]
    tr, ti = true_stft[..., 0], true_stft[..., 1]
    p_mag = jnp.sqrt(pr * pr + pi * pi + 1e-12)
    t_mag = jnp.sqrt(tr * tr + ti * ti + 1e-12)

    pr_c = pr / p_mag**0.7
    pi_c = pi / p_mag**0.7
    tr_c = tr / t_mag**0.7
    ti_c = ti / t_mag**0.7

    real_loss = jnp.mean(jnp.square(pr_c - tr_c))
    imag_loss = jnp.mean(jnp.square(pi_c - ti_c))
    mag_loss = jnp.mean(jnp.square(p_mag**config.compress_factor
                                   - t_mag**config.compress_factor))

    window = sqrt_hann_window(config.win_len)
    y_pred = istft(pred_stft, window, config.n_fft, config.hop_len, config.win_len)
    y_true = istft(true_stft, window, config.n_fft, config.hop_len, config.win_len)

    # scale-invariant projection (reference loss.py:59-63)
    proj = (
        jnp.sum(y_true * y_pred, axis=-1, keepdims=True)
        * y_true
        / (jnp.sum(jnp.square(y_true), axis=-1, keepdims=True) + 1e-8)
    )
    sisnr = -jnp.mean(
        jnp.log10(
            jnp.sum(jnp.square(proj), axis=-1, keepdims=True)
            / (jnp.sum(jnp.square(y_pred - proj), axis=-1, keepdims=True) + 1e-8)
            + 1e-8
        )
    )

    return (
        config.lamda_ri * (real_loss + imag_loss)
        + config.lamda_mag * mag_loss
        + sisnr
    )


def si_snr_db(ref: jax.Array, est: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Scale-invariant SNR in dB (positive = better), per batch element."""
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    proj = (
        jnp.sum(ref * est, axis=-1, keepdims=True)
        * ref
        / (jnp.sum(jnp.square(ref), axis=-1, keepdims=True) + eps)
    )
    noise = est - proj
    return 10.0 * jnp.log10(
        (jnp.sum(jnp.square(proj), axis=-1) + eps)
        / (jnp.sum(jnp.square(noise), axis=-1) + eps)
    )
