"""Jittable STFT / iSTFT matching the reference's torch.stft / torch.istft semantics.

The reference inlines ``torch.stft(x, 512, 256, 512, window, return_complex=False)``
at every entry point (reference: gtcrn_micro/train.py:247-263, infer.py:60-67,
loss.py:45-58).  Two windows are used and must be replicated exactly:

- training spectra use a *plain* periodic Hann window (train.py:252)
- inference and the SI-SNR loss use ``hann^0.5`` (infer.py:65, loss.py:50)

torch.stft semantics replicated here (defaults used by the reference):
``center=True`` with reflect padding of ``n_fft//2`` on both ends,
``normalized=False``, ``onesided=True``.  Frame ``t`` covers
``x_pad[t*hop : t*hop + n_fft]``; the frame count is ``len(x)//hop + 1``.

torch.istft semantics: inverse rfft per frame, synthesis windowing,
overlap-add, division by the squared-window envelope, and trimming of
``n_fft//2`` from both ends (output length ``hop*(T-1)``).

Everything here is shape-static and jit/vmap/scan friendly -- no data-dependent
control flow, so XLA can fuse the framing, FFT and masking into one program.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


def _hann_np(win_length: int) -> np.ndarray:
    # torch.hann_window computes in float32; do the same for bit-closeness.
    n = np.arange(win_length, dtype=np.float32)
    w = np.float32(0.5) * (
        np.float32(1.0) - np.cos(np.float32(2.0 * np.pi) * n / np.float32(win_length))
    )
    return w.astype(np.float32)


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window, identical to ``torch.hann_window(win_length)``."""
    return jnp.asarray(_hann_np(win_length), dtype=dtype)


def sqrt_hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """``torch.hann_window(win_length).pow(0.5)`` -- the analysis/synthesis
    window used by the reference's inference and loss paths.  Sqrt is taken in
    float32 to match torch's ``Tensor.pow(0.5)`` on a float32 window."""
    return jnp.asarray(np.sqrt(_hann_np(win_length)), dtype=dtype)


@dataclasses.dataclass(frozen=True)
class StftConfig:
    """STFT geometry of the reference model: 512/256/512 @ 16 kHz."""

    n_fft: int = 512
    hop_len: int = 256
    win_len: int = 512
    fs: int = 16000

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        return num_samples // self.hop_len + 1


def _frame(x_pad: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Extract overlapping frames (..., T, n_fft) from a padded signal.

    Fast path when ``hop`` divides ``n_fft`` (true for 512/256): reshape the
    signal into hop-sized segments and concatenate shifted views -- pure
    reshapes/slices, no gather, so XLA lowers it to cheap copies.
    """
    L = x_pad.shape[-1]
    T = (L - n_fft) // hop + 1
    if n_fft % hop == 0:
        k = n_fft // hop
        n_seg = L // hop
        segs = x_pad[..., : n_seg * hop].reshape(*x_pad.shape[:-1], n_seg, hop)
        parts = [segs[..., i : n_seg - k + 1 + i, :] for i in range(k)]
        frames = jnp.concatenate(parts, axis=-1)
        return frames[..., :T, :]
    idx = np.arange(T)[:, None] * hop + np.arange(n_fft)[None, :]
    return x_pad[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_len", "win_len"))
def stft(
    x: jax.Array,
    window: jax.Array,
    n_fft: int = 512,
    hop_len: int = 256,
    win_len: int = 512,
) -> jax.Array:
    """STFT of ``x`` (..., num_samples) -> (..., F, T, 2) real/imag.

    Matches ``torch.stft(x, n_fft, hop_len, win_len, window,
    return_complex=False)`` bit-close in float32 (center=True, reflect pad).
    """
    assert win_len == n_fft, "reference always uses win_len == n_fft"
    pad = n_fft // 2
    x_pad = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = _frame(x_pad, n_fft, hop_len)  # (..., T, n_fft)
    frames = frames * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (..., T, F)
    spec = jnp.moveaxis(spec, -1, -2)  # (..., F, T)
    return jnp.stack([spec.real, spec.imag], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_len", "win_len", "length")
)
def istft(
    spec: jax.Array,
    window: jax.Array,
    n_fft: int = 512,
    hop_len: int = 256,
    win_len: int = 512,
    length: int | None = None,
) -> jax.Array:
    """Inverse STFT of (..., F, T, 2) or complex (..., F, T) -> (..., samples).

    Matches ``torch.istft(spec, n_fft, hop_len, win_len, window)``:
    synthesis windowing, overlap-add, squared-window envelope normalisation,
    then center trimming of ``n_fft//2`` per side.  Output length is
    ``hop_len*(T-1)`` unless ``length`` is given.
    """
    assert win_len == n_fft
    if spec.shape[-1] == 2 and not jnp.iscomplexobj(spec):
        spec = jax.lax.complex(spec[..., 0], spec[..., 1])
    spec = jnp.moveaxis(spec, -2, -1)  # (..., T, F)
    T = spec.shape[-2]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # (..., T, n_fft)
    frames = frames * window

    ola_len = n_fft + hop_len * (T - 1)
    # Overlap-add via scatter-add over precomputed static indices.
    idx = np.arange(T)[:, None] * hop_len + np.arange(n_fft)[None, :]
    y = jnp.zeros(spec.shape[:-2] + (ola_len,), dtype=frames.dtype)
    y = y.at[..., idx].add(frames)

    # Squared-window envelope (identical for every batch element).
    env = jnp.zeros((ola_len,), dtype=frames.dtype)
    env = env.at[idx.reshape(-1)].add(
        jnp.broadcast_to(window * window, (T, n_fft)).reshape(-1)
    )
    y = y / jnp.where(env > 1e-11, env, 1.0)

    pad = n_fft // 2
    out_len = hop_len * (T - 1) if length is None else length
    # torch semantics (verified empirically -- its own "padded with zeros"
    # warning is misleading): an explicit length exposes the normalised OLA
    # tail up to ola_len - pad, and only zero-fills beyond the OLA buffer
    avail = ola_len - pad
    take = min(out_len, avail)
    y = jax.lax.slice_in_dim(y, pad, pad + take, axis=-1)
    if out_len > take:
        cfg = [(0, 0)] * (y.ndim - 1) + [(0, out_len - take)]
        y = jnp.pad(y, cfg)
    return y
