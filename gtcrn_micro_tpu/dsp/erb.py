"""ERB filterbank construction, numerically identical to the reference.

The reference keeps the lowest ``erb_subband_1`` (=65) of 257 STFT bins
verbatim and projects the remaining 192 bins onto ``erb_subband_2`` (=64)
triangular ERB bands, inverting with the transpose (reference:
gtcrn_micro/models/gtcrn_micro.py:14-73).  The filters are frozen
(non-trainable) and built in float32 numpy so they match the checkpoint's
stored ``erb_fc``/``ierb_fc`` weights exactly.

Band merge (``bm``) / band split (``bs``) are plain matmuls -- on TPU they run
on the MXU and fuse with neighbouring elementwise ops, so no custom kernel is
needed for them in the offline path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

PRECISION = jax.lax.Precision.HIGHEST


def _hz2erb(freq_hz):
    return 21.4 * np.log10(0.00437 * freq_hz + 1)


def _erb2hz(erb_f):
    return (10 ** (erb_f / 21.4) - 1) / 0.00437


def erb_filter_banks(
    erb_subband_1: int,
    erb_subband_2: int,
    nfft: int = 512,
    high_lim: float = 8000,
    fs: int = 16000,
) -> np.ndarray:
    """Triangular ERB filters, shape (erb_subband_2, nfft//2+1 - erb_subband_1).

    Numerically identical to the reference construction
    (gtcrn_micro/models/gtcrn_micro.py:35-61), including the 1e-12 guards and
    the complementary last band.
    """
    low_lim = erb_subband_1 / nfft * fs
    erb_low = _hz2erb(low_lim)
    erb_high = _hz2erb(high_lim)
    erb_points = np.linspace(erb_low, erb_high, erb_subband_2)
    bins = np.round(_erb2hz(erb_points) / fs * nfft).astype(np.int32)
    erb_filters = np.zeros([erb_subband_2, nfft // 2 + 1], dtype=np.float32)

    erb_filters[0, bins[0] : bins[1]] = (
        bins[1] - np.arange(bins[0], bins[1]) + 1e-12
    ) / (bins[1] - bins[0] + 1e-12)
    for i in range(erb_subband_2 - 2):
        erb_filters[i + 1, bins[i] : bins[i + 1]] = (
            np.arange(bins[i], bins[i + 1]) - bins[i] + 1e-12
        ) / (bins[i + 1] - bins[i] + 1e-12)
        erb_filters[i + 1, bins[i + 1] : bins[i + 2]] = (
            bins[i + 2] - np.arange(bins[i + 1], bins[i + 2]) + 1e-12
        ) / (bins[i + 2] - bins[i + 1] + 1e-12)

    erb_filters[-1, bins[-2] : bins[-1] + 1] = (
        1 - erb_filters[-2, bins[-2] : bins[-1] + 1]
    )

    return np.abs(erb_filters[:, erb_subband_1:])


@dataclasses.dataclass(frozen=True)
class ErbBands:
    """Frozen ERB band merge / split operating on (..., F) feature tensors.

    The weights live in the params pytree (frozen leaves) so the checkpoint
    importer can overwrite them with the reference's stored copies; `make`
    builds them from scratch (bit-identical to the reference construction).
    """

    erb_subband_1: int = 65
    erb_subband_2: int = 64
    nfft: int = 512
    high_lim: float = 8000
    fs: int = 16000

    def init_params(self) -> dict:
        filters = erb_filter_banks(
            self.erb_subband_1, self.erb_subband_2, self.nfft, self.high_lim, self.fs
        )
        # Layout: (n_high_bins, n_bands) so bm/bs are x @ w (MXU-friendly).
        return {
            "bm_w": jnp.asarray(filters.T),  # (192, 64)
            "bs_w": jnp.asarray(filters),  # (64, 192)
        }

    def bm(self, params: dict, x: jax.Array) -> jax.Array:
        """Band merge: (..., F=257) -> (..., 65 + 64 = 129)."""
        lo = x[..., : self.erb_subband_1]
        hi = jnp.dot(
            x[..., self.erb_subband_1 :],
            params["bm_w"],
            precision=PRECISION,
        )
        return jnp.concatenate([lo, hi], axis=-1)

    def bs(self, params: dict, x_erb: jax.Array) -> jax.Array:
        """Band split: (..., 129) -> (..., 257)."""
        lo = x_erb[..., : self.erb_subband_1]
        hi = jnp.dot(
            x_erb[..., self.erb_subband_1 :],
            params["bs_w"],
            precision=PRECISION,
        )
        return jnp.concatenate([lo, hi], axis=-1)
