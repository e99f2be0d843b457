"""Online (chunked) STFT / iSTFT state for audio-in -> audio-out serving.

Neither the reference nor its native runner actually streams the DSP: the
"streaming" demo computes the whole STFT up front and the whole iSTFT at
the end (reference streaming/gtcrn_micro_stream.py:600-646), and the
ESP32 runner reflect-pads the complete wav before framing.  This module
closes that gap for the TPU serving path: per-chunk analysis/synthesis
with O(1) carried state, jittable and batched, matching the offline
``dsp.stft``/``dsp.istft`` (torch semantics) exactly in the interior.

Geometry (512/256 sqrt-Hann) makes the streaming algebra clean:

- analysis: offline frame ``t`` covers ``x[256(t-1) : 256(t+1)]`` (center
  reflect pad), so one carried hop chunk (``in_buf``) suffices; only
  frame 0 differs (offline reflects ``x[1:257]``, the stream has not seen
  ``x[256]`` yet and uses zeros -- feed a stream whose first 257 samples
  are silence and the two are bit-identical).
- synthesis: the offline center trim means output chunk ``j`` is
  ``tail(frame j) + head(frame j+1)``, so a step that has produced model
  frame ``t`` can emit output chunk ``t-1`` (one-hop algorithmic latency,
  inherent to 50%-overlap OLA).  The squared-window envelope is the
  2-term partition of unity ``win^2[i] + win^2[i+256]`` at EVERY emitted
  sample (the partial-envelope edge lies inside the trimmed pad), so
  streaming normalisation is a constant 256-vector -- identical, term
  for term and in float32, to the offline scatter-add envelope.

Chunked steps: ``T`` hops per call (chunk of ``256*T`` samples) compose
with the model's T-chunk ring steps (nn/core.py) for throughput serving.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_NFFT = 512
_HOP = 256


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DspState:
    """Carried DSP state for one batch of streams.

    in_buf:  (B, 256)  previous input hop (analysis left context)
    ola_buf: (B, 256)  synthesis tail of the last inverse frame
    """

    in_buf: jax.Array
    ola_buf: jax.Array


def init_dsp_state(batch: int, dtype=jnp.float32) -> DspState:
    return DspState(
        in_buf=jnp.zeros((batch, _HOP), dtype),
        ola_buf=jnp.zeros((batch, _HOP), dtype),
    )


def _envelope(window: jax.Array) -> jax.Array:
    """The offline istft envelope restricted to emitted samples: for output
    position ``i`` within a chunk, ``win^2[i] + win^2[i+256]`` (== 1 up to
    float rounding for the periodic Hann).  Computed from the same
    ``window`` array with the same two-term float32 sum as the offline
    scatter-add (dsp/stft.py:146-151), so the normalisation is
    bit-identical."""
    w2 = (window * window).astype(jnp.float32)
    return w2[:_HOP] + w2[_HOP:]


def stft_chunk(
    state: DspState, chunk: jax.Array, window: jax.Array
) -> tuple[jax.Array, DspState]:
    """Analyse ``chunk`` (B, 256*T) -> spec frames (B, F, T, 2).

    Frame ``k`` of the call covers ``concat(in_buf, chunk)[256k : 256k+512]``
    -- the exact offline framing for global frames >= 1 (reference
    torch.stft center=True, dsp/stft.py:91-111).
    """
    B, n = chunk.shape
    T = n // _HOP
    assert n == T * _HOP, f"chunk length {n} not a multiple of {_HOP}"
    sig = jnp.concatenate([state.in_buf, chunk], axis=-1)  # (B, 256(T+1))
    segs = sig.reshape(B, T + 1, _HOP)
    frames = jnp.concatenate([segs[:, :-1], segs[:, 1:]], axis=-1)
    frames = frames * window
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=_NFFT, axis=-1)
    spec = jnp.moveaxis(spec, -1, -2)  # (B, F, T)
    out = jnp.stack([spec.real, spec.imag], axis=-1).astype(chunk.dtype)
    return out, dataclasses.replace(state, in_buf=segs[:, T])


def istft_chunk(
    state: DspState, spec: jax.Array, window: jax.Array
) -> tuple[jax.Array, DspState]:
    """Synthesise spec frames (B, F, T, 2) -> audio chunk (B, 256*T).

    Emitted chunk ``k`` (of this call) is ``tail(frame k-1) + head(frame
    k)`` over the squared-window envelope -- i.e. the output runs one hop
    BEHIND the input (offline output samples ``256(t-1) : 256t`` emerge
    from the step that consumed input chunk ``t``).  The very first chunk
    a fresh stream emits corresponds to the offline center trim (the
    ``n_fft//2`` pad region torch.istft discards): callers drop it.
    """
    c = jax.lax.complex(
        spec[..., 0].astype(jnp.float32), spec[..., 1].astype(jnp.float32)
    )
    c = jnp.moveaxis(c, -2, -1)  # (B, T, F)
    frames = jnp.fft.irfft(c, n=_NFFT, axis=-1) * window  # (B, T, 512)
    heads, tails = frames[..., :_HOP], frames[..., _HOP:]
    prev = jnp.concatenate(
        [state.ola_buf[:, None].astype(jnp.float32), tails[:, :-1]], axis=1
    )
    out = (heads + prev) / _envelope(window)
    B, T = frames.shape[0], frames.shape[1]
    out = out.reshape(B, T * _HOP).astype(spec.dtype)
    return out, dataclasses.replace(
        state, ola_buf=tails[:, T - 1].astype(state.ola_buf.dtype)
    )


def _dft_mats(window) -> tuple:
    """Windowed DFT / inverse-DFT as dense matrices for the MXU path.

    XLA's FFT at n=512 runs in float32 with several (B, 512)-f32
    materialisations and costs ~1 ms at 8k streams (PERF.md r3) -- far
    from speed-of-light for 4.3 GFLOP of work.  On a TPU the natural form
    of a fixed small DFT is a matmul: fold the analysis window into the
    forward matrix and the synthesis window AND the OLA envelope division
    into the inverse matrix, so the whole streaming DSP becomes two MXU
    dots plus shifts/adds.

    fwd: (n_fft, 2F) -- frames @ fwd = [Re | Im] of the windowed rfft
    inv: (2F, n_fft) -- [Re | Im] @ inv = windowed, envelope-normalised
         irfft frame ready for overlap-add
    """
    import numpy as np

    w = np.asarray(window, np.float64)
    n = w.shape[0]
    F = n // 2 + 1
    i = np.arange(n)[:, None]
    k = np.arange(F)[None, :]
    ang = 2.0 * np.pi * i * k / n
    fwd = np.concatenate(
        [w[:, None] * np.cos(ang), w[:, None] * -np.sin(ang)], axis=1
    )
    # irfft: x_i = (1/n) sum_k c_k (Re_k cos - Im_k sin), c_k = 2 except
    # the DC and Nyquist bins
    c = np.full((1, F), 2.0)
    c[0, 0] = c[0, -1] = 1.0
    env = np.asarray(_envelope(window), np.float64)  # length n//2
    wn = w / np.concatenate([env, env])  # synthesis win / OLA envelope
    inv = np.concatenate(
        [(c * np.cos(ang)).T, (c * -np.sin(ang)).T], axis=0
    ) * (wn[None, :] / n)
    return fwd.astype(np.float32), inv.astype(np.float32)


def make_audio_step(model, window: jax.Array, dft: str = "fft"):
    """Audio-in -> audio-out serving step over ``model``.

    Returns ``step(params, dsp_state, model_state, chunk) -> (out_chunk,
    dsp_state, model_state)`` where ``chunk`` is (B, 256*T) samples and
    ``out_chunk`` the enhanced samples one hop behind (see
    :func:`istft_chunk`).  Jit (with ``donate_argnums=(1, 2)``) for
    serving; composes with the model's T-chunk ring steps.

    ``dft``: "fft" uses the float32 FFT (bit-matches the offline
    transforms); "mxu" lowers the windowed DFT pair to two MXU matmuls in
    the serving dtype (f32 accumulate) -- the TPU-native form for a fixed
    512-point transform, worth ~0.8 ms/step at 8k bf16 streams (PERF.md).
    """
    if dft not in ("fft", "mxu"):
        raise ValueError(f"dft must be 'fft' or 'mxu', got {dft!r}")
    if dft == "mxu":
        fwd_np, inv_np = _dft_mats(window)

    def step(params, dsp_state: DspState, model_state, chunk: jax.Array):
        if dft == "fft":
            spec, dsp_state = stft_chunk(dsp_state, chunk, window)
        else:
            spec, dsp_state = _stft_chunk_mxu(dsp_state, chunk, fwd_np)
        out_spec, model_state = model.step(params, model_state, spec)
        if dft == "fft":
            out, dsp_state = istft_chunk(dsp_state, out_spec, window)
        else:
            out, dsp_state = _istft_chunk_mxu(dsp_state, out_spec, inv_np)
        return out, dsp_state, model_state

    return step


def make_audio_scan(model, window: jax.Array, dft: str = "fft"):
    """One-call long-form audio streaming: ``lax.scan`` over hop chunks.

    Returns ``scan(params, dsp_state, model_state, audio) -> (out, dsp,
    model_state)`` where ``audio`` is (B, n_hops*hop) samples and ``out``
    the enhanced samples with the one-hop stream delay (first emitted
    chunk = the discarded center-trim region, included so callers slice
    ``out[:, hop:]`` against ``audio[:, :-hop]``).  The whole stream runs
    as ONE compiled program -- no per-chunk dispatch, XLA unrolls nothing.
    """
    step = make_audio_step(model, window, dft=dft)

    def scan(params, dsp_state: DspState, model_state, audio: jax.Array):
        B, n = audio.shape
        chunks = audio.reshape(B, n // _HOP, _HOP).swapaxes(0, 1)

        def body(carry, chunk):
            dsp, mstate = carry
            out, dsp, mstate = step(params, dsp, mstate, chunk)
            return (dsp, mstate), out

        (dsp_state, model_state), outs = jax.lax.scan(
            body, (dsp_state, model_state), chunks
        )
        out = outs.swapaxes(0, 1).reshape(B, n)
        return out, dsp_state, model_state

    return scan


def _stft_chunk_mxu(state: DspState, chunk: jax.Array, fwd_np):
    """Windowed analysis as one MXU dot: frames @ (win * DFT)."""
    B, n = chunk.shape
    T = n // _HOP
    sig = jnp.concatenate([state.in_buf, chunk], axis=-1)
    segs = sig.reshape(B, T + 1, _HOP)
    frames = jnp.concatenate([segs[:, :-1], segs[:, 1:]], axis=-1)
    fwd = jnp.asarray(fwd_np, chunk.dtype)
    # HIGHEST: a no-op for bf16 operands, but keeps f32 serving at true
    # f32 accuracy (TPU default decomposes f32 dots into bf16 passes)
    ri = jnp.einsum("btn,nf->btf", frames, fwd,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    F = fwd.shape[1] // 2
    spec = jnp.stack([ri[..., :F], ri[..., F:]], axis=-1)  # (B, T, F, 2)
    spec = jnp.moveaxis(spec, 1, 2).astype(chunk.dtype)  # (B, F, T, 2)
    return spec, dataclasses.replace(state, in_buf=segs[:, T])


def _istft_chunk_mxu(state: DspState, spec: jax.Array, inv_np):
    """Synthesis as one MXU dot with window and OLA envelope pre-folded."""
    B, F, T, _ = spec.shape
    # rebuild the [Re(F) | Im(F)] contraction layout from (..., F, T, 2)
    ri = jnp.concatenate(
        [jnp.moveaxis(spec[..., 0], 2, 1), jnp.moveaxis(spec[..., 1], 2, 1)],
        axis=-1,
    )  # (B, T, 2F)
    inv = jnp.asarray(inv_np, spec.dtype)
    frames = jnp.einsum("btf,fn->btn", ri, inv,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    heads, tails = frames[..., :_HOP], frames[..., _HOP:]
    prev = jnp.concatenate(
        [state.ola_buf[:, None].astype(jnp.float32), tails[:, :-1]], axis=1
    )
    out = (heads + prev).reshape(B, T * _HOP).astype(spec.dtype)
    return out, dataclasses.replace(
        state, ola_buf=tails[:, T - 1].astype(state.ola_buf.dtype)
    )
