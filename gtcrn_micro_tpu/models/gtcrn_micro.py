"""GTCRN-Micro: the flagship model, one graph for offline/streaming/training.

Top-level graph (reference gtcrn_micro/models/gtcrn_micro.py:485-532):

    spec (B,F=257,T,2)
    -> [mag, real, imag] feature stack            (B,T,257,3)   :512-515
    -> ERB band merge                             (B,T,129,3)   :517
    -> SFE-Lite depthwise freq conv               (B,T,129,3)   :518
    -> Encoder (129->65->33 freq, 5 skips)        (B,T,33,16)   :520
    -> GTCN x2 (8 dilated TCNs, RF ~61 frames)    (B,T,33,16)   :522-523
    -> Decoder (+skips, 33->65->129)              (B,T,129,2)   :525
    -> ERB band split                             (B,T,257,2)   :527
    -> complex ratio mask apply                   (B,F,T,2)     :529-530

The public array API keeps the reference's (B, F, T, 2) spec layout; all
internal compute is NHWC (B, T, F, C) -- the TPU-native layout.

Streaming: ``init_state`` + ``step`` process arbitrary chunk sizes (T>=1)
with the same block code (caches replace zero left-padding), replacing the
reference's hand-synced StreamGTCRNMicro
(gtcrn_micro/streaming/gtcrn_micro_stream.py:521-574).  State inventory per
stream matches the reference's canonical shapes (:617-623): 6 conv caches
(2,33,16), 6 TRA caches (2,8), 8 TCN caches (2d,33,16) for d in 1,2,4,8 x2.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from gtcrn_micro_tpu.dsp.erb import ErbBands
from gtcrn_micro_tpu.nn.blocks import Decoder, Encoder, GTCN, SFELite
from gtcrn_micro_tpu.nn.core import Ctx


@dataclasses.dataclass(frozen=True)
class GTCRNMicroConfig:
    n_fft: int = 512
    hop_len: int = 256
    win_len: int = 512
    erb_subband_1: int = 65
    erb_subband_2: int = 64
    channels: int = 16

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1


@dataclasses.dataclass(frozen=True)
class GTCRNMicro:
    """Pure-function model: ``init`` -> params, ``apply`` offline,
    ``init_state``/``step`` streaming.  All methods are jit/vmap/scan safe."""

    config: GTCRNMicroConfig = GTCRNMicroConfig()

    def __post_init__(self):
        c = self.config
        object.__setattr__(
            self, "erb", ErbBands(c.erb_subband_1, c.erb_subband_2, c.n_fft)
        )
        object.__setattr__(self, "sfe", SFELite(3))
        object.__setattr__(self, "encoder", Encoder())
        object.__setattr__(self, "gtcn1", GTCN(c.channels, name="gtcn1"))
        object.__setattr__(self, "gtcn2", GTCN(c.channels, name="gtcn2"))
        object.__setattr__(self, "decoder", Decoder())

    # -- params ------------------------------------------------------------

    def init(self, key) -> dict:
        ks = jax.random.split(key, 5)
        return {
            "erb": self.erb.init_params(),
            "sfe": self.sfe.init(ks[0]),
            "encoder": self.encoder.init(ks[1]),
            "gtcn1": self.gtcn1.init(ks[2]),
            "gtcn2": self.gtcn2.init(ks[3]),
            "decoder": self.decoder.init(ks[4]),
        }

    # -- shared graph ------------------------------------------------------

    def _forward(self, params, spec, ctx: Ctx):
        """spec: (B, F, T, 2) -> enhanced spec (B, F, T, 2)."""
        # (B,F,T,2) -> (B,T,F,2); feature stack [mag, real, imag] as channels
        spec_btf = jnp.swapaxes(spec, 1, 2)
        real = spec_btf[..., 0]
        imag = spec_btf[..., 1]
        mag = jnp.sqrt(real * real + imag * imag + 1e-12)

        # ERB band merge per feature plane: each of mag/real/imag is a
        # (B,T,F) array, so the merge is a contraction on the MINOR axis
        # (clean MXU dot) followed by ONE channel stack.  Equivalent to the
        # reference's stack->transpose->matmul->transpose chain
        # (gtcrn_micro.py:512-517) minus two F-sized transposes per step --
        # the largest pure-layout materialisations in the serving path.
        erb_p = params["erb"]
        feat = jnp.stack(
            [self.erb.bm(erb_p, c) for c in (mag, real, imag)], axis=-1
        )  # (B,T,129,3)

        feat = self.sfe(ctx, params["sfe"], feat)
        feat, en_outs = self.encoder(ctx, params["encoder"], feat)
        feat = self.gtcn1(ctx, params["gtcn1"], feat)
        feat = self.gtcn2(ctx, params["gtcn2"], feat)
        m_feat = self.decoder(ctx, params["decoder"], feat, en_outs)

        # ERB band split per mask plane (transpose-free, as above)
        m_r = self.erb.bs(erb_p, m_feat[..., 0])  # (B,T,257)
        m_i = self.erb.bs(erb_p, m_feat[..., 1])

        # complex ratio mask (reference :472-482)
        s_real = real * m_r - imag * m_i
        s_imag = imag * m_r + real * m_i
        out = jnp.stack([s_real, s_imag], axis=-1)  # (B,T,F,2)
        return jnp.swapaxes(out, 1, 2)  # (B,F,T,2)

    # -- offline -----------------------------------------------------------

    def apply(self, params, spec, *, training: bool = False):
        """Offline forward.  Returns enhanced spec; in training mode also the
        collected BN batch stats ({path: value})."""
        ctx = Ctx(training=training)
        out = self._forward(params, spec, ctx)
        if training:
            return out, ctx.stats
        return out

    @property
    def apply_jit(self):
        """Jit-compiled offline forward (inference mode), cached per model."""
        return _jitted_apply(self)

    @property
    def step_jit(self):
        """Jit-compiled streaming step, cached per model."""
        return _jitted_step(self)

    @property
    def scan_frames_jit(self):
        """Jit-compiled whole-utterance streaming scan, cached per model."""
        return _jitted_scan(self)

    # -- streaming ---------------------------------------------------------

    def init_state(
        self, batch: int, dtype=jnp.float32, ring: bool = True,
        l2_psum: bool = False, store_dtype=None,
    ) -> dict:
        """Zeroed streaming caches (flat dict path->array), batched over
        ``batch`` concurrent streams.

        ``ring=True`` (default, serving fast path): caches are ring buffers
        plus a global ``step`` counter; a step over a T-frame chunk writes T
        frames per cache instead of shifting whole windows -- O(chunk) state
        traffic.  T must be a power of two <= 16 and stay the SAME for the
        lifetime of a state (the all-zeros init is valid for any T; the ring
        slot layout differs between chunk sizes after the first step).
        ``ring=False``: shift-based caches (any chunk size; the oracle path
        for tests).

        ``l2_psum=True`` (ring mode only): the L==2 temporal convs (the 6
        GTConv depth convs, the 2 d=1 TCN convs and the 6 TRA energy convs)
        carry their two partial OUTPUT frames instead of a 2-frame input
        ring -- same products reassociated, but nothing for XLA's
        memory-space assignment to stage/evict (the ring evictions were the
        25.8%% 'copies' row of PERF.md's serving trace).  The canonical
        input-ring layout (``l2_psum=False``, default) matches the
        reference's cache inventory shape-for-shape.

        ``store_dtype`` (ring mode only): store the ring caches in a
        narrower dtype than the compute dtype (e.g. ``jnp.float8_e4m3fn``)
        and cast on tap read -- halves ring HBM bytes at a quality cost
        that compounds through the recurrence (PERF.md r4 measures both).
        The step infers the mode from the state's own dtypes.
        """
        cfg = self.config

        def trace(params, spec):
            ctx = Ctx(state={}, initializing=True, ring=ring,
                      l2_psum=ring and l2_psum,
                      store_dtype=store_dtype if ring else None)
            self._forward(params, spec, ctx)
            return ctx.new_state

        params_shape = jax.eval_shape(lambda: self.init(jax.random.PRNGKey(0)))
        # trace with params in the state dtype so cache dtypes follow it
        # (bf16 serving: params/state/activations all bf16)
        params_shape = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, dtype), params_shape
        )
        spec_shape = jax.ShapeDtypeStruct((batch, cfg.n_freqs, 1, 2), dtype)
        shapes = jax.eval_shape(trace, params_shape, spec_shape)
        state = {k: jnp.zeros(v.shape, v.dtype) for k, v in shapes.items()}
        if ring:
            # all ring lengths are powers of two <= 16, so a mod-16 counter
            # indexes every ring consistently
            state["step"] = jnp.zeros((), jnp.int32)
        return state

    def step(self, params, state: dict, spec: jax.Array):
        """One streaming step over a chunk: spec (B, F, T_chunk, 2) ->
        (enhanced (B, F, T_chunk, 2), new_state).  With ring state T_chunk
        must be a power of two <= 16 (and constant per state); with shift
        state any static chunk size works."""
        ring = "step" in state
        T = spec.shape[2]
        if ring and not (T <= 16 and (T & (T - 1)) == 0):
            raise ValueError(
                f"ring state needs a power-of-two chunk <= 16, got T={T}"
            )
        # the cache strategy is encoded in the state's own key layout, so a
        # step() caller never has to carry mode flags alongside the pytree
        l2_psum = ring and any(k.endswith("psum_a") for k in state)
        ctx = Ctx(state=state, ring=ring, step=state.get("step"),
                  l2_psum=l2_psum)
        out = self._forward(params, spec, ctx)
        new_state = ctx.new_state
        if ring:
            # counter wraps mod 16 (every ring length divides 16, and T | 16)
            new_state["step"] = (state["step"] + T) & 15
        return out, new_state

    def scan_frames(self, params, state: dict, spec: jax.Array):
        """Stream a whole utterance via lax.scan over frames.

        spec: (B, F, T, 2) -> (enhanced (B, F, T, 2), final state).  This is
        the sequential-evaluation oracle for streaming==offline tests and the
        building block for the batched-streams throughput path.
        """
        return scan_stepper(self.step, params, state, spec)


def scan_stepper(step_fn, params, state: dict, spec: jax.Array):
    """Frame-by-frame lax.scan of ANY step-protocol callable
    (``step(params, state, frame) -> (out, state)``): the single sequential-
    evaluation helper shared by GTCRNMicro.scan_frames and the quantized /
    fused parity harnesses."""

    def body(carry, frame):
        y, new_state = step_fn(params, carry, frame[:, :, None, :])
        return new_state, y[:, :, 0, :]

    frames = jnp.moveaxis(spec, 2, 0)  # (T, B, F, 2)
    final_state, ys = jax.lax.scan(body, state, frames)
    return jnp.moveaxis(ys, 0, 2), final_state


@functools.lru_cache(maxsize=None)
def _jitted_apply(model: GTCRNMicro):
    return jax.jit(lambda params, spec: model.apply(params, spec))


@functools.lru_cache(maxsize=None)
def _jitted_step(model: GTCRNMicro):
    return jax.jit(model.step)


@functools.lru_cache(maxsize=None)
def _jitted_scan(model: GTCRNMicro):
    return jax.jit(model.scan_frames)


if __name__ == "__main__":
    # Complexity + causality + streaming-parity demo, mirroring the
    # reference model's __main__ (gtcrn_micro.py:535-570).
    import numpy as np

    from gtcrn_micro_tpu.utils.complexity import model_complexity

    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    n_params, n_macs = model_complexity(model)
    print(f"params: {n_params / 1e3:.2f} k   MACs/s audio: {n_macs / 1e6:.2f} M")

    # causality: identical prefixes -> identical outputs over the prefix
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1, 257, 20, 2)).astype(np.float32)
    b = a.copy()
    b[:, :, 10:] = rng.standard_normal((1, 257, 10, 2))
    ya = np.asarray(model.apply_jit(params, jnp.asarray(a)))
    yb = np.asarray(model.apply_jit(params, jnp.asarray(b)))
    pre = np.abs(ya[:, :, :10] - yb[:, :, :10]).max()
    post = np.abs(ya[:, :, 10:] - yb[:, :, 10:]).max()
    print(f"causality: prefix diff {pre:.2e} (==0), suffix diff {post:.3f} (>0)")

    # streaming == offline
    state = model.init_state(1)
    ys, _ = model.scan_frames_jit(params, state, jnp.asarray(a))
    print(f"streaming vs offline: {np.abs(np.asarray(ys) - ya).max():.2e}")
