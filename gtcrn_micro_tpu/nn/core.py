"""Functional layer core: one graph definition for offline, streaming & training.

Design (SURVEY.md §7): the model is a pure function over a params pytree.  The
offline path and the frame-streaming path share *the same* block code -- the
only difference is where a temporal op's left context comes from:

- offline: zeros (equivalent to the reference's causal left zero-padding,
  reference gtcrn_micro/models/gtcrn_micro.py:237,302)
- streaming: a cache of the last ``L`` input frames, threaded through a
  :class:`Ctx` (the reference maintains a hand-synced second model copy for
  this, gtcrn_micro/streaming/gtcrn_micro_stream.py -- its biggest structural
  liability; here streaming==offline holds by construction)

Activations are laid out ``(B, T, F, C)`` (NHWC: time=H, freq=W) -- the
TPU-native layout, so convs lower to MXU-friendly NHWC/HWIO contractions and
the channel dim sits in lanes.  A streaming step processes ``T`` = chunk
length (usually 1) with identical code.

Weights are stored in a single canonical layout:

- 2D convs: HWIO ``(kT, kF, C_in/groups, C_out)``; transposed convs are
  canonicalised at import time to *flipped-kernel plain convs* (the same trick
  the reference applies only for streaming, conversion/convert.py:36-51),
  with frequency upsampling expressed as ``lhs_dilation``
- pointwise/linear: ``(C_in, C_out)`` matrices

so a single ``lax.conv_general_dilated`` call serves conv, deconv, offline and
streaming modes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# All contractions run at HIGHEST precision: full fp32 accuracy on the MXU
# (bf16x3 passes).  The model is HBM-bandwidth-bound at serving, so this
# costs little and preserves >60 dB checkpoint parity; quantized serving
# paths opt into lower precision explicitly.
PRECISION = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Context threading: scoping, streaming caches, BN batch-stat collection
# ---------------------------------------------------------------------------


class Ctx:
    """Per-call context threaded through the layer tree.

    - ``training``: BN uses batch stats and records them in ``stats``
    - ``state``: incoming streaming caches (flat dict path->array) or None for
      the offline path (zero left context)
    - ``new_state``: caches written during a streaming call
    """

    def __init__(
        self,
        *,
        training: bool = False,
        state: dict | None = None,
        initializing: bool = False,
        ring: bool = False,
        step: Any = None,
        l2_psum: bool = False,
        store_dtype: Any = None,
    ):
        self.training = training
        self.state = state if state is not None or not initializing else {}
        self.initializing = initializing
        self.new_state: dict[str, Any] = {}
        self.stats: dict[str, Any] = {}
        self._path: list[str] = []
        # Ring-buffer streaming (serving fast path): caches are rings indexed
        # by a global step counter; a step over a T-frame chunk WRITES T
        # frames (dynamic_update_slice) instead of shifting whole windows.
        # All ring lengths are powers of two <= 16, so ``step`` wraps mod 16;
        # T must be a power of two so slab reads/writes stay aligned (see
        # CausalConv2d._ring_call).
        # Two further cache strategies (packed group rings; rotation caches)
        # were built, oracle-tested and measured SLOWER on this hardware
        # (PERF.md "rejected alternatives"); their implementations live in git
        # history (tag r2, nn/core.py) and were removed to keep the
        # one-definition invariant tight.
        self.ring = ring
        self.step = step
        # Direct-form-II-transposed state for the L==2 (kT=3, d=1) temporal
        # convs: instead of a 2-frame input ring (which XLA's memory-space
        # assignment stages in VMEM and evicts with a full-ring copy every
        # step -- the 25.8% "copies" row in PERF.md's serving trace), carry
        # the two PARTIAL OUTPUT frames (a = w0*x_t, b = w1*x_t + a_prev,
        # out = w2*x_t + b_prev).  Both state entries are freshly computed
        # values each step -- no dynamic indexing, no passthrough identity,
        # nothing for MSA to stage or copy.  Rings with L >= 4 already alias
        # in place and keep the ring form.
        self.l2_psum = l2_psum
        # Optional narrower STORAGE dtype for ring caches (e.g. fp8_e4m3):
        # rings are stored narrow and cast to the compute dtype on tap read
        # (the cast fuses into the conv's input), halving ring HBM bytes.
        # None = rings stored in the compute dtype.
        self.store_dtype = store_dtype
        # Optional quantization hook (duck-typed, see quant/): an object with
        # ``act(ctx, leaf, x)`` and ``weight(ctx, leaf, w, channel_axis)``
        # called at every conv/matmul boundary.  None = fp32 path, zero cost.
        self.quant: Any = None

    @property
    def streaming(self) -> bool:
        return self.state is not None

    def scope(self, name: str) -> "_Scope":
        return _Scope(self, name)

    def path(self, leaf: str | None = None) -> str:
        parts = self._path if leaf is None else self._path + [leaf]
        return "/".join(parts)

    def get_state(self, leaf: str) -> Any:
        return self.state[self.path(leaf)]

    def put_state(self, leaf: str, value: Any) -> None:
        self.new_state[self.path(leaf)] = value

    def put_stats(self, leaf: str, value: Any) -> None:
        self.stats[self.path(leaf)] = value


class _Scope:
    def __init__(self, ctx: Ctx, name: str):
        self.ctx = ctx
        self.name = name

    def __enter__(self):
        self.ctx._path.append(self.name)
        return self.ctx

    def __exit__(self, *exc):
        self.ctx._path.pop()
        return False


# ---------------------------------------------------------------------------
# Initialisation helpers (torch-compatible defaults, for from-scratch training)
# ---------------------------------------------------------------------------


def _kaiming_uniform_conv(key, shape_hwio, groups: int):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ..)."""
    kT, kF, cin_g, cout = shape_hwio
    fan_in = kT * kF * cin_g
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape_hwio, jnp.float32, -bound, bound)


def _uniform_bias(key, cout: int, fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (cout,), jnp.float32, -bound, bound)


# ---------------------------------------------------------------------------
# Elementwise activations
# ---------------------------------------------------------------------------


def prelu(x, alpha):
    """PReLU with a broadcastable alpha (torch default: one shared scalar)."""
    return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


@dataclasses.dataclass(frozen=True)
class PReLU:
    """Single-scalar PReLU (matches torch nn.PReLU() num_parameters=1)."""

    def init(self, key) -> dict:
        return {"alpha": jnp.full((), 0.25, jnp.float32)}

    def __call__(self, params, x):
        return prelu(x, params["alpha"])


# ---------------------------------------------------------------------------
# BatchNorm (torch BatchNorm2d semantics over (B, T, F, C))
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BatchNorm:
    """Per-channel batchnorm matching torch.nn.BatchNorm2d (eps 1e-5, mom 0.1).

    Running stats live in the params tree (non-trainable leaves; the trainer
    filters them out of the optimizer and folds the batch stats collected in
    ``ctx.stats`` back in with torch's update rule: biased var for
    normalisation, unbiased var for the running estimate).
    """

    channels: int
    eps: float = 1e-5
    name: str = "bn"

    def init(self, key) -> dict:
        c = self.channels
        return {
            "gamma": jnp.ones((c,), jnp.float32),
            "beta": jnp.zeros((c,), jnp.float32),
            "running_mean": jnp.zeros((c,), jnp.float32),
            "running_var": jnp.ones((c,), jnp.float32),
        }

    def __call__(self, ctx: Ctx, params, x):
        if ctx.training:
            # reduce over batch, time, freq; channel is last.  Stats are
            # computed in f32 regardless of the compute dtype (a no-op for
            # f32 inputs): under bf16 mixed-precision training the large
            # batch*time*freq reductions would otherwise lose the low bits
            # that the running-stat EMA depends on.
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=tuple(range(x.ndim - 1)))
            var = jnp.mean(
                jnp.square(xf - mean), axis=tuple(range(x.ndim - 1))
            )
            n = math.prod(x.shape[:-1])
            with ctx.scope(self.name):
                ctx.put_stats("batch_mean", mean)
                ctx.put_stats("batch_var", var * (n / max(n - 1, 1)))  # unbiased
            mean = mean.astype(x.dtype)
            var = var.astype(x.dtype)
        else:
            mean = params["running_mean"]
            var = params["running_var"]
        inv = jax.lax.rsqrt(var + self.eps) * params["gamma"]
        return (x - mean) * inv + params["beta"]


# ---------------------------------------------------------------------------
# The unified temporal/frequency conv primitive
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CausalConv2d:
    """Causal-in-time 2D conv over (B, T, F, C_in) -> (B, T', F', C_out).

    Covers every conv in the model family:

    - plain convs (encoder, pointwise, depthwise/grouped): ``freq_up=1``
    - transposed convs (decoder): canonical flipped-kernel weights with
      ``freq_up = F_stride`` expressed as ``lhs_dilation`` (the reference's
      StreamConvTranspose2d zero-stuffing, conversion/convolution.py:218-250,
      done here by XLA with no materialised zeros)

    Time is always causal: left context of ``(kT-1)*dT`` frames -- zeros when
    offline, the streamed cache otherwise; both run the same valid conv, so
    streaming == offline exactly.  The transposed-conv time-truncation of the
    reference (gtcrn_micro.py:245-249) falls out for free.
    """

    c_in: int
    c_out: int
    kernel: tuple[int, int]  # (kT, kF)
    freq_stride: int = 1
    freq_pad: int = 0
    dilation: tuple[int, int] = (1, 1)
    groups: int = 1
    bias: bool = True
    freq_up: int = 1  # >1: transposed conv along frequency
    name: str = "conv"

    @property
    def time_context(self) -> int:
        return (self.kernel[0] - 1) * self.dilation[0]

    def init(self, key) -> dict:
        kT, kF = self.kernel
        wkey, bkey = jax.random.split(key)
        shape = (kT, kF, self.c_in // self.groups, self.c_out)
        p = {"w": _kaiming_uniform_conv(wkey, shape, self.groups)}
        if self.bias:
            fan_in = kT * kF * self.c_in // self.groups
            p["b"] = _uniform_bias(bkey, self.c_out, fan_in)
        return p

    def state_shape(self, batch: int, freq: int) -> tuple[int, ...]:
        return (batch, self.time_context, freq, self.c_in)

    def _freq_conv(self, w, xin, time_dilation=None):
        """The conv core (no bias): xin (B,T,F,C) with any time window."""
        if self.freq_up > 1:
            # transposed conv along freq: lhs_dilation + transpose padding.
            # XLA pads the *dilated* input of size (F-1)*up+1, so the torch
            # ConvTranspose2d geometry is the symmetric pad below.
            fp = self.dilation[1] * (self.kernel[1] - 1) - self.freq_pad
            pad_f = (fp, fp)
            lhs_dilation = (1, self.freq_up)
            window_strides = (1, 1)
        else:
            pad_f = (self.freq_pad, self.freq_pad)
            lhs_dilation = (1, 1)
            window_strides = (1, self.freq_stride)

        return jax.lax.conv_general_dilated(
            xin,
            w,
            window_strides=window_strides,
            padding=[(0, 0), pad_f],
            lhs_dilation=lhs_dilation,
            rhs_dilation=(
                self.dilation if time_dilation is None
                else (time_dilation, self.dilation[1])
            ),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            precision=PRECISION,
        )

    def _psum_call(self, ctx: Ctx, params, x):
        """Direct-form-II-transposed streaming step for kT==3, d==1 convs.

        Carried state = the two partial OUTPUT frames still owed to future
        steps (``psum_b`` = w1*x_{t-1} + w0*x_{t-2}, ``psum_a`` = w0*x_{t-1})
        instead of a 2-frame input ring.  Exactly the same products as the
        ring form, reassociated -- streaming == offline to fp tolerance --
        but every state output is a freshly computed value, so XLA has
        nothing to stage in VMEM and nothing to evict with a copy (PERF.md
        r4: the L==2 rings were the 'copies 25.8%' row of the serving
        trace).  T >= 2 chunks add the cross-boundary terms to the first two
        frames and slide the in-chunk terms with static slices.
        """
        with ctx.scope(self.name):
            w = params["w"]
            if not ctx.initializing and ctx.quant is not None:
                # partial sums are plain reassociation of the quantized
                # products, so quantizing the incoming frames and weights at
                # the boundary keeps fake-quant streaming == offline
                x = ctx.quant.act(ctx, "in", x)
                w = ctx.quant.weight(ctx, "w", w, 3)
            if ctx.initializing:
                # one-frame conv fixes the partial-output state shape; this
                # path only ever runs under init_state's eval_shape trace
                z = jnp.zeros_like(self._freq_conv(w[0:1], x[:, :1]))
                ctx.put_state("psum_b", z)
                ctx.put_state("psum_a", z)
                return jnp.zeros_like(x)  # shape proxy, unused
            a = ctx.get_state("psum_a")
            b = ctx.get_state("psum_b")
            T = x.shape[1]
            # three separate per-tap convs on the shared input.  Merging
            # them into ONE grouped conv with 3x output channels was built
            # and measured ~30% SLOWER at the serving batches (PERF.md r4:
            # XLA lowers grouped convs with 3 outputs per group far worse
            # than three depthwise calls) -- keep the per-tap form.
            c2 = self._freq_conv(w[2:3], x)
            c1 = self._freq_conv(w[1:2], x)
            c0 = self._freq_conv(w[0:1], x)
            if T == 1:
                out = c2 + b
                new_b = c1 + a
                new_a = c0
            else:
                # out[0] += b (both left-context taps), out[1] += a (the
                # w0 tap of the last pre-chunk frame); interior frames use
                # the chunk's own shifted partials
                shift1 = jnp.concatenate([b, c1[:, : T - 1]], axis=1)
                shift0 = jnp.concatenate(
                    [jnp.zeros_like(a), a, c0[:, : T - 2]], axis=1
                )
                out = c2 + shift1 + shift0
                new_b = c1[:, T - 1 :] + c0[:, T - 2 : T - 1]
                new_a = c0[:, T - 1 :]
            ctx.put_state("psum_b", new_b)
            ctx.put_state("psum_a", new_a)
        if self.bias:
            out = out + params["b"]
        return out

    def _ring_call(self, ctx: Ctx, params, x):
        """Ring-buffer streaming step over a T-frame chunk (T = x.shape[1]).

        T == 1 is the classic serving path: read kT-1 tap frames from the
        ring, write ONE frame back -- O(1) state traffic per step vs the
        concat path's full-window shift (the reference's StreamConv2d
        pattern, conversion/convolution.py:107-119, made cheap).

        T > 1 amortizes the step's per-op dispatch/materialisation overhead
        over T frames (VERDICT r2 #1).  Alignment invariant: the global step
        counter starts at 0 and advances by T, and T is a power of two, so
        with dilation d >= T every tap slab of T frames starts T-aligned
        inside the ring and never wraps; with d < T the whole left context
        (L = (kT-1)*d <= T for kT==3) is re-emitted each step as a pure slice
        of the concatenated window -- no read-modify-write either way.
        """
        kT = self.kernel[0]
        d = self.dilation[0]
        L = self.time_context  # (kT-1)*d
        T = x.shape[1]
        if ctx.l2_psum and kT == 3 and d == 1:
            return self._psum_call(ctx, params, x)

        with ctx.scope(self.name):
            w = params["w"]
            if not ctx.initializing and ctx.quant is not None:
                # the ring already holds quantized frames (fake-quant is
                # idempotent and 0 is exactly representable), so only the
                # incoming frames need quantizing
                x = ctx.quant.act(ctx, "in", x)
                w = ctx.quant.weight(ctx, "w", w, 3)
            if ctx.initializing:
                ctx.put_state(
                    "ring",
                    jnp.zeros((x.shape[0], L) + x.shape[2:],
                              ctx.store_dtype or x.dtype),
                )
                return jnp.zeros_like(x)  # shape proxy, unused
            ring = ctx.get_state("ring")
            store = ring.dtype
            t = ctx.step
            if d >= T:
                # tap j (j < kT-1) applies w[j] to frames
                # [t-(kT-1-j)d, ... +T), stored as the T-frame slab at ring
                # slot (t + j*d) mod L; w[kT-1] applies to the chunk itself.
                # NOTE: per-tap depthwise convs as explicit shift-FMA
                # elementwise ops were tried and measured 2.7x SLOWER (9.9 vs
                # 3.65 ms/frame @16k streams) -- XLA's conv path wins; keep
                # conv_general here.
                out = self._freq_conv(w[kT - 1 : kT], x)
                for j in range(kT - 1):
                    slot = jax.lax.rem(t + j * d, L)
                    tap = jax.lax.dynamic_slice_in_dim(ring, slot, T, axis=1)
                    out = out + self._freq_conv(w[j : j + 1],
                                                tap.astype(x.dtype))
                # overwrite the oldest T slots (t mod L) with the chunk
                new_ring = jax.lax.dynamic_update_slice_in_dim(
                    ring, x.astype(store), jax.lax.rem(t, L), axis=1
                )
            else:
                # d < T: taps straddle the chunk boundary; run the plain
                # causal conv over [cache | chunk].  The cache holds the last
                # L frames IN TIME ORDER (no rotation: it is fully rewritten
                # every step, and for kT==3 d<T implies L<=T so the new cache
                # is a pure slice of the incoming chunk).
                xin = jnp.concatenate([ring.astype(x.dtype), x], axis=1)
                out = self._freq_conv(w, xin)
                new_ring = xin[:, xin.shape[1] - L :].astype(store)
            ctx.put_state("ring", new_ring)
        if self.bias:
            out = out + params["b"]
        return out

    def __call__(self, ctx: Ctx, params, x):
        L = self.time_context
        if L > 0 and ctx.streaming and ctx.ring:
            if ctx.initializing:
                self._ring_call(ctx, params, x)  # register state only
                # fall through to the concat path for the shape trace
            else:
                return self._ring_call(ctx, params, x)
        if L > 0:
            if ctx.streaming and not ctx.ring:
                with ctx.scope(self.name):
                    if ctx.initializing:
                        cache = jnp.zeros(
                            (x.shape[0], L) + x.shape[2:], dtype=x.dtype
                        )
                        ctx.put_state("cache", cache)
                    else:
                        cache = ctx.get_state("cache")
                    xin = jnp.concatenate([cache, x], axis=1)
                    if not ctx.initializing:
                        ctx.put_state("cache", xin[:, -L:])
            else:
                zeros = jnp.zeros(
                    (x.shape[0], L) + x.shape[2:], dtype=x.dtype
                )
                xin = jnp.concatenate([zeros, x], axis=1)
        else:
            xin = x

        w = params["w"]
        if ctx.quant is not None:
            with ctx.scope(self.name):
                xin = ctx.quant.act(ctx, "in", xin)
                w = ctx.quant.weight(ctx, "w", w, 3)

        out = self._freq_conv(w, xin)
        if self.bias:
            out = out + params["b"]
        return out


# ---------------------------------------------------------------------------
# Pointwise (1x1) conv as a plain matmul -- keeps the MXU fed
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Pointwise:
    """1x1 conv over channels as ``x @ W + b`` on (B, T, F, C)."""

    c_in: int
    c_out: int
    bias: bool = True
    name: str = "pw"

    def init(self, key) -> dict:
        wkey, bkey = jax.random.split(key)
        bound = 1.0 / math.sqrt(self.c_in)
        p = {
            "w": jax.random.uniform(
                wkey, (self.c_in, self.c_out), jnp.float32, -bound, bound
            )
        }
        if self.bias:
            p["b"] = _uniform_bias(bkey, self.c_out, self.c_in)
        return p

    def __call__(self, ctx: Ctx, params, x):
        w = params["w"]
        if ctx.quant is not None:
            with ctx.scope(self.name):
                x = ctx.quant.act(ctx, "in", x)
                w = ctx.quant.weight(ctx, "w", w, 1)
        out = jnp.dot(x, w, precision=PRECISION)
        if self.bias:
            out = out + params["b"]
        return out


# ---------------------------------------------------------------------------
# TRA-Lite: temporal recurrent attention without RNNs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TRALite:
    """Frame-energy gate (reference gtcrn_micro.py:94-139).

    energy e=(x*x).mean(freq) -> causal depthwise conv1d (k=3, cache L=2) ->
    pointwise conv1d -> sigmoid -> gate ``x * g``.  The cache holds the last
    ``L`` energy frames, exactly the reference's canonical
    ``tra_cache`` (B, C, 2) laid out here as (B, 2, C).
    """

    channels: int
    kernel: int = 3
    name: str = "tra"

    @property
    def time_context(self) -> int:
        return self.kernel - 1

    def init(self, key) -> dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        c, k = self.channels, self.kernel
        # depthwise conv1d: torch weight (C, 1, k) -> canonical (k, C)
        bound_d = 1.0 / math.sqrt(k)
        bound_p = 1.0 / math.sqrt(c)
        return {
            "depth_w": jax.random.uniform(k1, (k, c), jnp.float32, -bound_d, bound_d),
            "depth_b": jax.random.uniform(k2, (c,), jnp.float32, -bound_d, bound_d),
            "point_w": jax.random.uniform(
                k3, (c, c), jnp.float32, -bound_p, bound_p
            ),
            "point_b": jax.random.uniform(k4, (c,), jnp.float32, -bound_p, bound_p),
        }

    def state_shape(self, batch: int) -> tuple[int, ...]:
        return (batch, self.time_context, self.channels)

    def _ring_call(self, ctx: Ctx, params, x, e):
        """Ring-buffer step over a T-frame chunk: O(T) energy-cache traffic.

        The TRA energy conv has dilation 1 and context L==2, so for T==1 it
        taps the ring at slots (t+j) mod L; for T>=2 the whole left context
        fits inside [cache | chunk] and the new cache is a pure slice of the
        incoming energies (same alignment argument as CausalConv2d)."""
        L = self.time_context
        T = e.shape[1]
        with ctx.scope(self.name):
            depth_w, point_w = params["depth_w"], params["point_w"]
            if ctx.quant is not None:
                e = ctx.quant.act(ctx, "energy", e)
                depth_w = ctx.quant.weight(ctx, "depth_w", depth_w, 1)
            if ctx.l2_psum:
                # direct-form-II-transposed energy conv (see
                # CausalConv2d._psum_call): state = two partial output
                # frames, freshly computed each step -- no ring indexing
                a = ctx.get_state("psum_a")  # (B, 1, C)
                b = ctx.get_state("psum_b")
                c2 = e * depth_w[2]
                c1 = e * depth_w[1]
                c0 = e * depth_w[0]
                if T == 1:
                    y = params["depth_b"] + c2 + b
                    new_b = c1 + a
                    new_a = c0
                else:
                    shift1 = jnp.concatenate([b, c1[:, : T - 1]], axis=1)
                    shift0 = jnp.concatenate(
                        [jnp.zeros_like(a), a, c0[:, : T - 2]], axis=1
                    )
                    y = params["depth_b"] + c2 + shift1 + shift0
                    new_b = c1[:, T - 1 :] + c0[:, T - 2 : T - 1]
                    new_a = c0[:, T - 1 :]
                ctx.put_state("psum_b", new_b)
                ctx.put_state("psum_a", new_a)
                if ctx.quant is not None:
                    y = ctx.quant.act(ctx, "gate_in", y)
                    point_w = ctx.quant.weight(ctx, "point_w", point_w, 1)
                g = jax.nn.sigmoid(
                    jnp.dot(y, point_w, precision=PRECISION)
                    + params["point_b"]
                )
                return x * g[:, :, None, :]
            t = ctx.step
            ring = ctx.get_state("ring")  # (B, L, C)
            store = ring.dtype
            if T == 1:
                y = params["depth_b"] + e[:, 0] * depth_w[self.kernel - 1]
                for j in range(self.kernel - 1):
                    slot = jax.lax.rem(t + j, L)
                    tap = jax.lax.dynamic_slice_in_dim(ring, slot, 1, axis=1)
                    y = y + tap[:, 0].astype(e.dtype) * depth_w[j]
                y = y[:, None]  # (B, 1, C)
                new_ring = jax.lax.dynamic_update_slice_in_dim(
                    ring, e.astype(store), jax.lax.rem(t, L), axis=1
                )
            else:
                e_cat = jnp.concatenate([ring.astype(e.dtype), e], axis=1)
                y = params["depth_b"]
                for i in range(self.kernel):
                    y = y + e_cat[:, i : i + T, :] * depth_w[i]
                new_ring = e_cat[:, e_cat.shape[1] - L :].astype(store)
            ctx.put_state("ring", new_ring)
            if ctx.quant is not None:
                y = ctx.quant.act(ctx, "gate_in", y)
                point_w = ctx.quant.weight(ctx, "point_w", point_w, 1)
            g = jax.nn.sigmoid(
                jnp.dot(y, point_w, precision=PRECISION) + params["point_b"]
            )
        return x * g[:, :, None, :]

    def __call__(self, ctx: Ctx, params, x):
        """x: (B, T, F, C) -> gated x, same shape."""
        e = jnp.mean(x * x, axis=2)  # (B, T, C)
        L = self.time_context
        if L > 0 and ctx.streaming and not ctx.initializing and ctx.ring:
            return self._ring_call(ctx, params, x, e)
        if L > 0:
            if ctx.streaming:
                with ctx.scope(self.name):
                    if ctx.initializing:
                        if ctx.ring and ctx.l2_psum:
                            z = jnp.zeros(
                                (e.shape[0], 1, e.shape[2]), dtype=e.dtype
                            )
                            ctx.put_state("psum_b", z)
                            ctx.put_state("psum_a", z)
                        else:
                            cache = jnp.zeros(
                                (e.shape[0], L, e.shape[2]),
                                dtype=(ctx.store_dtype or e.dtype)
                                if ctx.ring else e.dtype,
                            )
                            ctx.put_state(
                                "ring" if ctx.ring else "cache", cache
                            )
                    else:
                        cache = ctx.get_state("cache")
                        e_cat = jnp.concatenate([cache, e], axis=1)
                        ctx.put_state("cache", e_cat[:, -L:])
                if ctx.initializing:
                    zeros = jnp.zeros(
                        (e.shape[0], L, e.shape[2]), dtype=e.dtype
                    )
                    e_cat = jnp.concatenate([zeros, e], axis=1)
            else:
                zeros = jnp.zeros((e.shape[0], L, e.shape[2]), dtype=e.dtype)
                e_cat = jnp.concatenate([zeros, e], axis=1)
        else:
            e_cat = e
        depth_w, point_w = params["depth_w"], params["point_w"]
        if ctx.quant is not None:
            with ctx.scope(self.name):
                e_cat = ctx.quant.act(ctx, "energy", e_cat)
                depth_w = ctx.quant.weight(ctx, "depth_w", depth_w, 1)
        # causal depthwise conv over time: sum of k shifted slices (cheap VPU)
        T = e.shape[1]
        y = params["depth_b"]
        for i in range(self.kernel):
            y = y + e_cat[:, i : i + T, :] * depth_w[i]
        if ctx.quant is not None:
            with ctx.scope(self.name):
                y = ctx.quant.act(ctx, "gate_in", y)
                point_w = ctx.quant.weight(ctx, "point_w", point_w, 1)
        g = jnp.dot(y, point_w, precision=PRECISION)
        g = jax.nn.sigmoid(g + params["point_b"])
        return x * g[:, :, None, :]
