"""Fused streaming step v2: ONE pallas_call for the whole batch.

(TPU-native addition beyond the reference; the model graph it computes is
reference gtcrn_micro/models/gtcrn_micro.py:485-532 via
fused_step._forward_values.)

v1 (ops/fused_step.py) is grid-free: one kernel launch per 128-stream tile,
because blocked VMEM operands double-buffer under a grid and the 40 tap
inputs + 21 frame outputs blow VMEM (the tunnel's Mosaic crashes instead of
erroring).  v2 removes taps/frames from the blocked operand set entirely:

- grid over batch tiles; only spec/out are blocked VMEM (small)
- tap tensors are ANY-space (HBM) refs; the kernel DMAs each tile's slice
  into a small reused scratch right before the block that consumes it
- frame outputs are ANY-space refs, DMA-written as each block produces them
  (a sink object passed as the ``frames`` dict to the shared forward)

so per-step host dispatch is ONE kernel for any batch size.  Compute math
is `fused_step._forward_values` -- v1, v2, the XLA paths and the native
runtime share it.

MEASURED OUTCOME (PERF.md): correct (8e-8 parity).  With double-buffered
tap prefetch + async frame writes, per-tile cost is ~125 us/128 streams --
COMPUTE-bound (pipelining DMA barely moved it), ~5x the XLA path's per-
stream cost at scale (15.9 ms vs 3.65 ms @16k): Mosaic's small-dot/VPU code
for C=16 shapes cannot match XLA's conv kernels.  It WINS the low-batch
latency regime: 1.10 ms/frame @1024 streams (XLA 1.14+) and v1 0.92 ms
@128.  The XLA NHWC ring path stays the throughput default.  Mosaic
constraints discovered here: HBM DMA slices whose middle dim is not a
multiple of 8 crash the compiler (rings stored freq-padded to 40); compiles
at some batch sizes (4096) crash flakily where neighbours (1024/16384)
succeed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gtcrn_micro_tpu.ops.fused_step import (
    C,
    F_DOWN,
    F_FULL,
    H,
    RING_DEFS,
    _forward_values,
    _unpack,
    pack_weights,
)

# ring consumption order during _forward_values (block entry order);
# drives the double-buffered tap prefetch pipeline
TAP_ORDER = (
    [x for i in range(3) for x in (f"enc{i}_dw", f"enc{i}_tra")]
    + [f"tcn{s}{j}" for s in range(2) for j in range(4)]
    + [x for i in range(3) for x in (f"dec{i}_dw", f"dec{i}_tra")]
)

BIG = (C, F_DOWN)  # conv/tcn ring frame shape (16, 33)
F_PAD = 40  # rings stored freq-padded: Mosaic crashes on DMA slices whose
BIG_PAD = (C, F_PAD)  # middle dim is not a multiple of 8 (33 -> 40)
SMALL = (H,)  # tra ring frame shape


class _TapFetcher:
    """Double-buffered tap prefetch: when ring k's taps are requested, ring
    k+1's DMAs are already in flight (started when k-1 was consumed), so the
    copy latency hides behind the block's compute.  Consumption must follow
    TAP_ORDER (asserted).  Reads snapshot values (SSA), so earlier taps stay
    valid after their slot is reused."""

    def __init__(self, tap_refs, big_scratch, small_scratch, sems, lo, tile):
        self.tap_refs = tap_refs
        self.big = big_scratch  # (2 slots, 2 taps, 16, 40, tile)
        self.small = small_scratch  # (2 slots, 2 taps, 8, tile)
        self.sems = sems  # DMA sems (2 slots, 2 taps)
        self.lo = lo
        self.tile = tile
        self.idx = 0

    def _copy(self, k):
        name = TAP_ORDER[k]
        r0, r1 = self.tap_refs[name]
        small = r0.shape[:-1] == SMALL
        slot = k % 2
        cps = []
        for j, r in enumerate((r0, r1)):
            if small:
                src = r.at[:, pl.ds(self.lo, self.tile)]
                dst = self.small.at[slot, j]
            else:
                src = r.at[:, :, pl.ds(self.lo, self.tile)]
                dst = self.big.at[slot, j]
            cps.append(
                (pltpu.make_async_copy(src, dst, self.sems.at[slot, j]), dst,
                 small)
            )
        return cps

    def __getitem__(self, name):
        k = self.idx
        assert TAP_ORDER[k] == name, (name, TAP_ORDER[k])
        if k == 0:
            for cp, _d, _s in self._copy(0):
                cp.start()
        if k + 1 < len(TAP_ORDER):
            for cp, _d, _s in self._copy(k + 1):
                cp.start()
        out = []
        for cp, dst, small in self._copy(k):
            # re-created descriptor matches the started one; wait on its sem
            cp.wait()
            v = dst[...].astype(jnp.float32)
            if not small:
                v = v[:, :F_DOWN, :]  # drop the DMA-alignment pad
            out.append(v)
        self.idx += 1
        return tuple(out)


class _FrameSink:
    """frames[name] = value -> stage to a ping-pong scratch, async-DMA to the
    HBM out ref; the write drains while the next block computes.  Before a
    slot is reused its previous DMA is waited."""

    def __init__(self, frame_refs, big_scratch, small_scratch, sems, lo, tile):
        self.frame_refs = frame_refs
        self.big = big_scratch  # (2, 16, 40, tile)
        self.small = small_scratch  # (2, 8, tile)
        self.sems = sems  # (2,)
        self.lo = lo
        self.tile = tile
        self.pending: list = [None, None]  # in-flight copy per slot
        self.idx = 0

    def __setitem__(self, name, value):
        ref = self.frame_refs[name]
        small = ref.shape[:-1] == SMALL
        slot = self.idx % 2
        if self.pending[slot] is not None:
            self.pending[slot].wait()
        scratch = self.small.at[slot] if small else self.big.at[slot]
        if not small:  # pad F 33 -> 40 for the aligned DMA layout
            value = jnp.pad(value, ((0, 0), (0, F_PAD - F_DOWN), (0, 0)))
        scratch[...] = value.astype(ref.dtype)
        if small:
            dst = ref.at[:, pl.ds(self.lo, self.tile)]
        else:
            dst = ref.at[:, :, pl.ds(self.lo, self.tile)]
        cp = pltpu.make_async_copy(scratch, dst, self.sems.at[slot])
        cp.start()
        self.pending[slot] = cp
        self.idx += 1

    def drain(self):
        for cp in self.pending:
            if cp is not None:
                cp.wait()
        self.pending = [None, None]


def _make_kernel(tile: int):
    def kernel(*refs):
        W, rest = _unpack(refs)
        it = iter(rest)
        spec_ref = next(it)
        tap_refs = {}
        for name, *_ in RING_DEFS:
            tap_refs[name] = (next(it), next(it))
        out_ref = next(it)
        frame_refs = {name: next(it) for name, *_ in RING_DEFS}
        tap_big, tap_small, frame_big, frame_small, tap_sems, frame_sem = (
            next(it), next(it), next(it), next(it), next(it), next(it)
        )

        lo = pl.program_id(0) * tile
        taps = _TapFetcher(tap_refs, tap_big, tap_small, tap_sems, lo, tile)
        frames = _FrameSink(frame_refs, frame_big, frame_small, frame_sem,
                            lo, tile)
        spec = spec_ref[...].astype(jnp.float32)
        out, _ = _forward_values(W, spec, taps, jnp.float32, frames)
        frames.drain()
        out_ref[...] = out.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _fused_grid_call(weights, spec_t, taps_flat, tile: int,
                     interpret: bool = False):
    B = spec_t.shape[-1]
    n_tiles = B // tile
    dtype = spec_t.dtype
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    def wspec(w):
        nd = w.ndim
        return pl.BlockSpec(
            w.shape, lambda i, nd=nd: (0,) * nd, memory_space=pltpu.VMEM
        )

    in_specs = (
        [wspec(w) for w in weights]
        + [pl.BlockSpec((2, F_FULL, tile), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)]
        + [any_spec] * len(taps_flat)
    )
    out_shapes = [jax.ShapeDtypeStruct((2, F_FULL, B), dtype)]
    out_specs = [pl.BlockSpec((2, F_FULL, tile), lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)]
    for _name, _L, _d, shape in RING_DEFS:
        padded = BIG_PAD if shape == BIG else shape
        out_shapes.append(jax.ShapeDtypeStruct(padded + (B,), dtype))
        out_specs.append(any_spec)

    return pl.pallas_call(
        _make_kernel(tile),
        grid=(n_tiles,),
        out_shape=tuple(out_shapes),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((2, 2) + BIG_PAD + (tile,), jnp.float32),
            pltpu.VMEM((2, 2) + SMALL + (tile,), jnp.float32),
            pltpu.VMEM((2,) + BIG_PAD + (tile,), dtype),
            pltpu.VMEM((2,) + SMALL + (tile,), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*weights, spec_t, *taps_flat)


class GridFusedGTCRNMicro:
    """Serving model: whole per-frame forward in ONE kernel launch for any
    batch (grid over tiles, tap DMA).  Same step protocol as GTCRNMicro."""

    def __init__(self, params, dtype=jnp.float32, tile: int = 128,
                 interpret: bool = False):
        from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicroConfig

        self.config = GTCRNMicroConfig()
        self.dtype = dtype
        self.tile = tile
        self.interpret = interpret
        self.weights = pack_weights(params, dtype)

    def init_state(self, batch: int, dtype=None) -> dict:
        assert batch % self.tile == 0, (batch, self.tile)
        dtype = dtype or self.dtype
        state = {
            name: jnp.zeros(
                (L,) + (BIG_PAD if shape == BIG else shape) + (batch,), dtype
            )
            for name, L, _d, shape in RING_DEFS
        }
        state["step"] = jnp.zeros((), jnp.int32)
        return state

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
    def step(self, params, state: dict, spec):
        del params
        assert spec.shape[0] % self.tile == 0, (spec.shape, self.tile)
        t = state["step"]
        spec_t = spec[:, :, 0, :].transpose(2, 1, 0).astype(self.dtype)

        taps_flat = []
        for name, L, d, _shape in RING_DEFS:
            ring = state[name]
            s0 = jax.lax.rem(t, L)
            s1 = jax.lax.rem(t + d, L)
            taps_flat.append(
                jax.lax.dynamic_index_in_dim(ring, s0, 0, keepdims=False)
            )
            taps_flat.append(
                jax.lax.dynamic_index_in_dim(ring, s1, 0, keepdims=False)
            )

        outs = _fused_grid_call(self.weights, spec_t, tuple(taps_flat),
                                self.tile, self.interpret)
        # optimization_barrier: XLA's fusion pass CHECK-fails when it tries
        # to fuse consumers into this multi-output custom call
        outs = jax.lax.optimization_barrier(outs)
        out_spec, frames = outs[0], outs[1:]

        new_state = {}
        for (name, L, _d, _shape), frame in zip(RING_DEFS, frames):
            new_state[name] = jax.lax.dynamic_update_slice_in_dim(
                state[name], frame[None], jax.lax.rem(t, L), axis=0
            )
        new_state["step"] = (t + 1) & 15
        return out_spec.transpose(2, 1, 0)[:, :, None, :], new_state
