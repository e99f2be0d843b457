"""Cohort serving engine: phase-staggered batched streaming on one chip.

PERF.md r3 finding: the per-stream cost of the jit'd streaming step is
batch-dependent (fixed per-op dispatch cost below ~6k streams, degrading
layouts above ~12k), so the throughput-optimal serving shape is K
independent *cohorts* of the sweet-spot batch size, each stepped once per
16 ms frame interval with staggered phases -- not one monolithic batch.
This module is the production-shaped API for that schedule (the TPU-native
analog of the reference's one-stream-per-device TFLM serving loop,
esp32_s3/main/main.cc): streams are admitted into cohort slots, fed one
frame per interval, and stepped cohort-by-cohort.

Latency contract: a frame is enhanced within ``step_time`` of its cohort's
step, and a stream admitted with arbitrary phase waits at most
``16ms / n_cohorts`` for the nearest cohort boundary (constant per stream:
16 kHz frame cadence never drifts against the cohort clock).

    engine = CohortServer(model, params, batch=8192, n_cohorts=9)
    sid = engine.admit(cohort=engine.next_cohort())
    out = engine.step(cohort_idx, specs)      # (B, F, 1, 2) -> same

The scheduling loop itself (who calls ``step`` when) belongs to the host
server; ``planned_schedule`` documents the phase each cohort owns.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

FRAME_S = 0.016
LATENCY_BUDGET_S = 0.010


@dataclasses.dataclass
class CohortPlan:
    """A validated (batch, n_cohorts) serving plan.

    ``chunk_hops`` (T) > 1 is *throughput mode*: each step consumes T hops
    (a ``256*T``-sample chunk) per stream, so a cohort is stepped once per
    ``T * 16 ms`` interval.  Buffering T hops before stepping adds
    ``(T-1) * 16 ms`` to end-to-end latency -- throughput plans trade the
    10 ms interactive budget for more streams per chip (PERF.md r3/r4:
    chunking amortizes per-op dispatch, worth ~10-20% at large batch).
    """

    batch: int
    n_cohorts: int
    step_time_s: float
    chunk_hops: int = 1

    @property
    def streams(self) -> int:
        return self.batch * self.n_cohorts

    @property
    def interval_s(self) -> float:
        """Wall-clock between two steps of the same cohort."""
        return self.chunk_hops * FRAME_S

    @property
    def keep_up_ok(self) -> bool:
        return self.n_cohorts * self.step_time_s <= self.interval_s

    @property
    def worst_latency_s(self) -> float:
        """Arrival of a hop -> its enhanced samples: chunk buffering
        (first hop of a chunk waits for the rest), worst-case phase offset
        to the cohort's slot, then the step itself."""
        if self.n_cohorts == 0:
            return float("inf")
        return ((self.chunk_hops - 1) * FRAME_S
                + self.interval_s / self.n_cohorts + self.step_time_s)

    @property
    def realtime_ok(self) -> bool:
        return self.keep_up_ok and self.worst_latency_s <= LATENCY_BUDGET_S

    def phase_of(self, cohort: int) -> float:
        """Start offset (seconds) of a cohort's step inside each interval."""
        return (cohort % self.n_cohorts) * self.interval_s / self.n_cohorts


def plan_cohorts(step_time_s: float, batch: int,
                 budget_s: float = LATENCY_BUDGET_S,
                 chunk_hops: int = 1) -> CohortPlan:
    """Largest keep-up plan within a latency budget for a measured per-step
    time.  ``chunk_hops`` > 1 plans throughput mode (see CohortPlan); pass
    the correspondingly relaxed ``budget_s``."""
    k = 0
    for cand in range(1, 65):
        plan = CohortPlan(batch=batch, n_cohorts=cand,
                          step_time_s=step_time_s, chunk_hops=chunk_hops)
        if plan.keep_up_ok and plan.worst_latency_s <= budget_s:
            k = cand
    return CohortPlan(batch=batch, n_cohorts=k, step_time_s=step_time_s,
                      chunk_hops=chunk_hops)


class CohortServer:
    """K independent ring-state cohorts over ONE jit'd step executable.

    All cohorts share the compiled step (same shapes) and the replicated
    params; each owns its state pytree.  ``step(i, spec)`` advances cohort
    ``i`` by one frame for all its streams; states are donated, so the
    rings update in place.
    """

    def __init__(self, model, params, batch: int, n_cohorts: int,
                 dtype=jnp.bfloat16, mode: str = "spec", dft: str = "mxu",
                 mesh=None, state_opts: dict | None = None,
                 chunk_hops: int = 1):
        """``mesh``: a ``jax.sharding.Mesh`` scales the same schedule across
        chips -- every cohort's ``batch`` streams (and its DSP state) are
        sharded along the mesh's data axis, params replicated, so one
        controller serves ``n_cohorts * batch`` streams over the whole mesh
        with no steady-state collectives (the per-stream pipeline is
        embarrassingly parallel; parallel/mesh.py).  Per-chip capacity
        planning is unchanged: pick (batch_per_chip, K) with
        :func:`plan_cohorts`, then ``batch = batch_per_chip * n_chips``.

        ``state_opts`` forwards to ``model.init_state`` (e.g.
        ``{"l2_psum": True}`` for the partial-sum L==2 cache layout,
        PERF.md r4); the step infers the layout from the state itself,
        so every serving mode works unchanged.

        ``chunk_hops`` (T): throughput mode -- each ``step`` call consumes
        T hops per stream ((batch, 256*T) samples in audio mode, (batch,
        F, T, 2) spectra in spec mode) and the cohort is stepped once per
        ``T * 16 ms`` interval.  The ring state layout is T-independent
        (nn/core.py T-chunk slab reads/writes), so T is purely a schedule
        choice; it must be a power of two <= 16 (the ring alignment
        contract).  See :class:`CohortPlan` for the latency trade."""
        if mode not in ("spec", "audio"):
            raise ValueError(f"mode must be 'spec' or 'audio', got {mode!r}")
        if chunk_hops not in (1, 2, 4, 8, 16):
            raise ValueError(
                f"chunk_hops must be a power of two <= 16, got {chunk_hops}")
        self.model = model
        self.batch = batch
        self.n_cohorts = n_cohorts
        self.dtype = dtype
        self.mode = mode
        self.mesh = mesh
        self.chunk_hops = chunk_hops
        self.params = jax.tree.map(lambda v: v.astype(dtype), params)
        place_state = place_dsp = place_chunk = lambda x: x  # noqa: E731
        if mesh is not None and mode == "audio":
            from gtcrn_micro_tpu.parallel.mesh import (
                make_sharded_audio_serving_step,
                replicate,
            )

            self._step, place_state, place_dsp, place_chunk = (
                make_sharded_audio_serving_step(model, mesh, dft=dft)
            )
            self.params = replicate(mesh, self.params)
        elif mesh is not None:
            from gtcrn_micro_tpu.parallel.mesh import (
                make_sharded_serving_step,
                replicate,
            )

            self._step, place_state, place_chunk = (
                make_sharded_serving_step(model, mesh)
            )
            self.params = replicate(mesh, self.params)
        elif mode == "audio":
            # audio-in -> audio-out: online STFT/iSTFT fused into the step
            # (dsp/stream_dsp.py; MXU-DFT costs ~2% over the spec step)
            from gtcrn_micro_tpu.dsp.stft import sqrt_hann_window
            from gtcrn_micro_tpu.dsp.stream_dsp import make_audio_step

            window = sqrt_hann_window(model.config.win_len)
            self._step = jax.jit(
                make_audio_step(model, window, dft=dft),
                donate_argnums=(1, 2),
            )
        else:
            self._step = jax.jit(model.step, donate_argnums=(1,))
        self._place_chunk = place_chunk
        if mode == "audio":
            from gtcrn_micro_tpu.dsp.stream_dsp import DspState

            self._dsp = [
                place_dsp(DspState(
                    in_buf=jnp.zeros((batch, model.config.hop_len), dtype),
                    ola_buf=jnp.zeros((batch, model.config.hop_len), dtype),
                ))
                for _ in range(n_cohorts)
            ]
        self._states = [
            place_state(model.init_state(batch, dtype=dtype,
                                         **(state_opts or {})))
            for _ in range(n_cohorts)
        ]
        self._frames = [0] * n_cohorts
        # clean free slots (rings are zeros) and recycled free slots (rings
        # still carry a previous stream's audio history).  admit() prefers
        # clean slots and auto-resets a recycled one before handing it out
        # (r3 verdict: handing out a dirty slot leaks the prior stream's
        # state into the new stream -- a correctness AND privacy bug).
        self._free: list[list[int]] = [
            list(range(batch)) for _ in range(n_cohorts)
        ]
        self._recycled: list[list[int]] = [[] for _ in range(n_cohorts)]

    # -- admission ---------------------------------------------------------

    def next_cohort(self) -> int:
        """Cohort with the most free slots (load balancing)."""
        return max(
            range(self.n_cohorts),
            key=lambda i: len(self._free[i]) + len(self._recycled[i]),
        )

    def admit(self, cohort: int) -> int:
        """Claim a stream slot in ``cohort``; returns the slot id with its
        ring state guaranteed zero (a fresh stream's silence history).
        Clean slots are handed out first at no device cost; once the cohort
        has churned through every slot, recycled slots are auto-reset here
        (one fused ``at[slot].set(0)`` over the cohort's state pytree)."""
        if self._free[cohort]:
            return self._free[cohort].pop()
        if self._recycled[cohort]:
            slot = self._recycled[cohort].pop()
            self.reset_slot(cohort, slot)
            return slot
        raise RuntimeError(f"cohort {cohort} full")

    def release(self, cohort: int, slot: int) -> None:
        """Return a slot to the recycled pool; its rings are re-zeroed
        lazily when it is next admitted (zeroing on release would pay the
        reset even for slots never reused)."""
        self._recycled[cohort].append(slot)

    def reset_slot(self, cohort: int, slot: int) -> None:
        """Zero one stream's rings (idempotent).  A slot waiting in the
        recycled pool moves back to the clean pool."""
        if slot in self._recycled[cohort]:
            self._recycled[cohort].remove(slot)
            self._free[cohort].append(slot)
        st = self._states[cohort]
        self._states[cohort] = {
            k: (v if k == "step" else v.at[slot].set(0))
            for k, v in st.items()
        }
        if self.mode == "audio":
            import dataclasses

            d = self._dsp[cohort]
            self._dsp[cohort] = dataclasses.replace(
                d,
                in_buf=d.in_buf.at[slot].set(0),
                ola_buf=d.ola_buf.at[slot].set(0),
            )

    # -- serving -----------------------------------------------------------

    def step(self, cohort: int, frame: jax.Array) -> jax.Array:
        """Advance ``cohort`` by ``chunk_hops`` frames.

        mode "spec":  frame is (batch, F, T, 2) spectra -> enhanced spectra.
        mode "audio": frame is (batch, T*hop_len) samples -> enhanced
        samples one hop behind (dsp/stream_dsp.py latency contract; the
        first emitted hop per stream is the discarded center-trim region).
        """
        frame = self._place_chunk(frame.astype(self.dtype))
        if self.mode == "audio":
            out, self._dsp[cohort], self._states[cohort] = self._step(
                self.params, self._dsp[cohort], self._states[cohort], frame,
            )
        else:
            out, self._states[cohort] = self._step(
                self.params, self._states[cohort], frame
            )
        self._frames[cohort] += self.chunk_hops
        return out

    def round_robin(self, specs: list[jax.Array]) -> list[jax.Array]:
        """One full interval: step every cohort once, in phase order."""
        assert len(specs) == self.n_cohorts
        return [self.step(i, s) for i, s in enumerate(specs)]

    @property
    def frames_served(self) -> int:
        return sum(self._frames)


def main(args=None) -> None:
    """Demo CLI: enhance a wav through the audio-mode cohort server.

    Drives the production serving shape end to end on real audio: admit a
    stream into a cohort, feed one hop chunk per (virtual) frame interval
    in the cohort's phase slot, collect the enhanced chunks (one hop
    behind, dsp/stream_dsp.py latency contract) and report SNR vs the
    offline fp32 pipeline.
    """
    import argparse

    import numpy as np

    parser = argparse.ArgumentParser(description="cohort serving demo")
    parser.add_argument("--wav", default=(
        "/root/reference/gtcrn_micro/examples/gtcrn_micro/noisy1.wav"))
    parser.add_argument("--out", default="")
    parser.add_argument("--checkpoint", default=(
        "/root/reference/gtcrn_micro/ckpts/best_model_dns3.tar"))
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--cohorts", type=int, default=2)
    parser.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ns = parser.parse_args(args)

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from gtcrn_micro_tpu.dsp.stft import istft, sqrt_hann_window, stft
    from gtcrn_micro_tpu.eval.infer import load_params
    from gtcrn_micro_tpu.io.wav import read_wav, write_wav
    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro

    model = GTCRNMicro()
    params = load_params(ns.checkpoint)
    dtype = jnp.bfloat16 if ns.dtype == "bf16" else jnp.float32
    srv = CohortServer(model, params, batch=ns.batch, n_cohorts=ns.cohorts,
                       dtype=dtype, mode="audio")

    wav, fs = read_wav(ns.wav)
    if wav.ndim > 1:
        wav = wav[:, 0]
    hop = model.config.hop_len
    hops = len(wav) // hop
    wav = wav[: hops * hop].astype("float32")

    cohort = srv.next_cohort()
    slot = srv.admit(cohort)
    zeros = jnp.zeros((ns.batch, hop), dtype)
    feed = np.zeros((ns.batch, hop), np.float32)

    outs = []
    for t in range(hops + 1):  # +1 step flushes the one-hop OLA tail
        if t < hops:
            feed[slot] = wav[hop * t : hop * (t + 1)]
        else:
            feed[slot] = 0.0
        for c in range(srv.n_cohorts):  # phase-ordered interval
            got = srv.step(c, jnp.asarray(feed) if c == cohort else zeros)
            if c == cohort:
                outs.append(np.asarray(got, np.float32)[slot])
    enh = np.concatenate(outs)[hop:]  # drop the center-trim chunk

    spec = stft(jnp.asarray(wav)[None], sqrt_hann_window(model.config.win_len))
    off = np.asarray(istft(model.apply_jit(params, spec),
                           sqrt_hann_window(model.config.win_len),
                           length=len(wav)))[0]
    n = min(len(enh), len(off))

    def snr(a, b):
        e = a - b
        return 10 * np.log10(max(float((b ** 2).sum()), 1e-20)
                             / max(float((e ** 2).sum()), 1e-20))

    # the first ~61 frames carry the stream-open transient (offline frame 0
    # is reflect-padded; a live stream has no future sample to reflect) --
    # steady state is the serving-quality number
    ss = 64 * hop
    print(f"served {hops} frames through cohort {cohort} slot {slot} "
          f"({srv.n_cohorts} cohorts x {srv.batch} slots, {ns.dtype}); "
          f"SNR vs offline fp32: {snr(enh[:n], off[:n]):.1f} dB whole wav, "
          f"{snr(enh[ss:n], off[ss:n]):.1f} dB steady-state")
    if ns.out:
        write_wav(ns.out, enh[:n], fs)
        print(f"wrote {ns.out}")


if __name__ == "__main__":
    main()
