"""Device mesh + sharding helpers: the TPU-native distributed runtime.

Replaces the reference's NCCL/DDP machinery (utils/distributed_utils.py,
train.py:37-47) with single-controller JAX: build a ``jax.sharding.Mesh``,
annotate shardings, and let XLA compile the collectives onto ICI.  There is no
process-group bootstrap, no rank bookkeeping, no explicit all_reduce -- the
jit'd update step with a batch sharded over the ``data`` axis and replicated
params *is* DDP, with the gradient psum fused into the backward pass by SPMD
partitioning.

Axes:
- ``data``   -- batch / stream data parallelism (the only axis this model
                family needs at 19k params; reference SURVEY.md §2.9)
- multi-host: ``jax.distributed.initialize()`` before calling ``make_mesh``
  and these helpers work unchanged over DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def data_parallel_shardings(mesh: Mesh, axis: str = "data"):
    """(batch_sharding, replicated_sharding) for the mesh."""
    return NamedSharding(mesh, P(axis)), NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host numpy batch onto the mesh, sharded along dim 0."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch_multiprocess(mesh: Mesh, local_batch, axis: str = "data"):
    """Assemble a global sharded batch from per-process local shards.

    Multi-controller counterpart of :func:`shard_batch` (the reference's
    DistributedSampler role, train.py:56-60): every process passes only ITS
    rows; the returned global jax.Arrays are sharded over ``axis`` across
    all processes' devices.  Works single-process too (then it equals
    ``shard_batch``).
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )


def replicate_multiprocess(mesh: Mesh, tree):
    """Replicate host pytrees across a multi-process mesh.

    Each process must hold an identical copy (e.g. params from a
    deterministic seed or a restored checkpoint); this lifts them into
    global fully-replicated jax.Arrays.
    """
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        tree,
    )


def make_sharded_serving_step(model, mesh: Mesh, axis: str = "data"):
    """jit'd streaming step with the stream batch sharded over the mesh.

    Serving-side scaling (SURVEY.md §2.9: the TPU-native axis is batching
    independent streams): params replicated, every state ring and the
    spec/output sharded along the batch (first) dim; XLA compiles with NO
    collectives in the steady state -- streams are independent, so multi-chip
    serving is embarrassingly parallel over ICI-attached chips.

    Returns (step_fn, place_state, place_spec).
    """
    s_batch = NamedSharding(mesh, P(axis))
    s_rep = NamedSharding(mesh, P())

    def state_sharding(state):
        return {
            k: (s_rep if k == "step" else s_batch) for k in state
        }

    def place_state(state):
        return {
            k: jax.device_put(v, s_rep if k == "step" else s_batch)
            for k, v in state.items()
        }

    def place_spec(spec):
        return jax.device_put(spec, s_batch)

    def step(params, state, spec):
        return model.step(params, state, spec)

    # shardings resolved lazily at the first call (state keys are
    # data-dependent), then the PjitFunction is cached -- re-wrapping per
    # step would pay jit dispatch setup in the serving hot loop
    cache: dict = {}

    def jitted(params, state, spec):
        if "fn" not in cache:
            cache["fn"] = jax.jit(
                step,
                in_shardings=(s_rep, state_sharding(state), s_batch),
                out_shardings=(s_batch, state_sharding(state)),
                donate_argnums=(1,),
            )
        return cache["fn"](params, state, spec)

    return jitted, place_state, place_spec


def make_sharded_audio_serving_step(model, mesh: Mesh, axis: str = "data",
                                    dft: str = "mxu"):
    """Audio-in -> audio-out sharded serving step (dsp/stream_dsp.py).

    Same embarrassingly-parallel layout as :func:`make_sharded_serving_step`
    with the online STFT/iSTFT state (in_buf/ola_buf, batch-major) sharded
    along the stream axis too; the DSP is pointwise per stream, so the
    compiled program still contains no steady-state collectives.

    Returns (step_fn, place_model_state, place_dsp_state, place_chunk).
    """
    from gtcrn_micro_tpu.dsp.stft import sqrt_hann_window
    from gtcrn_micro_tpu.dsp.stream_dsp import make_audio_step

    s_batch = NamedSharding(mesh, P(axis))
    s_rep = NamedSharding(mesh, P())
    window = sqrt_hann_window(model.config.win_len)
    step = make_audio_step(model, window, dft=dft)

    def state_sharding(state):
        return {k: (s_rep if k == "step" else s_batch) for k in state}

    def place_model_state(state):
        return {
            k: jax.device_put(v, s_rep if k == "step" else s_batch)
            for k, v in state.items()
        }

    def place_dsp_state(dsp):
        return jax.tree.map(lambda v: jax.device_put(v, s_batch), dsp)

    def place_chunk(chunk):
        return jax.device_put(chunk, s_batch)

    cache: dict = {}

    def jitted(params, dsp, state, chunk):
        if "fn" not in cache:
            cache["fn"] = jax.jit(
                step,
                in_shardings=(s_rep, s_batch, state_sharding(state),
                              s_batch),
                out_shardings=(s_batch, s_batch, state_sharding(state)),
                donate_argnums=(1, 2),
            )
        return cache["fn"](params, dsp, state, chunk)

    return jitted, place_model_state, place_dsp_state, place_chunk
