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
