"""Model complexity: parameter count + MACs from the jaxpr.

The reference uses ptflops (gtcrn_micro.py:539-544, published 19.01k params /
45.92 MMACs per second of audio, gtcrn_micro/README.md:25-26).  Here the
MAC count is derived from the traced jaxpr -- counts dot_general and
conv_general_dilated contractions exactly, so it covers any model in the
registry without per-layer bookkeeping.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def param_count(params, trainable_only: bool = True) -> int:
    total = 0
    for path, v in jax.tree_util.tree_leaves_with_path(params):
        p = jax.tree_util.keystr(path)
        if trainable_only and ("erb" in p or "running" in p):
            continue
        total += int(np.prod(v.shape))
    return total


def _dot_macs(eqn) -> int:
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    dims = eqn.params["dimension_numbers"]
    (lc, _rc), (lb, _rb) = dims
    batch = math.prod(a.shape[i] for i in lb)
    contract = math.prod(a.shape[i] for i in lc)
    m = math.prod(
        a.shape[i] for i in range(len(a.shape)) if i not in lc and i not in lb
    )
    n = math.prod(
        b.shape[i]
        for i in range(len(b.shape))
        if i not in dims[0][1] and i not in dims[1][1]
    )
    return batch * m * n * contract


def _conv_macs(eqn) -> int:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    groups = eqn.params["feature_group_count"]
    dn = eqn.params["dimension_numbers"]
    # rhs layout: receptive field size x in-channels-per-group
    kernel_spatial = math.prod(
        rhs.shape[i] for i in dn.rhs_spec[2:]
    )
    cin_per_group = rhs.shape[dn.rhs_spec[1]]
    del groups
    return int(np.prod(out.shape)) * kernel_spatial * cin_per_group


def macs(fn, *example_args) -> int:
    """Total multiply-accumulates of ``fn(*example_args)`` (jaxpr walk)."""
    jaxpr = jax.make_jaxpr(fn)(*example_args)

    def walk(jx) -> int:
        total = 0
        for eqn in jx.eqns:
            if eqn.primitive.name == "dot_general":
                total += _dot_macs(eqn)
            elif eqn.primitive.name == "conv_general_dilated":
                total += _conv_macs(eqn)
            for sub in jax.core.jaxprs_in_params(eqn.params):
                total += walk(sub)
        return total

    return walk(jaxpr.jaxpr)


def model_complexity(model, seconds: float = 1.0, fs: int = 16000):
    """(params, MACs per ``seconds`` of audio) -- ptflops-comparable."""
    params = model.init(jax.random.PRNGKey(0))
    frames = int(seconds * fs) // model.config.hop_len + 1
    spec = jnp.zeros((1, model.config.n_freqs, frames, 2), jnp.float32)
    return param_count(params), macs(lambda p, s: model.apply(p, s), params, spec)


if __name__ == "__main__":
    from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro

    n_params, n_macs = model_complexity(GTCRNMicro())
    print(f"params: {n_params / 1e3:.2f} k (published 19.01 k)")
    print(f"MACs/s audio: {n_macs / 1e6:.2f} M (published 45.92 M)")
