"""Dump the optimized HLO of the audio serving step and summarize copies.

Finds every copy / copy-start instruction in the compiled module, its shape
(bytes), and its operand's producer, so layout-mismatch or missed-aliasing
copies can be attributed to the JAX-level value that causes them.

Usage: python scripts/dump_hlo.py [batch] [--full > file]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gtcrn_micro_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from gtcrn_micro_tpu.dsp.stft import sqrt_hann_window  # noqa: E402
from gtcrn_micro_tpu.dsp.stream_dsp import DspState, make_audio_step  # noqa: E402
from gtcrn_micro_tpu.models.gtcrn_micro import GTCRNMicro  # noqa: E402

DTYPE_BYTES = {"bf16": 2, "f32": 4, "s32": 4, "s8": 1, "u8": 1, "pred": 1,
               "s16": 2, "u32": 4, "f16": 2}


def shape_bytes(shape: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    model = GTCRNMicro()
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16), model.init(jax.random.PRNGKey(0))
    )
    window = sqrt_hann_window(model.config.win_len)
    step = jax.jit(make_audio_step(model, window, dft="mxu"),
                   donate_argnums=(1, 2))
    dsp = DspState(
        in_buf=jnp.zeros((batch, model.config.hop_len), jnp.bfloat16),
        ola_buf=jnp.zeros((batch, model.config.hop_len), jnp.bfloat16),
    )
    state = model.init_state(batch, dtype=jnp.bfloat16)
    chunk = jnp.zeros((batch, model.config.hop_len), jnp.bfloat16)

    opts = {}
    for a in sys.argv:
        if a.startswith("--copt="):  # e.g. --copt=xla_tpu_scoped_vmem_limit_kib=16384
            k, _, v = a[len("--copt="):].partition("=")
            opts[k] = v
    compiled = step.lower(params, dsp, state, chunk).compile(
        compiler_options=opts or None)
    texts = compiled.as_text()
    if "--full" in sys.argv:
        print(texts)
        return

    copies = []
    for line in texts.splitlines():
        s = line.strip()
        m = re.match(r"%?([\w.-]+) = (\S+) copy\((.*)\)", s)
        if m:
            name, shape, operand = m.groups()
            copies.append((shape_bytes(shape), name, shape, operand[:90]))
        m = re.match(r"%?([\w.-]+) = \S+ copy-start\((.*)\)", s)
        if m:
            name, operand = m.groups()
            copies.append((-1, name, "copy-start", operand[:90]))
    copies.sort(reverse=True)
    total = sum(b for b, *_ in copies if b > 0)
    print(f"{len(copies)} copies, {total / 1e6:.1f} MB total per step")
    for b, name, shape, op in copies[:40]:
        print(f"  {b / 1e6:8.2f} MB  {name:40s} {shape:28s} <- {op}")

    # aliasing report: which outputs alias donated inputs
    for line in texts.splitlines():
        if "input_output_alias" in line:
            print(line.strip()[:400])
            break


if __name__ == "__main__":
    main()
