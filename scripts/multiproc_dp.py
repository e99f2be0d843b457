"""Real multi-process data-parallel execution of the training step.

The reference actually crosses a process boundary when training: mp.spawn +
``dist.init_process_group("nccl")`` (reference train.py:37-47,
utils/distributed_utils.py:9-37).  The TPU-native counterpart is
multi-controller JAX: every process calls ``jax.distributed.initialize()``,
builds the SAME global mesh, feeds its local batch shard, and runs the
identical jit'd train step; XLA compiles the gradient all-reduce into the
backward pass (Gloo on the CPU backend here, ICI/DCN on real pods).

Usage (parent orchestrates, compares against single-process numerics):

    python scripts/multiproc_dp.py [--nproc 2] [--steps 2]

Exit 0 iff every per-step loss and the final parameter pytree from the
multi-process run match the single-process run (atol 2e-5 -- CPU Gloo
all-reduce vs single-device reduction ordering).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
PORT = 12987
SEED = 7
GLOBAL_BATCH = 4
N_SAMPLES = 4096


def _force_cpu(n_local: int | None = None):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the test harness exports --xla_force_host_platform_device_count=8;
    # each process here must contribute exactly its own devices
    os.environ["XLA_FLAGS"] = " ".join(
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if n_local is not None:
        jax.config.update("jax_num_cpu_devices", n_local)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gtcrn_micro_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    return jax


def _make_batches(steps: int):
    import numpy as np

    rng = np.random.default_rng(SEED)
    out = []
    for _ in range(steps):
        clean = rng.standard_normal((GLOBAL_BATCH, N_SAMPLES)).astype(np.float32) * 0.05
        noise = rng.standard_normal((GLOBAL_BATCH, N_SAMPLES)).astype(np.float32) * 0.02
        out.append((clean + noise, clean))
    return out


def _build():
    import jax

    from gtcrn_micro_tpu.models import GTCRNMicro
    from gtcrn_micro_tpu.train.scheduler import WarmupCosineConfig
    from gtcrn_micro_tpu.train.trainer import make_optimizer, make_train_step

    model = GTCRNMicro()
    params = model.init(jax.random.PRNGKey(0))
    sched = WarmupCosineConfig(warmup_steps=5, decay_until_step=100,
                               max_lr=1e-3)
    opt = make_optimizer(params, sched)
    return model, params, opt, jax.jit(make_train_step(model, opt))


def run_worker(pid: int, nproc: int, steps: int, out_path: str):
    jax = _force_cpu(n_local=1)
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    import numpy as np

    from gtcrn_micro_tpu.parallel.mesh import (
        make_mesh,
        replicate_multiprocess,
        shard_batch_multiprocess,
    )

    model, params, opt, step_fn = _build()
    mesh = make_mesh()
    assert mesh.devices.size == nproc
    params = replicate_multiprocess(mesh, jax.tree.map(np.asarray, params))
    opt_state = replicate_multiprocess(
        mesh, jax.tree.map(np.asarray, opt.init(model.init(jax.random.PRNGKey(0)))))

    per = GLOBAL_BATCH // nproc
    losses = []
    for noisy, clean in _make_batches(steps):
        lo, hi = pid * per, (pid + 1) * per  # this process's rows
        noisy_s, clean_s = shard_batch_multiprocess(mesh, (noisy[lo:hi], clean[lo:hi]))
        params, opt_state, loss = step_fn(params, opt_state, noisy_s, clean_s)
        losses.append(float(loss))  # scalar loss is replicated -> addressable

    # parameter checksum comparable across runs (order-stable tree leaves;
    # params are replicated, so the local shard of each leaf IS the full
    # array on every process)
    flat = jax.tree.leaves(params)
    checksum = float(sum(np.abs(np.asarray(x.addressable_data(0))).sum()
                         for x in flat))
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"losses": losses, "checksum": checksum}, f)
    jax.distributed.shutdown()


def run_single(steps: int):
    jax = _force_cpu()
    import numpy as np

    model, params, opt, step_fn = _build()
    opt_state = opt.init(params)
    losses = []
    for noisy, clean in _make_batches(steps):
        params, opt_state, loss = step_fn(params, opt_state, noisy, clean)
        losses.append(float(loss))
    checksum = float(sum(np.abs(np.asarray(x)).sum()
                         for x in jax.tree.leaves(params)))
    return losses, checksum


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--worker", type=int, default=None, help="internal")
    ap.add_argument("--out", default="/tmp/multiproc_dp_result.json")
    args = ap.parse_args()

    if args.worker is not None:
        run_worker(args.worker, args.nproc, args.steps, args.out)
        return

    if os.path.exists(args.out):
        os.remove(args.out)
    env = {**os.environ, "PYTHONPATH": REPO}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(p),
             "--nproc", str(args.nproc), "--steps", str(args.steps),
             "--out", args.out],
            env=env, cwd=REPO)
        for p in range(args.nproc)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        print(f"FAIL: worker exit codes {rcs}")
        sys.exit(1)
    with open(args.out) as f:
        multi = json.load(f)

    losses1, checksum1 = run_single(args.steps)
    import numpy as np

    print(f"multi-process ({args.nproc} procs) losses: {multi['losses']}")
    print(f"single-process            losses: {losses1}")
    np.testing.assert_allclose(multi["losses"], losses1, rtol=1e-5)
    np.testing.assert_allclose(multi["checksum"], checksum1, rtol=1e-6)
    print(f"OK: {args.nproc}-process jax.distributed train step == "
          f"single-process (checksum {checksum1:.6f})")


if __name__ == "__main__":
    main()
