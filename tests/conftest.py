"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax import.

This is the TPU-native answer to "test multi-node without a cluster"
(SURVEY.md §4): every multi-device test runs against a fake 8-device CPU mesh
via ``--xla_force_host_platform_device_count``; the driver separately
dry-run-compiles the real multi-chip path via ``__graft_entry__.dryrun_multichip``.
"""

import os

# Force, don't setdefault: the host environment pins JAX_PLATFORMS to the
# real TPU tunnel AND pre-imports jax at interpreter startup (sitecustomize),
# so the env var alone is too late — use jax.config below as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep float32 matmuls exact on CPU for parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# Backend init is lazy, so this redirect works even though jax was already
# imported by sitecustomize; XLA_FLAGS is likewise read at backend init.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/gtcrn_micro_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
