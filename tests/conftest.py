"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4 item 3)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may point at TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# this XLA/CPU build defaults to low-precision matmuls; parity tests need f32
import jax  # noqa: E402

# the axon TPU plugin overrides the JAX_PLATFORMS env var; force via config
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache: reruns of the suite skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_leccr")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
