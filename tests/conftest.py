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
# NO persistent compilation cache on CPU: XLA:CPU serializes AOT machine
# code whose feature set can exceed the executing host's (cpu_aot_loader
# E-logs), and reloading such entries intermittently SIGILLs/aborts
# mid-test.  CPU compiles of the tiny test models are cheap.
