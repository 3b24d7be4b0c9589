"""Test config: run all tests on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests exercise
`jax.sharding.Mesh` semantics on host-platform virtual devices.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config route
# does force the host platform (tests must not depend on the tunneled chip).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# NO persistent compilation cache for the CPU suite: this jax/XLA build's
# CPU-executable (de)serialization is unstable on this host — observed
# SIGSEGV inside compilation_cache.put_executable_and_time mid-suite with
# a fresh cache, and cpu_aot_loader ISA-feature-mismatch warnings +
# SIGSEGV when loading entries written by a different CI host. Compiles
# are re-done each run; crashing beats caching.
