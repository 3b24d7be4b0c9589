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

# Persistent compilation cache: the suite is compile-dominated on the
# 2-CPU / 8-virtual-device CI host; repeat runs hit the cache.
# The dir is HOST-FINGERPRINTED: XLA:CPU entries are AOT code specialized
# to the compiling machine's ISA features; loading entries produced on a
# different CI host SIGSEGVs (observed: cpu_aot_loader feature-mismatch
# warnings followed by a segfault mid-suite). A cache from another host
# must never be picked up.
import hashlib
import pathlib
import platform


def _host_cache_dir() -> pathlib.Path:
    tag = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    tag += hashlib.sha1(line.encode()).hexdigest()[:12]
                    break
    except OSError:
        pass
    return (pathlib.Path(__file__).resolve().parent.parent
            / f".jax_cache_{tag}")


_cache = _host_cache_dir()
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
