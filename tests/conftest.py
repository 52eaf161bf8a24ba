"""Test configuration: force an 8-virtual-device CPU platform.

The harness environment pre-imports jax and pins JAX_PLATFORMS=axon (real
TPU) via sitecustomize, so env vars alone don't switch platforms — the
config update below does. Tests run on CPU for determinism and because the
single TPU tunnel cannot be shared by concurrent processes; sharding tests
use the 8 virtual CPU devices. The driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compilation cache: the suite recompiles large fused programs;
# caching across runs cuts minutes per session
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402  (pre-imported by sitecustomize anyway)

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # backend already initialized (e.g. single-test debugging)
    pass

# sitecustomize pre-imports jax BEFORE this file runs, so the cache env vars
# above never reach jax's import-time config read — set the config directly
# (without this the suite recompiled every large program every run)
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
