import os
import sys

# Tests run on whatever platform the environment provides (the single-chip TPU
# tunnel here — real-hardware validation).  Multi-chip mesh tests spawn
# subprocesses that switch to a virtual 8-device CPU platform via
# jax.config.update (the ambient sitecustomize registers the TPU plugin before
# conftest runs, so env vars alone cannot override the platform).
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo_root)

# Per-op eager dispatch is very slow in this environment; tests jit everything
# and rely on the persistent compilation cache to amortize compiles across runs.
# The ambient sitecustomize imports jax BEFORE conftest runs, so env vars are
# too late — the cache must be enabled through jax.config (verified: env-only
# setup never wrote a single cache entry).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_repo_root, ".jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)

# Escape hatch for iterating while the TPU tunnel is unavailable:
# ACVM_TPU_TEST_PLATFORM=cpu forces the CPU backend (env vars alone cannot,
# because sitecustomize registers the TPU plugin before conftest runs).
_platform = os.environ.get("ACVM_TPU_TEST_PLATFORM")
if _platform:
    jax.config.update("jax_platforms", _platform)
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
)
