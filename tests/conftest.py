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
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_repo_root, ".jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
