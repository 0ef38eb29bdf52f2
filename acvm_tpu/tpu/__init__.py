"""TPU-native batched execution engine: host planner + device solver.

See `acvm_tpu.tpu.planner` for the levelizing compiler and
`acvm_tpu.tpu.batch_solver` for the batched executor.
"""

import os

# Per-op dispatch in this environment compiles slowly; persist compiled
# executables so repeated runs (tests, benches) hit the cache.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

from .planner import Plan, PlanError, plan_circuit  # noqa: E402
from .batch_solver import BatchResult, BatchSolver  # noqa: E402

__all__ = [
    "Plan",
    "PlanError",
    "plan_circuit",
    "BatchSolver",
    "BatchResult",
]
