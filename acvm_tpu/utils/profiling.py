"""Observability: JAX profiler traces + solver throughput counters.

The reference's only observability primitive is opcode-location provenance
(SURVEY.md section 5); a production TPU engine needs actual performance
telemetry.  Two tools:

* :func:`trace` — context manager around ``jax.profiler`` writing a TensorBoard
  trace directory (set ``ACVM_TPU_TRACE_DIR`` or pass a path).
* :class:`SolveStats` — wall-clock + throughput accounting for batched solves;
  `BatchSolver.solve(..., stats=...)` fills one in when provided.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a device profile around the enclosed block.

    Usage::

        with profiling.trace("/tmp/acvm-trace"):
            solver.solve(batch)
    """
    import jax

    log_dir = log_dir or os.environ.get("ACVM_TPU_TRACE_DIR")
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class SolveStats:
    batch: int = 0
    total_ops: int = 0
    segment_seconds: List[float] = field(default_factory=list)
    host_stage_seconds: List[float] = field(default_factory=list)
    pack_seconds: float = 0.0

    @property
    def device_seconds(self) -> float:
        return sum(self.segment_seconds)

    @property
    def total_seconds(self) -> float:
        return self.device_seconds + sum(self.host_stage_seconds) + self.pack_seconds

    def ops_per_second(self) -> float:
        t = self.total_seconds
        return (self.batch * self.total_ops / t) if t > 0 else 0.0

    def summary(self) -> Dict[str, float]:
        return {
            "batch": self.batch,
            "total_ops": self.total_ops,
            "device_seconds": round(self.device_seconds, 6),
            "host_seconds": round(sum(self.host_stage_seconds), 6),
            "pack_seconds": round(self.pack_seconds, 6),
            "op_solves_per_second": round(self.ops_per_second(), 2),
        }


class Timer:
    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False
