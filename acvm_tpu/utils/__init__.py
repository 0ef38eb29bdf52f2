from .bench_circuits import build_wide_arith_circuit, random_inputs
from .logging import get_logger, init_log_level

__all__ = [
    "build_wide_arith_circuit",
    "random_inputs",
    "get_logger",
    "init_log_level",
]
