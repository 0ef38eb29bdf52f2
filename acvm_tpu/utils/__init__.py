from .bench_circuits import (
    build_gadget_circuit,
    build_wide_arith_circuit,
    columnar_instance,
    gadget_inputs,
    gadget_inputs_columnar,
    random_inputs,
)
from .logging import get_logger, init_log_level

__all__ = [
    "build_gadget_circuit",
    "build_wide_arith_circuit",
    "columnar_instance",
    "gadget_inputs",
    "gadget_inputs_columnar",
    "random_inputs",
    "get_logger",
    "init_log_level",
]
