#!/usr/bin/env python
"""Measure raw VPU elementwise throughput on the attached TPU.

The montmul roofline in BASELINE.md assumes a peak elementwise int32 rate.
This microbenchmark measures the *achieved* per-op rates for the instruction
mix the CIOS Montgomery kernel actually issues (u32 add / u32 mul / u32
shift / u32 and / f32 ops), using a Pallas kernel holding S independent
accumulator streams in registers so the measurement is throughput-bound,
not latency-bound.

Usage: python benchmarks/vpu_rates.py            # all ops
       python benchmarks/vpu_rates.py add mul    # a subset

Prints one JSON line per op: {"op": ..., "lane_ops_per_sec": ...}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 8  # independent accumulator streams (hide ALU latency)
K = 256  # unrolled op rounds per stream per grid step
LANES = 8 * 128  # one vreg of int32


import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from acvm_tpu.utils.benchtime import measure_rtt, sync as _sync, timed_rate


OPS = {
    # u32 ops on (8, 128) vregs; c is data-dependent so nothing folds.
    "add_u32": lambda a, c: a + c,
    "mul_u32": lambda a, c: a * c,
    "mullo16_u32": lambda a, c: (a & 0xFFFF) * c,  # and+mul pair
    "shr_u32": lambda a, c: (a >> 7) + c,  # shift+add pair
    "and_u32": lambda a, c: (a & c) + c,  # and+add pair
    "add_f32": lambda a, c: a + c,
    "mul_f32": lambda a, c: a * c,
    "fma_f32": lambda a, c: a * c + c,
    # one CIOS limb step: mul, lo-extract, hi-extract, two accumulate adds
    "cios_step": lambda a, c: (lambda p: a + (p & 0xFFFF) + (p >> 16))(a * c),
    # wider mixed round to probe issue width
    "mix8": lambda a, c: ((a * c) & 0xFFFF) + ((a * a) >> 16) + (a & c) + c,
}
F32 = {"add_f32", "mul_f32", "fma_f32"}
# ops actually issued per "round" of the lambda above
OPS_PER_ROUND = {
    "add_u32": 1,
    "mul_u32": 1,
    "mullo16_u32": 2,
    "shr_u32": 2,
    "and_u32": 2,
    "add_f32": 1,
    "mul_f32": 1,
    "fma_f32": 2,
    "cios_step": 5,
    "mix8": 8,
}


def make_bench(op_name: str, grid: int):
    fn = OPS[op_name]
    dtype = jnp.float32 if op_name in F32 else jnp.uint32

    def kernel(x_ref, o_ref):
        accs = [x_ref[s] for s in range(S)]
        c = x_ref[S]
        for _ in range(K):
            for s in range(S):
                accs[s] = fn(accs[s], c)
        acc = accs[0]
        for s in range(1, S):
            acc = acc + accs[s]
        o_ref[0] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((S + 1, 8, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    return run, dtype


def measure(op_name: str, grid: int = 4096, iters: int = 64) -> float:
    # RTT probe shared with bench.py (acvm_tpu.utils.benchtime): one
    # implementation, one caching policy.
    rtt = measure_rtt()
    run, dtype = make_bench(op_name, grid)
    if dtype == jnp.uint32:
        x = jnp.asarray(
            np.random.default_rng(0).integers(
                1, 1 << 15, size=(S + 1, 8, 128), dtype=np.uint32
            )
        )
    else:
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0.5, 1.0, size=(S + 1, 8, 128)),
            dtype=jnp.float32,
        )
    out = run(x)
    _sync(out)
    lane_ops = grid * K * S * LANES * OPS_PER_ROUND[op_name]
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(x)
        _sync(out)
        rate = timed_rate(lane_ops * iters, time.perf_counter() - t0, rtt)
        if rate is not None:
            return rate
        iters *= 2  # RTT-dominated: chain more work, never clamp


def main():
    names = sys.argv[1:] or list(OPS)
    for name in names:
        rate = measure(name)
        print(json.dumps({"op": name, "lane_ops_per_sec": round(rate, 0),
                          "tera_ops": round(rate / 1e12, 3)}))


if __name__ == "__main__":
    main()
