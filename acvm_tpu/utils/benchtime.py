"""Shared timing helpers for the benchmark harnesses.

The remote-tunneled TPU runtime here has two measurement hazards, both of
which produced wrong numbers in earlier rounds (BASELINE.md "Measurement
methodology"):

1. ``block_until_ready`` can return before enqueued programs execute, so a
   timed region must end in a host readback (:func:`sync`).
2. That readback costs a ~24 ms network round trip (:func:`measure_rtt`);
   any elapsed time not ≫ RTT measures the tunnel, not the hardware.

:func:`timed_rate` is the one guarded way to turn (work, elapsed) into a
rate: it subtracts one RTT and *refuses* (returns None) when the elapsed
time is not at least ``min_ratio`` RTTs — the caller must then increase the
work, never clamp (a clamp silently reports astronomically inflated rates).
"""

from __future__ import annotations

import time
from typing import Optional

_RTT_CACHE: list = []


def sync(x) -> None:
    """Force device completion by reading one element back to the host."""
    import numpy as np

    idx = tuple(0 for _ in x.shape)
    np.asarray(x[idx])


def measure_rtt() -> float:
    """Measured host<->device readback round-trip latency (cached)."""
    if not _RTT_CACHE:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: x + 1)
        x = f(jnp.ones((8, 128), jnp.uint32))
        sync(x)
        samples = []
        for _ in range(7):
            t0 = time.perf_counter()
            x = f(x)
            sync(x)
            samples.append(time.perf_counter() - t0)
        _RTT_CACHE.append(min(samples))
    return _RTT_CACHE[0]


def timed_rate(
    work: float, elapsed: float, rtt: Optional[float] = None,
    min_ratio: float = 2.0,
) -> Optional[float]:
    """``work / (elapsed - rtt)``, or None when the measurement is
    RTT-dominated (elapsed <= min_ratio * rtt) and must be retried with
    more work rather than reported."""
    if rtt is None:
        rtt = measure_rtt()
    if elapsed <= min_ratio * rtt:
        return None
    return work / (elapsed - rtt)
