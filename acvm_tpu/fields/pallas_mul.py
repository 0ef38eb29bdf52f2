"""Pallas TPU kernel for batched Montgomery multiplication.

The jnp CIOS path (`acvm_tpu.fields.jnp_ops.LimbContext.mont_mul`) materializes
dozens of intermediate (N, 16) tensors per multiply, making the op HBM-bound.
This kernel runs the whole 16-round CIOS recurrence inside one pallas_call with
the accumulator resident in registers/VMEM: per element the only HBM traffic is
the two 64-byte operands in and the 64-byte product out.

Inside the kernel the block is transposed to (limb, lane) so the batch rides
the 128-wide vector lanes; the transposes are VMEM-local and amortized across
the ~700 vector ops of the multiply.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .params import FieldParams, BN254_FR, LIMB_BITS, NUM_LIMBS
from .limbs import int_to_limbs

MASK = (1 << LIMB_BITS) - 1


def _make_kernel(params: FieldParams):
    import numpy as np

    p_np = np.asarray(int_to_limbs(params.modulus), dtype=np.uint32)
    n0_inv = np.uint32(params.n0_inv)

    def kernel(p_ref, a_ref, b_ref, out_ref):
        # (TILE, 16) -> (16, TILE): batch on lanes.
        a = a_ref[:].T
        b = b_ref[:].T
        tile = a.shape[1]
        p = p_ref[:].T  # (16, 1)

        # Lazy CIOS with full-width (16, TILE) row operations.  Per outer
        # iteration: the hi halves of the products feed limb j+1, which after
        # the one-limb shift-down is exactly index j — so adding ``hi`` AFTER
        # the shift needs no scatter at all.  Accumulator rows stay < 2^23.
        zero_row = jnp.zeros((1, tile), dtype=jnp.uint32)
        t = jnp.zeros((NUM_LIMBS, tile), dtype=jnp.uint32)
        for i in range(NUM_LIMBS):
            ai = a[i : i + 1]  # (1, TILE)
            prod = ai * b  # (16, TILE)
            lo = prod & MASK
            hi = prod >> LIMB_BITS

            m = (((t[0:1] + lo[0:1]) & MASK) * n0_inv) & MASK  # (1, TILE)
            prod_p = m * p  # (16, TILE)
            lo_sum = lo + (prod_p & MASK)
            hi_sum = hi + (prod_p >> LIMB_BITS)

            t = t + lo_sum
            carry0 = t[0:1] >> LIMB_BITS  # limb 0 is divisible by 2^16
            t = jnp.concatenate([t[1:], zero_row], axis=0)  # shift down
            t = t + hi_sum  # hi of limb j -> limb j+1 == post-shift index j
            t = jnp.concatenate([t[0:1] + carry0, t[1:]], axis=0)

        # Normalize the lazy accumulator (value < 2p < 2^256).
        rows = []
        carry = zero_row
        for i in range(NUM_LIMBS):
            v = t[i : i + 1] + carry
            rows.append(v & MASK)
            carry = v >> LIMB_BITS
        r = rows  # 16 x (1, TILE)

        # Conditional subtract p.  Masks kept as uint32 0/1 (Mosaic dislikes
        # wide boolean vectors).
        one_m = jnp.ones((1, tile), jnp.uint32)
        need = one_m
        undecided = one_m
        for i in range(NUM_LIMBS - 1, -1, -1):
            pi = p[i : i + 1]
            gt = (r[i] > pi).astype(jnp.uint32)
            lt = (r[i] < pi).astype(jnp.uint32)
            need = need + undecided * gt * (one_m - need)
            need = need - undecided * lt * need
            undecided = undecided * (one_m - gt) * (one_m - lt)

        comp = (~p) & MASK  # (16, 1)
        rows = []
        carry = one_m  # +1 completes two's complement
        for i in range(NUM_LIMBS):
            v = r[i] + comp[i : i + 1] + carry
            rows.append(v & MASK)
            carry = v >> LIMB_BITS

        keep = one_m - need
        out_rows = [d * need + orig * keep for d, orig in zip(rows, r)]
        out_ref[:] = jnp.concatenate(out_rows, axis=0).T

    return kernel


@partial(jax.jit, static_argnames=("tile",))
def mont_mul_pallas(a: jnp.ndarray, b: jnp.ndarray, tile: int = 512) -> jnp.ndarray:
    """(N, 16) x (N, 16) -> (N, 16) Montgomery product over BN254 Fr.

    N must be a multiple of ``tile`` (callers pad); use
    :func:`mont_mul_pallas_flex` for arbitrary shapes.
    """
    kernel = _make_kernel(BN254_FR)
    n = a.shape[0]
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)
    spec = pl.BlockSpec((tile, NUM_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM)
    p_arr = jnp.asarray(int_to_limbs(BN254_FR.modulus), dtype=jnp.uint32)[None]
    p_spec = pl.BlockSpec(
        (1, NUM_LIMBS), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, NUM_LIMBS), jnp.uint32),
        grid=grid,
        in_specs=[p_spec, spec, spec],
        out_specs=spec,
    )(p_arr, a, b)


def mont_mul_pallas_flex(a: jnp.ndarray, b: jnp.ndarray, tile: int = 512) -> jnp.ndarray:
    """Arbitrary leading shape: broadcast, flatten, pad to the tile, run."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(-1, NUM_LIMBS)
    b = jnp.broadcast_to(b, shape).reshape(-1, NUM_LIMBS)
    n = a.shape[0]
    padded = (n + tile - 1) // tile * tile
    if padded != n:
        pad = [(0, padded - n), (0, 0)]
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    out = mont_mul_pallas(a, b, tile=tile)
    return out[:n].reshape(shape)
