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

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .params import FieldParams, BN254_FR, LIMB_BITS, NUM_LIMBS
from .limbs import int_to_limbs

MASK = (1 << LIMB_BITS) - 1


def _cios_lazy(a, b, p, n0_inv, zero_row):
    """Lazy CIOS over (16, M) limb panels: returns the unnormalized
    accumulator rows (value < 2p, limbs < ~2^23).  ``a`` and ``b`` must be
    (16, M); ``p`` is (16, 1)."""
    t = jnp.zeros_like(b)
    for i in range(NUM_LIMBS):
        ai = a[i : i + 1]  # (1, M)
        prod = ai * b  # (16, M)
        lo = prod & MASK
        hi = prod >> LIMB_BITS

        m = (((t[0:1] + lo[0:1]) & MASK) * n0_inv) & MASK  # (1, M)
        prod_p = m * p  # (16, M)
        lo_sum = lo + (prod_p & MASK)
        hi_sum = hi + (prod_p >> LIMB_BITS)

        t = t + lo_sum
        carry0 = t[0:1] >> LIMB_BITS  # limb 0 is divisible by 2^16
        t = jnp.concatenate([t[1:], zero_row], axis=0)  # shift down
        t = t + hi_sum  # hi of limb j -> limb j+1 == post-shift index j
        t = jnp.concatenate([t[0:1] + carry0, t[1:]], axis=0)
    return t


def _norm_rows(t, zero_row):
    """Propagate carries on a (16, M) lazy accumulator (value < 2^256)."""
    rows = []
    carry = zero_row
    for i in range(NUM_LIMBS):
        v = t[i : i + 1] + carry
        rows.append(v & MASK)
        carry = v >> LIMB_BITS
    return rows  # 16 x (1, M)


def _cond_sub_rows(r, p, one_m):
    """Conditionally subtract p from normalized rows (value < 2p) -> < p.
    Masks kept as uint32 0/1 (Mosaic dislikes wide boolean vectors)."""
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
    return [d * need + orig * keep for d, orig in zip(rows, r)]


def _make_kernel(params: FieldParams):
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
        one_m = jnp.ones((1, tile), jnp.uint32)
        t = _cios_lazy(a, b, p, n0_inv, zero_row)
        r = _norm_rows(t, zero_row)  # value < 2p
        out_rows = _cond_sub_rows(r, p, one_m)
        out_ref[:] = jnp.concatenate(out_rows, axis=0).T

    return kernel


def _mod_add_rows(a_rows, b_rows, p, zero_row, one_m):
    """Modular add of two normalized row lists, both < p (p < 2^255)."""
    rows = []
    carry = zero_row
    for i in range(NUM_LIMBS):
        v = a_rows[i] + b_rows[i] + carry
        rows.append(v & MASK)
        carry = v >> LIMB_BITS
    return _cond_sub_rows(rows, p, one_m)


def _bcast_e(x, tb):
    """(TE, L) static panel -> (L, TB*TE) with the gate axis broadcast over
    the batch tile (lane m = b*TE + e)."""
    xT = x.T  # (L, TE)
    L, te = xT.shape
    return jnp.broadcast_to(xT[:, None, :], (L, tb, te)).reshape(L, tb * te)


def _make_dot_kernel(params: FieldParams, has_scale: bool, T: int):
    n0_inv = np.uint32(params.n0_inv)

    def kernel(p_ref, vals_ref, coeff_ref, qc_ref, *rest):
        if has_scale:
            scale_ref, out_ref = rest
        else:
            (out_ref,) = rest
        tb, te = vals_ref.shape[0], vals_ref.shape[1]
        m = tb * te
        p = p_ref[:].T  # (L, 1)
        zero_row = jnp.zeros((1, m), dtype=jnp.uint32)
        one_m = jnp.ones((1, m), jnp.uint32)

        qc = _bcast_e(qc_ref[:], tb)  # (L, M), < p
        acc = [qc[i : i + 1] for i in range(NUM_LIMBS)]
        for t in range(T):
            v = vals_ref[:, :, t, :].reshape(m, NUM_LIMBS).T  # (L, M)
            c = _bcast_e(coeff_ref[:, t, :], tb)
            lazy = _cios_lazy(c, v, p, n0_inv, zero_row)
            term = _cond_sub_rows(_norm_rows(lazy, zero_row), p, one_m)
            acc = _mod_add_rows(acc, term, p, zero_row, one_m)
        if has_scale:
            s = _bcast_e(scale_ref[:], tb)
            lazy = _cios_lazy(s, jnp.concatenate(acc, axis=0), p, n0_inv, zero_row)
            acc = _cond_sub_rows(_norm_rows(lazy, zero_row), p, one_m)
        out_ref[:] = (
            jnp.concatenate(acc, axis=0).T.reshape(tb, te, NUM_LIMBS)
        )

    return kernel


def _cios_full(a, b, p, n0_inv, zero_row, one_m):
    """Array-in/array-out Montgomery multiply on (16, M) panels: lazy CIOS,
    carry normalization, conditional subtract.  Result < p."""
    lazy = _cios_lazy(a, b, p, n0_inv, zero_row)
    rows = _cond_sub_rows(_norm_rows(lazy, zero_row), p, one_m)
    return jnp.concatenate(rows, axis=0)


def _make_pow_kernel(params: FieldParams, num_windows: int):
    n0_inv = np.uint32(params.n0_inv)

    def kernel(consts_ref, digits_ref, a_ref, out_ref, table_ref):
        a = a_ref[:].T  # (L, TILE)
        tile = a.shape[1]
        p = consts_ref[0:1].T  # (L, 1)
        r1 = consts_ref[1:2].T  # (L, 1) Montgomery one (R mod p)
        zero_row = jnp.zeros((1, tile), dtype=jnp.uint32)
        one_m = jnp.ones((1, tile), jnp.uint32)
        mont = lambda x, y: _cios_full(x, y, p, n0_inv, zero_row, one_m)

        # Power table a^0 .. a^15 (Montgomery form), built once per block.
        # The broadcast is materialized through the VMEM scratch: slicing a
        # lazily-replicated broadcast inside _cios_lazy trips Mosaic's
        # "broadcast in both sublanes and lanes" limitation.
        table_ref[0] = jnp.broadcast_to(r1, (NUM_LIMBS, tile))
        r_b = table_ref[0]
        acc_k = r_b
        for k in range(1, 16):
            acc_k = mont(acc_k, a)
            table_ref[k] = acc_k

        # MSB-first 4-bit windows of the static exponent: 4 squarings + one
        # multiply by the table entry selected by the window digit.  Leading
        # zero windows are identity ops (squaring R stays R; a^0 = R), so no
        # special-casing of the exponent length.
        def body(i, acc):
            for _ in range(4):
                acc = mont(acc, acc)
            digit = digits_ref[i]
            sel = jnp.zeros((NUM_LIMBS, tile), dtype=jnp.uint32)
            for k in range(16):
                m = (digit == k).astype(jnp.uint32)
                sel = sel + m * table_ref[k]
            return mont(acc, sel)

        acc = jax.lax.fori_loop(0, num_windows, body, r_b)
        # 0^e maps to 0 (the reference FieldElement::inverse convention).
        nonzero = jnp.any(a != 0, axis=0, keepdims=True).astype(jnp.uint32)
        out_ref[:] = (acc * nonzero).T

    return kernel


def mont_pow_pallas(
    a: jnp.ndarray,
    exponent: int,
    params: FieldParams = BN254_FR,
    tile: int = 512,
) -> jnp.ndarray:
    """(.., 16) Montgomery-form base -> a^exponent (Montgomery form), with the
    whole square-and-multiply chain fused in one pallas_call (the jnp Fermat
    path issues ~254 separate HBM-bound multiplies).  ``exponent`` is a static
    Python int; zero bases map to zero."""
    num_windows = NUM_LIMBS * LIMB_BITS // 4
    digits = np.asarray(
        [(exponent >> (4 * (num_windows - 1 - i))) & 0xF
         for i in range(num_windows)],
        dtype=np.int32,
    )
    shape = a.shape
    flat = a.reshape(-1, NUM_LIMBS)
    n = flat.shape[0]
    padded = (n + tile - 1) // tile * tile
    if padded != n:
        flat = jnp.pad(flat, [(0, padded - n), (0, 0)])
    consts = jnp.asarray(
        np.stack([int_to_limbs(params.modulus), int_to_limbs(params.r)]),
        dtype=jnp.uint32,
    )
    spec = pl.BlockSpec((tile, NUM_LIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_pow_kernel(params, num_windows),
        out_shape=jax.ShapeDtypeStruct((padded, NUM_LIMBS), jnp.uint32),
        grid=(padded // tile,),
        in_specs=[
            pl.BlockSpec((2, NUM_LIMBS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec,
        ],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((16, NUM_LIMBS, tile), jnp.uint32)],
    )(consts, jnp.asarray(digits), flat)
    return out[:n].reshape(shape)


def _p2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _pad_axis(x, axis: int, to: int):
    n = x.shape[axis]
    if n % to == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, to - n % to)
    return jnp.pad(x, pad)


def mont_dot_pallas(
    vals: jnp.ndarray,
    coeffs: jnp.ndarray,
    qc: jnp.ndarray,
    scale: jnp.ndarray | None = None,
    params: FieldParams = BN254_FR,
) -> jnp.ndarray:
    """Fused expression-panel evaluation:

        out[b, e] = [scale[e] *R] ( qc[e] + sum_t coeff[e, t] *R vals[b, e, t] )

    where ``*R`` is the Montgomery product (x*y*R^-1 mod p).  ``vals`` is
    (B, E, T, 16); ``coeffs`` (E, T, 16), ``qc``/``scale`` (E, 16); returns
    (B, E, 16).  The whole per-gate chain — T Montgomery multiplies, T modular
    adds, the constant add and the optional final scale multiply — runs in one
    pallas_call with the accumulator in VMEM; per (b, e) the only HBM traffic
    is the gathered operand panel in and 64 bytes out.  Static per-gate panels
    (coeff/qc/scale) are blocked per gate tile, never broadcast over the batch
    in HBM.
    """
    B, E, T, L = vals.shape
    assert L == NUM_LIMBS
    tile_b = min(8, _p2(B))
    tile_e = min(_p2(E), max(128, 2048 // tile_b))
    # VMEM guard: keep the vals block (double-buffered) a few MB at most.
    while tile_b * tile_e * T > 32768 and tile_e > 128:
        tile_e //= 2
    while tile_b * tile_e * T > 32768 and tile_b > 1:
        tile_b //= 2

    vals = _pad_axis(_pad_axis(vals, 0, tile_b), 1, tile_e)
    coeffs = _pad_axis(coeffs, 0, tile_e)
    qc = _pad_axis(qc, 0, tile_e)
    if scale is not None:
        scale = _pad_axis(scale, 0, tile_e)
    Bp, Ep = vals.shape[0], vals.shape[1]
    grid = (Bp // tile_b, Ep // tile_e)

    p_arr = jnp.asarray(int_to_limbs(params.modulus), dtype=jnp.uint32)[None]
    in_specs = [
        pl.BlockSpec((1, L), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (tile_b, tile_e, T, L), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (tile_e, T, L), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((tile_e, L), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
    ]
    args = [p_arr, vals, coeffs, qc]
    if scale is not None:
        in_specs.append(
            pl.BlockSpec((tile_e, L), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
        )
        args.append(scale)
    out = pl.pallas_call(
        _make_dot_kernel(params, scale is not None, T),
        out_shape=jax.ShapeDtypeStruct((Bp, Ep, L), jnp.uint32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_b, tile_e, L), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
    )(*args)
    return out[:B, :E]


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
