"""Fused Pallas kernel for batched Jacobian point addition.

The jnp tree MSM (`ec._tree_reduce_points`) issues ~24 separate Montgomery
multiplies per complete add, each a standalone pallas_call with its own
vreg-tile relayouts and HBM round trips — measured ~3x slower than the pure
compute bound (33 ms for a 2-generator B=2048 Pedersen MSM whose arithmetic
is ~10 ms at the VPU peak).  This kernel runs the ENTIRE complete-addition
formula (add-2007-bl + the dbl-2009-l doubling branch + exceptional-case
selects, exactly mirroring `ec.pt_add`) inside one Pallas program: all ~23
CIOS chains chain through VMEM, one HBM read per operand point and one write
per result.

Layout: a point panel is (N, 3, L, S, 128) uint32 — point index, coordinate
(X/Y/Z, Montgomery form, Z == 0 encoding infinity), limb, then the batch as
vreg tiles (B = S * 128).  Pairwise tree rounds slice even/odd points with
BlockSpec index maps (no data movement) and halve N per round; each round's
grid is (N/2,) over the same kernel body, so Mosaic compiles one kernel per
panel size (persistently cached).

Reference semantics: the barretenberg Grumpkin gadgets
(`barretenberg_blackbox_solver/src/wasm/{pedersen,scalar_mul}.rs`); group
law cases match `ec.pt_add`/`ec.pt_double` bit-for-bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import FieldParams, BN254_FR, LIMB_BITS, NUM_LIMBS
from ..fields.pallas_mul_v2 import (
    _cp_limbs,
    _p_limbs,
    _reduce_full,
    cios_unrolled,
    cond_sub,
    normalize,
)

L = NUM_LIMBS
MASK = (1 << LIMB_BITS) - 1


def _make_pt_add_kernel(params: FieldParams):
    pl_ = _p_limbs(params)
    t2p = _cp_limbs(params, 2)
    n0 = params.n0_inv

    def mmul(a, b):
        return cond_sub(normalize(cios_unrolled(a, b, pl_, n0)), pl_)

    def madd(a, b):
        # canonical + canonical < 2p
        return cond_sub(normalize([x + y for x, y in zip(a, b)]), pl_)

    def msub(a, b):
        # a - b mod p via a + (2p - b): complement-add wraps the 2^256 out
        # in normalize's dropped top carry; result < 3p -> 2p/p reduce chain.
        z = [x + ((~y) & MASK) + c for x, y, c in zip(a, b, t2p)]
        z[0] = z[0] + 1
        return _reduce_full(normalize(z), params, 3)

    def is_zero(a):
        acc = a[0]
        for x in a[1:]:
            acc = acc | x
        return acc == 0

    def sel(c, a, b):
        return [jnp.where(c, x, y) for x, y in zip(a, b)]

    def kernel(p_ref, q_ref, out_ref):
        x1 = [p_ref[0, 0, j] for j in range(L)]
        y1 = [p_ref[0, 1, j] for j in range(L)]
        z1 = [p_ref[0, 2, j] for j in range(L)]
        x2 = [q_ref[0, 0, j] for j in range(L)]
        y2 = [q_ref[0, 1, j] for j in range(L)]
        z2 = [q_ref[0, 2, j] for j in range(L)]

        # add-2007-bl (mirrors ec.pt_add)
        Z1Z1 = mmul(z1, z1)
        Z2Z2 = mmul(z2, z2)
        U1 = mmul(x1, Z2Z2)
        U2 = mmul(x2, Z1Z1)
        S1 = mmul(mmul(y1, z2), Z2Z2)
        S2 = mmul(mmul(y2, z1), Z1Z1)
        H = msub(U2, U1)
        Rr = msub(S2, S1)
        I = madd(H, H)
        I = mmul(I, I)
        J = mmul(H, I)
        r2 = madd(Rr, Rr)
        V = mmul(U1, I)
        x3 = msub(msub(mmul(r2, r2), J), madd(V, V))
        S1J = mmul(S1, J)
        y3 = msub(mmul(r2, msub(V, x3)), madd(S1J, S1J))
        zz = madd(z1, z2)
        zz = mmul(zz, zz)
        z3 = mmul(msub(msub(zz, Z1Z1), Z2Z2), H)

        # dbl-2009-l doubling branch (a = 0 curves; mirrors ec.pt_double)
        A = mmul(x1, x1)
        Bv = mmul(y1, y1)
        C = mmul(Bv, Bv)
        t = madd(x1, Bv)
        t = mmul(t, t)
        D = msub(msub(t, A), C)
        D = madd(D, D)
        E = madd(madd(A, A), A)
        F = mmul(E, E)
        dx = msub(F, madd(D, D))
        C8 = madd(C, C)
        C8 = madd(C8, C8)
        C8 = madd(C8, C8)
        dy = msub(mmul(E, msub(D, dx)), C8)
        dz = mmul(y1, z1)
        dz = madd(dz, dz)

        h_zero = is_zero(H)
        r_zero = is_zero(Rr)
        p_inf = is_zero(z1)
        q_inf = is_zero(z2)

        dbl = h_zero & r_zero
        x3 = sel(dbl, dx, x3)
        y3 = sel(dbl, dy, y3)
        z3 = sel(dbl, dz, z3)
        neg = h_zero & ~r_zero  # P + (-P) = infinity
        z3 = [jnp.where(neg, 0, v) for v in z3]
        x3 = sel(q_inf, x1, sel(p_inf, x2, x3))
        y3 = sel(q_inf, y1, sel(p_inf, y2, y3))
        z3 = sel(q_inf, z1, sel(p_inf, z2, z3))

        for j in range(L):
            out_ref[0, 0, j] = x3[j]
            out_ref[0, 1, j] = y3[j]
            out_ref[0, 2, j] = z3[j]

    return kernel


def pt_add_pairs(P: jnp.ndarray, params: FieldParams = BN254_FR) -> jnp.ndarray:
    """(N, 3, L, S, 128) point panel (N even) -> (N/2, 3, L, S, 128) with
    out[c] = P[2c] + P[2c+1] (complete addition).

    The batch tile axis is chunked into blocks of <= 16 sublane rows: a full
    S = 128 (B = 16k) coordinate block is 3.1 MB and three of them plus the
    kernel's ~15 live limb lists blew the 16 MB scoped-VMEM budget (measured
    22.4 MB requested); at Sc = 16 the working set stays ~2 MB."""
    n, _, _, S, _ = P.shape
    assert n % 2 == 0
    sc = 16 if S % 16 == 0 else 8
    sc = min(sc, S)
    assert S % sc == 0

    def spec(f):
        return pl.BlockSpec(
            (1, 3, L, sc, 128),
            f,
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        _make_pt_add_kernel(params),
        out_shape=jax.ShapeDtypeStruct((n // 2, 3, L, S, 128), jnp.uint32),
        grid=(n // 2, S // sc),
        in_specs=[
            spec(lambda c, s: (2 * c, 0, 0, s, 0)),
            spec(lambda c, s: (2 * c + 1, 0, 0, s, 0)),
        ],
        out_specs=spec(lambda c, s: (c, 0, 0, s, 0)),
    )(P, P)


def scalar_mul_fused(ctx, point, scalar_limbs):
    """Variable-base double-and-add ladder through the fused add kernel.

    ``point``: (x, y, z) Montgomery Jacobian (B, L) arrays; ``scalar_limbs``
    (B, L) standard form.  MSB-first scan, identical group-law semantics to
    `ec.scalar_mul` (doubling rides the complete add's equal-points branch —
    3x the muls of a dedicated double, but one Pallas program per step
    instead of ~8 separate HBM-bound multiplies; the jnp ladder at B = 2048
    paid per-op dispatch on ~32 multiplies per bit).  a = 0 curves only."""
    B = scalar_limbs.shape[0]
    S = B // 128

    def to_tiled(pt):
        return jnp.stack(pt, axis=0).transpose(0, 2, 1).reshape(
            3, L, S, 128
        )

    base = to_tiled(point)
    acc = jnp.zeros((3, L, S, 128), jnp.uint32)
    bit_indices = jnp.arange(NUM_LIMBS * LIMB_BITS - 1, -1, -1)
    sc_tiled = scalar_limbs.T.reshape(L, S, 128)

    def body(acc, i):
        dbl = pt_add_pairs(jnp.stack([acc, acc], axis=0), ctx.params)[0]
        added = pt_add_pairs(
            jnp.stack([dbl, base], axis=0), ctx.params
        )[0]
        limb = jax.lax.dynamic_index_in_dim(
            sc_tiled, i // LIMB_BITS, axis=0, keepdims=False
        )  # (S, 128)
        bit = (limb >> (i % LIMB_BITS)) & 1
        acc = jnp.where((bit == 1)[None, None], added, dbl)
        return acc, None

    acc, _ = jax.lax.scan(body, acc, bit_indices)
    out = acc.reshape(3, L, B)
    return out[0].T, out[1].T, out[2].T


def tree_reduce_fused(ctx, X, Y, Z):
    """Pairwise tree reduction of a (B, N, L) Jacobian panel via the fused
    kernel -> ((B, L),) * 3 point.  Rounds shrink the panel (N -> N/2), so
    only the active pairs are ever computed — unlike the fixed-width jnp
    tree, no infinity-padding lanes burn VPU time; each distinct panel size
    costs one (persistently cached) Mosaic compile.  a = 0 curves only
    (grumpkin); callers gate on that."""
    B, N, _ = X.shape
    S = B // 128
    P = jnp.stack([X, Y, Z], axis=2)  # (B, N, 3, L)
    P = P.transpose(1, 2, 3, 0).reshape(N, 3, L, S, 128)
    while N > 1:
        if N % 2:
            P = jnp.concatenate([P, jnp.zeros_like(P[:1])], axis=0)
            N += 1
        P = pt_add_pairs(P, ctx.params)
        N //= 2
    out = P.reshape(3, L, B)
    return out[0].T, out[1].T, out[2].T
