"""Batched Grumpkin elliptic-curve kernels on limb arrays.

Device-side replacement for the reference's barretenberg EC gadgets
(``barretenberg_blackbox_solver/src/wasm/{scalar_mul,pedersen}.rs``): Jacobian
points over the BN254-Fr limb field (`acvm_tpu.fields.jnp_ops`), branchless
complete addition via selects, and windowed fixed-base multiplication driven by
``lax.scan`` over host-precomputed tables.  All coordinates are in Montgomery
form; the point at infinity is encoded as Z == 0.

A point batch is a (X, Y, Z) triple of (..., NUM_LIMBS) uint32 arrays.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..blackbox.ec import grumpkin
from ..fields.jnp_ops import LimbContext
from ..fields.limbs import int_to_limbs, ints_to_limbs
from ..fields.params import BN254_FR, LIMB_BITS, NUM_LIMBS

WINDOW_BITS = 4
NUM_WINDOWS = 64  # 256 bits / 4


def _mont(ctx: LimbContext, value: int) -> np.ndarray:
    return np.asarray(
        int_to_limbs((value * ctx.params.r) % ctx.params.modulus), dtype=np.uint32
    )


def pt_infinity(ctx: LimbContext, shape) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    zeros = jnp.zeros(tuple(shape) + (NUM_LIMBS,), dtype=jnp.uint32)
    return zeros, zeros, zeros


def pt_is_inf(p) -> jnp.ndarray:
    return jnp.all(p[2] == 0, axis=-1)


def pt_double(ctx: LimbContext, p):
    """dbl-2009-l (a = 0)."""
    x, y, z = p
    A = ctx.mont_mul(x, x)
    B = ctx.mont_mul(y, y)
    C = ctx.mont_mul(B, B)
    t = ctx.add(x, B)
    t = ctx.mont_mul(t, t)
    D = ctx.sub(ctx.sub(t, A), C)
    D = ctx.add(D, D)
    E = ctx.add(ctx.add(A, A), A)
    F = ctx.mont_mul(E, E)
    x3 = ctx.sub(F, ctx.add(D, D))
    C8 = ctx.add(C, C)
    C8 = ctx.add(C8, C8)
    C8 = ctx.add(C8, C8)
    y3 = ctx.sub(ctx.mont_mul(E, ctx.sub(D, x3)), C8)
    z3 = ctx.mont_mul(y, z)
    z3 = ctx.add(z3, z3)
    return x3, y3, z3


def pt_add(ctx: LimbContext, p, q):
    """Branchless complete addition (add-2007-bl with select fallbacks)."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    Z1Z1 = ctx.mont_mul(z1, z1)
    Z2Z2 = ctx.mont_mul(z2, z2)
    U1 = ctx.mont_mul(x1, Z2Z2)
    U2 = ctx.mont_mul(x2, Z1Z1)
    S1 = ctx.mont_mul(ctx.mont_mul(y1, z2), Z2Z2)
    S2 = ctx.mont_mul(ctx.mont_mul(y2, z1), Z1Z1)
    H = ctx.sub(U2, U1)
    Rr = ctx.sub(S2, S1)

    I = ctx.add(H, H)
    I = ctx.mont_mul(I, I)
    J = ctx.mont_mul(H, I)
    r2 = ctx.add(Rr, Rr)
    V = ctx.mont_mul(U1, I)
    x3 = ctx.sub(ctx.sub(ctx.mont_mul(r2, r2), J), ctx.add(V, V))
    S1J = ctx.mont_mul(S1, J)
    y3 = ctx.sub(ctx.mont_mul(r2, ctx.sub(V, x3)), ctx.add(S1J, S1J))
    zz = ctx.add(z1, z2)
    zz = ctx.mont_mul(zz, zz)
    z3 = ctx.mont_mul(ctx.sub(ctx.sub(zz, Z1Z1), Z2Z2), H)

    dx, dy, dz = pt_double(ctx, p)

    h_zero = ctx.is_zero(H)[..., None]
    r_zero = ctx.is_zero(Rr)[..., None]
    p_inf = pt_is_inf(p)[..., None]
    q_inf = pt_is_inf(q)[..., None]

    # same x: either doubling (same y) or infinity (negatives)
    x3 = jnp.where(h_zero & r_zero, dx, x3)
    y3 = jnp.where(h_zero & r_zero, dy, y3)
    z3 = jnp.where(h_zero & r_zero, dz, z3)
    z3 = jnp.where(h_zero & ~r_zero, 0, z3)
    # identities
    x3 = jnp.where(q_inf, x1, jnp.where(p_inf, x2, x3))
    y3 = jnp.where(q_inf, y1, jnp.where(p_inf, y2, y3))
    z3 = jnp.where(q_inf, z1, jnp.where(p_inf, z2, z3))
    return x3, y3, z3


def pt_to_affine(ctx: LimbContext, p):
    """Returns standard-form affine (x, y); infinity maps to (0, 0)."""
    x, y, z = p
    zinv = ctx.mont_inv(z)  # zero stays zero at infinity
    zinv2 = ctx.mont_mul(zinv, zinv)
    zinv3 = ctx.mont_mul(zinv2, zinv)
    ax = ctx.from_mont(ctx.mont_mul(x, zinv2))
    ay = ctx.from_mont(ctx.mont_mul(y, zinv3))
    inf = pt_is_inf(p)[..., None]
    return jnp.where(inf, 0, ax), jnp.where(inf, 0, ay)


# ---------------------------------------------------------------------------
# Windowed fixed-base multiplication
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _window_table_np(base_point: Tuple[int, int]) -> np.ndarray:
    """(NUM_WINDOWS, 2^WINDOW_BITS, 3, NUM_LIMBS) Montgomery-form jacobian
    multiples: table[w][d] = d * 2^(4w) * base.  d = 0 is the infinity entry
    (all zeros)."""
    ctx = LimbContext(BN254_FR)
    from .. import native

    table = np.zeros(
        (NUM_WINDOWS, 1 << WINDOW_BITS, 3, NUM_LIMBS), dtype=np.uint32
    )
    use_native = native.available()
    window_base = base_point
    for w in range(NUM_WINDOWS):
        acc = None
        for d in range(1, 1 << WINDOW_BITS):
            if use_native:
                acc = native.grumpkin_add(acc, window_base)
            else:
                acc = grumpkin.add(acc, window_base)
            if acc is not None:
                table[w, d, 0] = _mont(ctx, acc[0])
                table[w, d, 1] = _mont(ctx, acc[1])
                table[w, d, 2] = _mont(ctx, 1)
        # next window base: 2^4 * current
        for _ in range(WINDOW_BITS):
            if use_native:
                window_base = native.grumpkin_add(window_base, window_base)
            else:
                window_base = grumpkin.add(window_base, window_base)
    return table


def window_table(base_point: Tuple[int, int]) -> jnp.ndarray:
    return jnp.asarray(_window_table_np(tuple(base_point)))


def _window_digits(scalar_limbs: jnp.ndarray) -> jnp.ndarray:
    """(.., NUM_LIMBS) standard-form scalar -> (.., NUM_WINDOWS) 4-bit digits."""
    # Each 16-bit limb holds 4 windows.
    parts = [
        (scalar_limbs >> (WINDOW_BITS * k)) & ((1 << WINDOW_BITS) - 1)
        for k in range(LIMB_BITS // WINDOW_BITS)
    ]
    stacked = jnp.stack(parts, axis=-1)  # (.., L, 4)
    return stacked.reshape(scalar_limbs.shape[:-1] + (NUM_WINDOWS,))


def fixed_base_mul(
    ctx: LimbContext, table: jnp.ndarray, scalar_limbs: jnp.ndarray
):
    """scalar * base via the precomputed window table.

    scalar_limbs: (B, NUM_LIMBS) standard form (the scalar's integer bits).
    Returns a Montgomery jacobian point batch.
    """
    digits = _window_digits(scalar_limbs)  # (B, 64)
    acc = pt_infinity(ctx, scalar_limbs.shape[:-1])

    def body(acc, xs):
        table_w, digit = xs  # (16, 3, L), (B,)
        entry = jnp.take(table_w, digit, axis=0)  # (B, 3, L)
        q = (entry[..., 0, :], entry[..., 1, :], entry[..., 2, :])
        return pt_add(ctx, acc, q), None

    acc, _ = jax.lax.scan(body, acc, (table, digits.swapaxes(0, 1)))
    return acc


def scalar_mul(ctx: LimbContext, point, scalar_limbs: jnp.ndarray):
    """Generic double-and-add for variable bases (MSB-first scan)."""
    acc = pt_infinity(ctx, scalar_limbs.shape[:-1])
    bit_indices = jnp.arange(NUM_LIMBS * LIMB_BITS - 1, -1, -1)

    def body(acc, i):
        acc = pt_double(ctx, acc)
        limb = jnp.take(scalar_limbs, i // LIMB_BITS, axis=-1)
        bit = (limb >> (i % LIMB_BITS)) & 1
        added = pt_add(ctx, acc, point)
        sel = (bit == 1)[..., None]
        acc = tuple(
            jnp.where(sel, a, b) for a, b in zip(added, acc)
        )
        return acc, None

    acc, _ = jax.lax.scan(body, acc, bit_indices)
    return acc
