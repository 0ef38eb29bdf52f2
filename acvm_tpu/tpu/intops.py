"""Integer (non-modular) limb kernels used by directives and the Brillig trace:
full-width add/sub/mul mod 2^256, masking to 2^bit_size, comparisons, and
binary long division.  All ops are elementwise over leading batch dims with a
trailing NUM_LIMBS axis of 16-bit limbs in uint32 lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.params import LIMB_BITS, NUM_LIMBS
from ..fields.jnp_ops import MASK, _carry_propagate, _geq, _neg_limbs


def int_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod 2^256."""
    return _carry_propagate(a + b)


def int_sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod 2^256."""
    return _carry_propagate(a + _neg_limbs(b))


def int_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a * b) mod 2^256 via lazy schoolbook convolution."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    acc = jnp.zeros(shape, dtype=jnp.uint32)
    carry_acc = jnp.zeros(shape, dtype=jnp.uint32)
    for i in range(NUM_LIMBS):
        prod = a[..., i : i + 1] * b[..., : NUM_LIMBS - i]
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        acc = acc.at[..., i:].add(lo)
        if i + 1 < NUM_LIMBS:
            # The hi half of the top product overflows 2^256 and is dropped.
            carry_acc = carry_acc.at[..., i + 1 :].add(hi[..., : NUM_LIMBS - i - 1])
        # Normalize lazily every few iterations to stay under 2^32: each limb
        # accumulates at most 16 * 2^16-size terms per array; with two arrays
        # we stay < 2^21 per pass, so a single fold at the end suffices.
    return _carry_propagate(_carry_propagate(acc) + carry_acc)


def mask_to_bits(a: jnp.ndarray, bit_size: int) -> jnp.ndarray:
    """a mod 2^bit_size."""
    full = bit_size // LIMB_BITS
    rem = bit_size % LIMB_BITS
    idx = jnp.arange(NUM_LIMBS)
    mask = jnp.where(idx < full, jnp.uint32(MASK), jnp.uint32(0))
    if rem:
        mask = jnp.where(idx == full, jnp.uint32((1 << rem) - 1), mask)
    return a & mask


def int_geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _geq(a, b)


def int_lt(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return ~_geq(a, b)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def shl_static(a: jnp.ndarray, shift: int) -> jnp.ndarray:
    """(a << shift) mod 2^256 for a static shift amount."""
    limb_shift, bit_shift = divmod(shift, LIMB_BITS)
    if limb_shift >= NUM_LIMBS:
        return jnp.zeros_like(a)
    shifted = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(limb_shift, 0)])[..., :NUM_LIMBS]
    if bit_shift == 0:
        return shifted
    carry_in = jnp.pad(shifted, [(0, 0)] * (a.ndim - 1) + [(1, 0)])[..., :NUM_LIMBS]
    return ((shifted << bit_shift) & MASK) | (carry_in >> (LIMB_BITS - bit_shift))


def shr_static(a: jnp.ndarray, shift: int) -> jnp.ndarray:
    """a >> shift for a static shift amount."""
    limb_shift, bit_shift = divmod(shift, LIMB_BITS)
    if limb_shift >= NUM_LIMBS:
        return jnp.zeros_like(a)
    shifted = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, limb_shift)])[..., limb_shift:]
    if bit_shift == 0:
        return shifted
    carry_in = jnp.pad(shifted, [(0, 0)] * (a.ndim - 1) + [(0, 1)])[..., 1:]
    return (shifted >> bit_shift) | ((carry_in << (LIMB_BITS - bit_shift)) & MASK)


def shl_dynamic(a: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """(a << shift) mod 2^256 with per-element shift amounts.

    ``shift``: (...,) uint32 (callers clamp; any value >= 256 yields 0)."""
    limb_shift = (shift // LIMB_BITS).astype(jnp.int32)[..., None]  # (..., 1)
    bit = (shift % LIMB_BITS).astype(jnp.uint32)[..., None]
    idx = jnp.arange(NUM_LIMBS, dtype=jnp.int32)  # target limb j
    src = idx - limb_shift  # (..., L)
    take = jnp.take_along_axis(a, jnp.clip(src, 0, NUM_LIMBS - 1), axis=-1)
    gathered = jnp.where(src >= 0, take, 0)
    carry_src = src - 1
    ctake = jnp.take_along_axis(
        a, jnp.clip(carry_src, 0, NUM_LIMBS - 1), axis=-1
    )
    carry = jnp.where(carry_src >= 0, ctake, 0)
    # bit == 0: carry >> 16 == 0 for 16-bit limbs, no special case needed.
    return ((gathered << bit) & MASK) | (carry >> (LIMB_BITS - bit))


def shr_dynamic(a: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """a >> shift with per-element shift amounts (>= 256 yields 0)."""
    limb_shift = (shift // LIMB_BITS).astype(jnp.int32)[..., None]
    bit = (shift % LIMB_BITS).astype(jnp.uint32)[..., None]
    idx = jnp.arange(NUM_LIMBS, dtype=jnp.int32)
    src = idx + limb_shift
    take = jnp.take_along_axis(a, jnp.clip(src, 0, NUM_LIMBS - 1), axis=-1)
    gathered = jnp.where(src < NUM_LIMBS, take, 0)
    carry_src = src + 1
    ctake = jnp.take_along_axis(
        a, jnp.clip(carry_src, 0, NUM_LIMBS - 1), axis=-1
    )
    carry = jnp.where(carry_src < NUM_LIMBS, ctake, 0)
    return (gathered >> bit) | ((carry << (LIMB_BITS - bit)) & MASK)


def _shl1(a: jnp.ndarray) -> jnp.ndarray:
    carry_in = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(1, 0)])[..., :NUM_LIMBS]
    return ((a << 1) & MASK) | (carry_in >> (LIMB_BITS - 1))


def long_divmod(a: jnp.ndarray, b: jnp.ndarray, num_bits: int = 256):
    """Euclidean (q, r) of full-width limb integers via bit-serial long
    division.  b == 0 yields (0, 0), matching the reference Quotient directive.

    ``num_bits`` bounds the dividend's bit width; smaller static bounds
    shorten the loop.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).astype(jnp.uint32)
    b = jnp.broadcast_to(b, shape).astype(jnp.uint32)
    b_zero = is_zero(b)[..., None]

    q0 = jnp.zeros(shape, dtype=jnp.uint32)
    r0 = jnp.zeros(shape, dtype=jnp.uint32)

    def body(i, state):
        q, r = state
        k = num_bits - 1 - i
        limb = k // LIMB_BITS
        bit_off = k % LIMB_BITS
        a_bit = (jnp.take(a, limb, axis=-1) >> bit_off) & 1
        r = _shl1(r)
        r = r.at[..., 0].add(a_bit)
        ge = _geq(r, b) & ~b_zero[..., 0]
        r = jnp.where(ge[..., None], int_sub(r, b), r)
        q_limb = jnp.take(q, limb, axis=-1) | (ge.astype(jnp.uint32) << bit_off)
        limb_sel = jnp.arange(NUM_LIMBS) == limb
        q = jnp.where(limb_sel, q_limb[..., None], q)
        return q, r

    q, r = jax.lax.fori_loop(0, num_bits, body, (q0, r0))
    q = jnp.where(b_zero, 0, q)
    r = jnp.where(b_zero, 0, r)
    return q, r
