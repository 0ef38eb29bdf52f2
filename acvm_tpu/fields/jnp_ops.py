"""Batched prime-field arithmetic on TPU: 16x16-bit limbs, Montgomery form.

This is the compute core of the batched witness solver.  Every op is
elementwise over arbitrary leading batch dimensions with a trailing limb axis
of NUM_LIMBS uint32 lanes (each holding a 16-bit limb).  Design notes for TPU:

* no 64-bit integers (TPU int path is 32-bit): 16-bit limbs keep every partial
  product < 2^32 and leave ~10 bits of headroom for lazy carry accumulation;
* the Montgomery multiply (CIOS with lazy carries) does its 16 outer iterations
  with NO inner carry chains — accumulator limbs stay below ~2^23 and a single
  final normalization pass propagates carries, which XLA vectorizes cleanly
  over the batch;
* modular inverse is Fermat (x^(p-2)) via lax.scan over the static exponent
  bits, so it compiles to one compact loop regardless of batch size.

Semantics mirror the host FieldElement (`acvm_tpu.fields.field`), which is the
bit-exactness oracle; `tests/test_limb_field.py` checks them against each other
on random vectors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .params import FieldParams, BN254_FR, LIMB_BITS, NUM_LIMBS
from .limbs import int_to_limbs

MASK = (1 << LIMB_BITS) - 1

# Incremented once per *traced* mont_batch_inv call (jit tracing runs the
# Python body); zero after a solve means every inversion took a per-value
# Fermat chain instead of the amortized batch trick.
BATCH_INV_TRACES = 0


class LimbContext:
    """Device-side constants for one field (modulus limbs, Montgomery R^2,
    n0', exponent bits for inversion)."""

    def __init__(self, params: FieldParams = BN254_FR):
        self.params = params
        # Fields with p >= 2^255 (secp256k1/r1 base and scalar fields) need one
        # extra carry limb in add/sub/mul intermediates: a+b and the CIOS
        # accumulator can reach 2p >= 2^256.  BN254/BLS12-381 Fr (<= 255 bits)
        # take the narrow path.
        self.wide = params.modulus.bit_length() > LIMB_BITS * NUM_LIMBS - 1
        self.p_ext = jnp.asarray(
            list(int_to_limbs(params.modulus)) + [0], dtype=jnp.uint32
        )
        self.p_limbs = jnp.asarray(int_to_limbs(params.modulus), dtype=jnp.uint32)
        self.r2_limbs = jnp.asarray(int_to_limbs(params.r2), dtype=jnp.uint32)
        self.one_limbs = jnp.asarray(int_to_limbs(1), dtype=jnp.uint32)
        self.r_limbs = jnp.asarray(int_to_limbs(params.r), dtype=jnp.uint32)
        self.zero_limbs = jnp.zeros((NUM_LIMBS,), dtype=jnp.uint32)
        self.n0_inv = jnp.uint32(params.n0_inv)
        # Exponent bits of p-2, MSB first, for Fermat inversion.
        exponent = params.modulus - 2
        nbits = exponent.bit_length()
        self.inv_exp_bits = jnp.asarray(
            [(exponent >> (nbits - 1 - i)) & 1 for i in range(nbits)],
            dtype=jnp.bool_,
        )

    def _compact_mul(self) -> bool:
        """Trace the CIOS rounds as a ``fori_loop`` instead of unrolling.

        Identical bit-for-bit results, ~16x smaller HLO.  XLA:TPU wants the
        unrolled form (cross-round fusion); XLA:CPU on weak hosts chokes on
        compile time for EC graphs that inline hundreds of multiplies, so the
        compact form is the default off-TPU.  Override either way with
        ACVM_TPU_COMPACT_MUL=0/1.
        """
        import os

        flag = os.environ.get("ACVM_TPU_COMPACT_MUL")
        if flag is not None:
            return flag not in ("", "0")
        try:
            return jax.default_backend() != "tpu"
        except Exception:
            return False

    def _pallas_ok(self, shape, min_batch: int = 2048) -> bool:
        """Use the fused Pallas kernel: TPU backend, a non-wide field (2p <
        2^256 — true of both reference fields), batch big enough to amortize
        the tile padding.  Disable with ACVM_TPU_NO_PALLAS=1.

        ``min_batch`` is the amortization threshold for SINGLE-multiply
        kernels; chain kernels (the fused Fermat pow) pass 0 — one padded
        512-tile program always beats ~254 sequential HBM-bound multiplies,
        measured 13x on the affine-MSM per-round group inversions whose
        product panels are far below 2048."""
        import os

        if os.environ.get("ACVM_TPU_NO_PALLAS"):
            return False
        if self.wide:
            return False
        n = 1
        for d in shape[:-1]:
            n *= int(d)
        if n < min_batch:
            return False
        try:
            import jax

            return jax.default_backend() == "tpu"
        except Exception:
            return False

    # ---- comparison helpers -------------------------------------------------
    def _geq_p(self, a: jnp.ndarray) -> jnp.ndarray:
        """a >= p, elementwise over the batch.  a must be normalized."""
        return _geq(a, self.p_limbs)

    # ---- modular add / sub --------------------------------------------------
    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if self.wide:
            s = _carry_propagate(_ext1(a.astype(jnp.uint32) + b.astype(jnp.uint32)))
            return _cond_sub(s, self.p_ext)[..., :NUM_LIMBS]
        s = _carry_propagate(a.astype(jnp.uint32) + b.astype(jnp.uint32))
        return _cond_sub(s, self.p_limbs)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        # a - b + p, then conditional subtract p.  The two's-complement
        # negation adds a power-of-two that the carry propagation discards
        # past the top limb (see _neg_limbs).
        if self.wide:
            s = _carry_propagate(
                _ext1(a.astype(jnp.uint32)) + self.p_ext + _neg_limbs(_ext1(b))
            )
            return _cond_sub(s, self.p_ext)[..., :NUM_LIMBS]
        s = _carry_propagate(
            a.astype(jnp.uint32) + self.p_limbs.astype(jnp.uint32) + _neg_limbs(b)
        )
        return _cond_sub(s, self.p_limbs)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        # p - a, with p - 0 = p mapped back to 0 by the conditional subtract.
        if self.wide:
            s = _carry_propagate(self.p_ext + _neg_limbs(_ext1(a)))
            return _cond_sub(s, self.p_ext)[..., :NUM_LIMBS]
        s = _carry_propagate(
            self.p_limbs.astype(jnp.uint32) + _neg_limbs(a)
        )
        return _cond_sub(s, self.p_limbs)

    # ---- Montgomery multiply ------------------------------------------------
    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """(a * b * R^-1) mod p for a,b < p in limb form.

        On TPU with large batches this dispatches to the fused Pallas kernel
        (`acvm_tpu.fields.pallas_mul`), which keeps the CIOS accumulator in
        VMEM (~5x over the jnp path); otherwise it runs the jnp CIOS with lazy
        carries (accumulator limbs < ~2^23, normalized once at the end).
        """
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        if self._pallas_ok(shape):
            # Unrolled-limb v2 kernel: ~4x the v1 panel kernel (~2x after the
            # (N, 16) <-> vreg-tile relayouts this interface pays).
            from .pallas_mul_v2 import mont_mul_pallas_v2

            a = jnp.broadcast_to(a, shape)
            b = jnp.broadcast_to(b, shape)
            return mont_mul_pallas_v2(
                a.reshape(-1, NUM_LIMBS), b.reshape(-1, NUM_LIMBS),
                params=self.params,
            ).reshape(shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        t = jnp.zeros(shape[:-1] + (NUM_LIMBS + 1,), dtype=jnp.uint32)
        p = self.p_limbs

        def cios_round(ai, t):
            prod = ai * b  # (..., NUM_LIMBS), each < 2^32
            lo = prod & MASK
            hi = prod >> LIMB_BITS
            t = t.at[..., :NUM_LIMBS].add(lo)
            t = t.at[..., 1 : NUM_LIMBS + 1].add(hi)

            m = ((t[..., 0:1] & MASK) * self.n0_inv) & MASK
            prod_p = m * p
            lo_p = prod_p & MASK
            hi_p = prod_p >> LIMB_BITS
            t = t.at[..., :NUM_LIMBS].add(lo_p)
            t = t.at[..., 1 : NUM_LIMBS + 1].add(hi_p)

            # Shift down one limb: t[0] is divisible by 2^16; its high part
            # carries into the next limb.
            carry = t[..., 0:1] >> LIMB_BITS
            return jnp.concatenate(
                [
                    t[..., 1:2] + carry,
                    t[..., 2:],
                    jnp.zeros(shape[:-1] + (1,), dtype=jnp.uint32),
                ],
                axis=-1,
            )

        if self._compact_mul():
            t = jax.lax.fori_loop(
                0,
                NUM_LIMBS,
                lambda i, t: cios_round(
                    jax.lax.dynamic_slice_in_dim(a, i, 1, axis=-1), t
                ),
                t,
            )
        else:
            for i in range(NUM_LIMBS):
                t = cios_round(a[..., i : i + 1], t)

        if self.wide:
            # Value < 2p can exceed 2^256: keep the 17th limb through the
            # normalization and conditional subtract.
            s = _carry_propagate(t)
            return _cond_sub(s, self.p_ext)[..., :NUM_LIMBS]
        t = _carry_propagate_wide(t)  # -> (..., NUM_LIMBS), value < 2p
        return _cond_sub(t, p)

    def mont_sq(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, a)

    def to_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, self.r2_limbs)

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, self.one_limbs)

    # ---- inversion / division ----------------------------------------------
    def mont_inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Inverse in Montgomery form: inv(aR) = a^-1 R.  Zero maps to zero
        (matching the reference FieldElement::inverse)."""
        if self._pallas_ok(a.shape, min_batch=0):
            from .pallas_mul import mont_pow_pallas

            return mont_pow_pallas(a, self.params.modulus - 2, self.params)
        # Fermat: (aR)^(p-2) scaled appropriately.  Working purely in
        # Montgomery ops: pow_mont(x, p-2) computes x^(p-2) R^-(p-3)... easier:
        # define mpow on Montgomery values: result starts at R (the Montgomery
        # one) and mont_mul chains keep everything in Montgomery form, yielding
        # (a^(p-2)) in Montgomery form = a^-1 R since a^(p-2) = a^-1.
        acc0 = jnp.broadcast_to(self.r_limbs, a.shape).astype(jnp.uint32)

        def body(acc, bit):
            acc = self.mont_sq(acc)
            acc = jnp.where(bit, self.mont_mul(acc, a), acc)
            return acc, None

        acc, _ = jax.lax.scan(body, acc0, self.inv_exp_bits)
        # a == 0 -> result 0
        is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
        return jnp.where(is_zero, jnp.zeros_like(acc), acc)

    def mont_batch_inv(
        self, a: jnp.ndarray, axis: int = -2, max_scan: int = 256
    ) -> jnp.ndarray:
        """Montgomery's batch-inversion trick along ``axis``: log-depth
        prefix/suffix product scans amortize ONE Fermat chain over the whole
        axis (~(4·G + 380/G)·B montmuls instead of ~380·G·B for G values per
        instance).  Zero maps to zero, matching ``mont_inv``.

        The scan axis should be a per-instance axis (gates per level, group
        chunks), never the sharded batch axis — cross-element products along
        a mesh-sharded axis would compile to collectives.

        Axes longer than ``max_scan`` are processed in sequential chunks
        (one lax.scan step per chunk): the associative-scan intermediates
        carry the full (..., 128-lane-padded) panel, and one big scan over
        thousands of gates at batch 2048 held ~14 GB of 8x-padded temps —
        chunking bounds the peak at one chunk's worth.
        """
        if a.shape[axis] == 1:
            return self.mont_inv(a)
        a_m = jnp.moveaxis(a, axis, 0)  # (G, ..., L)
        G = a_m.shape[0]
        if G > max_scan:
            gc = max_scan
            C = -(-G // gc)
            pad = C * gc - G
            if pad:
                one = jnp.broadcast_to(
                    self.r_limbs, (pad,) + a_m.shape[1:]
                ).astype(jnp.uint32)
                a_m = jnp.concatenate([a_m, one], axis=0)
            chunks = a_m.reshape((C, gc) + a_m.shape[1:])

            def body(_, chunk):
                return None, self._batch_inv_axis0(chunk)

            _, inv = jax.lax.scan(body, None, chunks)
            inv = inv.reshape((C * gc,) + inv.shape[2:])[:G]
        else:
            inv = self._batch_inv_axis0(a_m)
        return jnp.moveaxis(inv, 0, axis)

    def _batch_inv_axis0(self, a_m: jnp.ndarray) -> jnp.ndarray:
        """Batch inversion along axis 0 (the prefix/suffix-product core)."""
        # Trace-time telemetry: lets benches/tests assert the batched trick
        # (one amortized Fermat chain) ran instead of per-value chains.
        global BATCH_INV_TRACES
        BATCH_INV_TRACES += 1
        is_zero = jnp.all(a_m == 0, axis=-1, keepdims=True)
        one = jnp.broadcast_to(self.r_limbs, a_m.shape).astype(jnp.uint32)
        b = jnp.where(is_zero, one, a_m)
        prefix = jax.lax.associative_scan(self.mont_mul, b, axis=0)
        suffix = jax.lax.associative_scan(self.mont_mul, b, axis=0, reverse=True)
        total_inv = self.mont_inv(prefix[-1])  # (..., L)
        # inv[i] = prefix[i-1] * suffix[i+1] * total_inv  (empty product = one)
        pre = jnp.concatenate([one[:1], prefix[:-1]], axis=0)
        suf = jnp.concatenate([suffix[1:], one[:1]], axis=0)
        inv = self.mont_mul(self.mont_mul(pre, suf), total_inv[None])
        return jnp.where(is_zero, jnp.zeros_like(inv), inv)

    def mont_inv_grouped(self, a: jnp.ndarray, group: int = 32) -> jnp.ndarray:
        """Batch-invert a flat (..., L) array by folding the trailing batch
        axis into groups of up to ``group`` and amortizing one Fermat chain
        per group (see ``mont_batch_inv``).  Picks the largest power of two
        ≤ ``group`` that divides the axis so no padding (and, under a mesh,
        no resharding) is ever needed; falls back to plain inversion when the
        axis is odd or too small."""
        if a.ndim < 2:
            return self.mont_inv(a)
        n = a.shape[-2]
        g = 1
        while g < group and n % (g * 2) == 0:
            g *= 2
        if g == 1:
            return self.mont_inv(a)
        folded = a.reshape(a.shape[:-2] + (n // g, g, NUM_LIMBS))
        inv = self.mont_batch_inv(folded, axis=-2)
        return inv.reshape(a.shape)

    def mont_div(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, self.mont_inv(b))

    # ---- predicates ----------------------------------------------------------
    @staticmethod
    def is_zero(a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=-1)

    @staticmethod
    def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)

    # ---- bit/byte views (for range checks and hash gadgets) -----------------
    @staticmethod
    def num_bits_leq(a: jnp.ndarray, num_bits: int) -> jnp.ndarray:
        """value < 2^num_bits, elementwise (the RANGE constraint)."""
        full_limbs = num_bits // LIMB_BITS
        rem = num_bits % LIMB_BITS
        ok = jnp.ones(a.shape[:-1], dtype=jnp.bool_)
        if full_limbs < NUM_LIMBS:
            if rem:
                ok = ok & (a[..., full_limbs] < (1 << rem))
                start = full_limbs + 1
            else:
                start = full_limbs
            if start < NUM_LIMBS:
                ok = ok & jnp.all(a[..., start:] == 0, axis=-1)
        return ok

    @staticmethod
    def mask_bits(a: jnp.ndarray, num_bits: int) -> jnp.ndarray:
        """a mod 2^num_bits on limbs."""
        full_limbs = num_bits // LIMB_BITS
        rem = num_bits % LIMB_BITS
        idx = jnp.arange(NUM_LIMBS)
        keep_full = idx < full_limbs
        partial = idx == full_limbs
        mask = jnp.where(keep_full, MASK, 0).astype(jnp.uint32)
        if rem:
            mask = jnp.where(partial, (1 << rem) - 1, mask).astype(jnp.uint32)
        return a & mask


# ---------------------------------------------------------------------------
# free helpers
# ---------------------------------------------------------------------------


def _ext1(a: jnp.ndarray) -> jnp.ndarray:
    """Append one zero limb (room for a 2^256 carry on wide moduli)."""
    return jnp.concatenate(
        [a, jnp.zeros(a.shape[:-1] + (1,), dtype=a.dtype)], axis=-1
    )


def _carry_propagate(t: jnp.ndarray) -> jnp.ndarray:
    """Normalize (..., NUM_LIMBS) accumulations into canonical 16-bit limbs.
    Any carry out of the top limb is discarded (callers guarantee it encodes a
    multiple of 2^256 that was introduced by two's-complement negation)."""
    out = []
    carry = jnp.zeros(t.shape[:-1], dtype=jnp.uint32)
    for i in range(t.shape[-1]):
        v = t[..., i] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(out, axis=-1)


def _carry_propagate_wide(t: jnp.ndarray) -> jnp.ndarray:
    """Normalize a (..., NUM_LIMBS+1) lazy accumulator; the value is known to
    be < 2p < 2^255 so the top limb ends up zero and is dropped."""
    out = []
    carry = jnp.zeros(t.shape[:-1], dtype=jnp.uint32)
    for i in range(t.shape[-1]):
        v = t[..., i] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(out[:NUM_LIMBS], axis=-1)


def _neg_limbs(a: jnp.ndarray) -> jnp.ndarray:
    """Two's complement of the 256-bit value: (2^256 - a) as unnormalized limbs
    (each limb complemented, +1 on the lowest).  Adding this is subtraction mod
    2^256 — combined with adding p and a final conditional reduction this
    implements modular subtraction."""
    comp = (~a) & MASK
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return comp + one


def _geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic a >= b on normalized limb arrays (broadcasts)."""
    a, b = jnp.broadcast_arrays(a, b)
    gt = a > b
    lt = a < b
    result = jnp.ones(a.shape[:-1], dtype=jnp.bool_)  # equal -> True
    # Scan from most significant limb down.
    decided = jnp.zeros(a.shape[:-1], dtype=jnp.bool_)
    for i in range(a.shape[-1] - 1, -1, -1):
        result = jnp.where(~decided & gt[..., i], True, result)
        result = jnp.where(~decided & lt[..., i], False, result)
        decided = decided | gt[..., i] | lt[..., i]
    return result


def _cond_sub(a: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """a - p where a >= p, else a.  a normalized, a < 2p."""
    need = _geq(a, p)[..., None]
    diff = _carry_propagate(a + _neg_limbs(jnp.broadcast_to(p, a.shape)))
    return jnp.where(need, diff, a)
