"""Unrolled-limb Pallas Montgomery multiply (v2).

The v1 kernel (`pallas_mul.py`) works on (16, M) panels with the limb index on
the *sublane* axis: every CIOS round slices rows (``t[0:1]``), shifts the limb
axis with ``jnp.concatenate`` (a sublane rotate), and issues (1, M) ops that
use one of eight sublanes.  Mosaic lowers each of those to relayout/copy ops —
measured cost ~20x the arithmetic (105M montmul/s vs the ~1.2e9 measured-peak
compute ceiling, see BASELINE.md "Roofline (corrected)").

v2 removes the limb axis from the arrays entirely: each of the 16 limbs is a
separate SSA value shaped (8, 128) — exactly one VPU vector register of batch
elements.  Consequences:

- every op in the kernel is a full-width vreg op (no (1, M) slices);
- the CIOS "shift the accumulator down one limb" step is pure Python list
  renaming — zero instructions;
- the modulus limbs are Python-int scalar immediates (vector x scalar ops),
  never broadcast vectors;
- per round only the two running hi-halves stay live, keeping register
  pressure near the 64-vreg file size.

Instruction mix per multiply: 16 rounds x ~165 lane-ops + ~32 normalize +
~115 conditional-subtract ≈ 2,800 lane-ops, all issue-eligible at the
measured ~3.6e12 lane-ops/s VPU peak (`benchmarks/vpu_rates.py`).

Reference semantics: bit-exact Montgomery product over the field modulus,
matching `acir_field/src/generic_ark.rs` multiplication via the Montgomery
representation used device-side (see `fields/jnp_ops.py`).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .params import FieldParams, BN254_FR, LIMB_BITS, NUM_LIMBS

MASK = (1 << LIMB_BITS) - 1
L = NUM_LIMBS
SUBLANES = 16  # sublane rows per limb tile (see sweep in BASELINE.md)
TILE = SUBLANES * 128  # batch elements per grid step


def _p_limbs(params: FieldParams) -> list[int]:
    return [(params.modulus >> (LIMB_BITS * i)) & MASK for i in range(L)]


def cios_unrolled(a, b, p_limbs: list[int], n0_inv: int):
    """CIOS Montgomery product on unrolled limb lists.

    ``a``/``b``: lists of L arrays (any common shape), limbs little-endian,
    values < 2^16 (carry-normalized) — or for ``a`` a list of L zero-arg
    callables (each limb is loaded lazily at the single round that consumes
    it, keeping register pressure inside the vreg file).  Returns L lazy
    accumulator arrays with limbs < 2^22 representing a value < 2p (given
    inputs < 2p).
    """
    n0 = jnp.uint32(n0_inv)
    zero = jnp.zeros_like(b[0])
    t = [zero] * L

    def m_times_p(m, j):
        """m * p_limbs[j] with the constant limbs folded: BN254's p has
        limb0 == 1 and limb1 == 0, saving 2 muls (and their lo/hi splits)
        per round."""
        c = p_limbs[j]
        if c == 0:
            return None  # contributes nothing
        if c == 1:
            return m  # m < 2^16: hi half is zero
        return m * c

    for i in range(L):
        ai = a[i]() if callable(a[i]) else a[i]
        prod0 = ai * b[0]
        s0 = t[0] + (prod0 & MASK)
        # (s0 * n0) mod 2^32 keeps the low 16 bits we need.
        m = (s0 * n0) & MASK
        mp0 = m_times_p(m, 0)
        mp0_lo = 0 if mp0 is None else (mp0 if p_limbs[0] == 1 else mp0 & MASK)
        carry0 = (s0 + mp0_lo) >> LIMB_BITS
        ph = prod0 >> LIMB_BITS
        mh = None if (mp0 is None or p_limbs[0] == 1) else mp0 >> LIMB_BITS
        nt = []
        for j in range(1, L):
            prod = ai * b[j]
            mp = m_times_p(m, j)
            v = t[j] + (prod & MASK) + ph
            if mp is not None:
                v = v + (mp if p_limbs[j] == 1 else mp & MASK)
            if mh is not None:
                v = v + mh
            ph = prod >> LIMB_BITS
            mh = (
                None
                if (mp is None or p_limbs[j] == 1)
                else mp >> LIMB_BITS
            )
            nt.append(v)
        nt[0] = nt[0] + carry0
        last = ph if mh is None else ph + mh
        nt.append(last)
        t = nt
    return t


def cios_multi(pairs, p_limbs: list[int], n0_inv: int):
    """Fused multi-multiplicand CIOS: one interleaved-reduction chain for
    ``sum_t a_t * b_t`` (Montgomery product of the SUM, i.e. returns
    ``(sum_t a_t*b_t) / R mod+ p``).

    Sharing the per-round ``m*p`` reduction, carry bookkeeping and the final
    normalize across all T terms is ~25-30% cheaper than T separate
    ``cios_unrolled`` chains + adds (each full chain re-pays the reduction
    half of every round).  This is the arithmetic-gate evaluation of
    acvm/src/pwg/arithmetic.rs:27-127 restructured as ONE Montgomery dot
    product instead of a sum of Montgomery products — identical value mod p.

    ``pairs``: list of (a, b); each ``a`` is a list of L limbs (arrays,
    scalars, or zero-arg callables — loaded lazily at the single round that
    consumes them), each ``b`` a list of L arrays.  All limbs carry-
    normalized 16-bit.  Values: a < p, b < 2p.

    Returns L lazy accumulator limbs.  Value bound: the represented value is
    < p + N/R with N = sum_t max(a_t)*max(b_t) (CIOS bound (N + (R-1)p)/R);
    callers must pick the reduce-chain bound via :func:`cios_multi_bound`.
    Intermediate limbs stay < 2^16*(2T+2)*L + carries << 2^32 for T <= 18
    (each live limb gains at most (2T+2) 16-bit addends per round over L
    rounds), so uint32 never overflows.
    """
    T = len(pairs)
    assert 1 <= T <= 18
    n0 = jnp.uint32(n0_inv)
    zero = jnp.zeros_like(pairs[0][1][0])
    t = [zero] * L

    def m_times_p(m, j):
        c = p_limbs[j]
        if c == 0:
            return None
        if c == 1:
            return m
        return m * c

    for i in range(L):
        a_is = [
            (a[i]() if callable(a[i]) else a[i]) for a, _ in pairs
        ]
        prods0 = [ai * b[0] for ai, (_, b) in zip(a_is, pairs)]
        s0 = t[0]
        for pr in prods0:
            s0 = s0 + (pr & MASK)
        # (s0 * n0) mod 2^32 keeps the low 16 bits we need (s0 may exceed
        # 2^16; only s0 mod 2^16 affects m).
        m = (s0 * n0) & MASK
        mp0 = m_times_p(m, 0)
        mp0_lo = 0 if mp0 is None else (mp0 if p_limbs[0] == 1 else mp0 & MASK)
        carry0 = (s0 + mp0_lo) >> LIMB_BITS
        phs = [pr >> LIMB_BITS for pr in prods0]
        mh = None if (mp0 is None or p_limbs[0] == 1) else mp0 >> LIMB_BITS
        nt = []
        for j in range(1, L):
            v = t[j]
            for k, (_, b) in enumerate(pairs):
                pr = a_is[k] * b[j]
                v = v + (pr & MASK) + phs[k]
                phs[k] = pr >> LIMB_BITS
            mp = m_times_p(m, j)
            if mp is not None:
                v = v + (mp if p_limbs[j] == 1 else mp & MASK)
            if mh is not None:
                v = v + mh
            mh = (
                None
                if (mp is None or p_limbs[j] == 1)
                else mp >> LIMB_BITS
            )
            nt.append(v)
        nt[0] = nt[0] + carry0
        last = phs[0]
        for ph in phs[1:]:
            last = last + ph
        if mh is not None:
            last = last + mh
        nt.append(last)
        t = nt
    return t


def cios_multi_bound(params: FieldParams, n_lin: int, n_mul: int) -> int:
    """Reduce-chain bound (multiples of p) for a :func:`cios_multi` result
    over ``n_lin`` (coeff < p) x (value < p) pairs plus ``n_mul``
    (coeff < p) x (product < 2p) pairs, PLUS one extra < p addend (qc).
    Exact ceiling of (2p + N/R) / p."""
    R = 1 << (LIMB_BITS * L)
    p = params.modulus
    N = n_lin * (p - 1) * (p - 1) + n_mul * (p - 1) * (2 * p - 1)
    return 2 + -(-N // (R * p))


def normalize(t):
    """Propagate carries: lazy limbs (< 2^22) -> canonical 16-bit limbs."""
    out = []
    carry = None
    for j in range(L):
        v = t[j] if carry is None else t[j] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return out


def cond_sub(r, p_limbs: list[int]):
    """One conditional subtract of p: input < 2p (16-bit limbs) -> < p.

    Computes r + (~p + 1) with a carry chain; the carry out of the top limb
    is 1 exactly when r >= p, selecting the subtracted value.
    """
    comp = [(~x) & MASK for x in p_limbs]
    diff = []
    carry = jnp.ones_like(r[0])
    for j in range(L):
        v = r[j] + comp[j] + carry
        diff.append(v & MASK)
        carry = v >> LIMB_BITS
    take = carry  # 0 or 1
    keep = 1 - take
    return [d * take + o * keep for d, o in zip(diff, r)]


def mont_mul_tiles(a, b, params: FieldParams):
    """Full reduced product on unrolled limb lists (inputs < p)."""
    pl_ = _p_limbs(params)
    return cond_sub(normalize(cios_unrolled(a, b, pl_, params.n0_inv)), pl_)


def _make_mul_kernel(params: FieldParams, reduce: bool):
    pl_ = _p_limbs(params)
    n0 = params.n0_inv

    def kernel(a_ref, b_ref, out_ref):
        # a[i] is consumed by exactly one round: load it there, not up front.
        a = [(lambda j=j: a_ref[0, j]) for j in range(L)]
        b = [b_ref[0, j] for j in range(L)]
        r = normalize(cios_unrolled(a, b, pl_, n0))
        if reduce:
            r = cond_sub(r, pl_)
        for j in range(L):
            out_ref[0, j] = r[j]

    return kernel


def to_tiled(x: jnp.ndarray, sublanes: int = SUBLANES) -> tuple[jnp.ndarray, int]:
    """(N, L) -> (G, L, S, 128) limb-major vreg tiles (pads N up)."""
    n = x.shape[0]
    tile = sublanes * 128
    g = max(1, (n + tile - 1) // tile)
    padded = g * tile
    if padded != n:
        x = jnp.pad(x, [(0, padded - n), (0, 0)])
    return (
        x.reshape(g, sublanes, 128, L).transpose(0, 3, 1, 2),
        n,
    )


def from_tiled(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """(G, L, S, 128) -> (N, L)."""
    g, _, s, lanes = x.shape
    return x.transpose(0, 2, 3, 1).reshape(g * s * lanes, L)[:n]


@partial(jax.jit, static_argnames=("reduce", "params"))
def mont_mul_tiled(
    a: jnp.ndarray,
    b: jnp.ndarray,
    reduce: bool = True,
    params: FieldParams = BN254_FR,
):
    """(G, L, S, 128) x (G, L, S, 128) -> same shape Montgomery product.

    With ``reduce=False`` the result is the redundant representative < 2p
    (carry-normalized 16-bit limbs): valid input to further multiplies, one
    ``cond_sub`` short of canonical.  Works for any field whose 2p fits in
    NUM_LIMBS*LIMB_BITS bits (both reference fields: BN254 Fr and BLS12-381
    Fr, acir_field/src/lib.rs:27-40); ``params`` keys the jit/kernel cache.
    """
    g, _, s, _ = a.shape
    spec = pl.BlockSpec((1, L, s, 128), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_mul_kernel(params, reduce),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        grid=(g,),
        in_specs=[spec, spec],
        out_specs=spec,
    )(a, b)


def mont_mul_pallas_v2(
    a: jnp.ndarray, b: jnp.ndarray, params: FieldParams = BN254_FR
) -> jnp.ndarray:
    """(N, 16) x (N, 16) -> (N, 16) Montgomery product.

    Drop-in equivalent of v1 ``mont_mul_pallas``; relayout to vreg tiles is
    done by XLA outside the kernel (one HBM pass, amortized against the
    ~2,800 lane-ops of compute per element).
    """
    at, n = to_tiled(a.reshape(-1, L))
    bt, _ = to_tiled(b.reshape(-1, L))
    out = mont_mul_tiled(at, bt, params=params)
    return from_tiled(out, n).reshape(a.shape)


# ---------------------------------------------------------------------------
# Fused expression-panel evaluation (the solve hot path)
# ---------------------------------------------------------------------------

def _k_max(params: FieldParams) -> int:
    """Largest k with k*p < 2^256 (clamped to the 4p/2p/p reduce chain):
    a normalized accumulator may hold values < k*p without losing the top
    carry out of limb 15.  BN254 (p ~ 0.19 * 2^256): 5."""
    return min(8, ((1 << 256) - 1) // params.modulus)


def _cp_limbs(params: FieldParams, mult: int) -> list[int]:
    v = params.modulus * mult
    assert v < (1 << 256)
    return [(v >> (LIMB_BITS * i)) & MASK for i in range(L)]


def _reduce_full(r, params: FieldParams, bound_p: int):
    """Normalized 16-bit-limb value < bound_p * p -> canonical < p via a
    conditional-subtract chain of 4p / 2p / p (bound_p <= 8)."""
    assert bound_p <= 8
    for mult in (4, 2, 1):
        if bound_p > mult:
            r = cond_sub(r, _cp_limbs(params, mult))
    return r


def _lane_bcast(row, tb):
    """(TE,) per-gate lane vector -> (TB, TE) broadcast across the batch
    sublanes (gates ride the 128 lanes; batch rides sublanes)."""
    return jnp.broadcast_to(row[None, :], (tb, row.shape[0]))


def _make_dot_kernel_v2(
    params: FieldParams, n_lin: int, n_mul: int, has_scale: bool, tb: int
):
    pl_ = _p_limbs(params)
    n0 = params.n0_inv

    def kernel(*refs):
        i = 0
        lin_ref = coeff_l_ref = None
        mul1_ref = mul2_ref = coeff_m_ref = None
        if n_lin:
            lin_ref, coeff_l_ref = refs[i], refs[i + 1]
            i += 2
        if n_mul:
            mul1_ref, mul2_ref, coeff_m_ref = refs[i], refs[i + 1], refs[i + 2]
            i += 3
        qc_ref = refs[i]
        i += 1
        scale_ref = None
        if has_scale:
            scale_ref = refs[i]
            i += 1
        out_ref = refs[i]

        multi_bound = cios_multi_bound(params, n_lin, n_mul)
        if (n_lin or n_mul) and multi_bound <= 8:
            # Fused-reduction evaluation: every term joins ONE cios_multi
            # chain (shared per-round m*p reduction and carries) and qc joins
            # the lazy accumulator before the single normalize — ~25-30%
            # fewer vreg-ops than per-term chains at the common 2-3 terms.
            pairs = []
            for t in range(n_lin):
                a = [(lambda j=j, t=t: _lane_bcast(coeff_l_ref[t, j], tb))
                     for j in range(L)]
                b = [lin_ref[t, j] for j in range(L)]
                pairs.append((a, b))
            for t in range(n_mul):
                v1 = [mul1_ref[t, j] for j in range(L)]
                v2 = [mul2_ref[t, j] for j in range(L)]
                prod = normalize(cios_unrolled(v1, v2, pl_, n0))  # < 2p
                a = [(lambda j=j, t=t: _lane_bcast(coeff_m_ref[t, j], tb))
                     for j in range(L)]
                pairs.append((a, prod))
            lazy = cios_multi(pairs, pl_, n0)
            lazy = [lazy[j] + _lane_bcast(qc_ref[j], tb) for j in range(L)]
            r = _reduce_full(normalize(lazy), params, multi_bound)
        else:
            # Per-term chains: constant-only panels and very wide gates whose
            # fused bound would exceed the 4p/2p/p reduce chain.
            acc = [_lane_bcast(qc_ref[j], tb) for j in range(L)]
            bound = 1
            k_max = _k_max(params)

            def add_term(acc, bound, term):
                if bound + 1 > k_max:
                    acc = _reduce_full(normalize(acc), params, bound)
                    bound = 1
                return [x + y for x, y in zip(acc, term)], bound + 1

            for t in range(n_lin):
                a = [(lambda j=j: _lane_bcast(coeff_l_ref[t, j], tb))
                     for j in range(L)]
                b = [lin_ref[t, j] for j in range(L)]
                term = cond_sub(normalize(cios_unrolled(a, b, pl_, n0)), pl_)
                acc, bound = add_term(acc, bound, term)

            for t in range(n_mul):
                v1 = [mul1_ref[t, j] for j in range(L)]
                v2 = [mul2_ref[t, j] for j in range(L)]
                prod = normalize(cios_unrolled(v1, v2, pl_, n0))  # < 2p
                a = [(lambda j=j: _lane_bcast(coeff_m_ref[t, j], tb))
                     for j in range(L)]
                term = cond_sub(
                    normalize(cios_unrolled(a, prod, pl_, n0)), pl_
                )
                acc, bound = add_term(acc, bound, term)

            r = _reduce_full(normalize(acc), params, bound)
        if has_scale:
            s = [(lambda j=j: _lane_bcast(scale_ref[j], tb))
                 for j in range(L)]
            r = cond_sub(normalize(cios_unrolled(s, r, pl_, n0)), pl_)
        for j in range(L):
            out_ref[j] = r[j]

    return kernel


def _pad_to(x, axis, mult):
    n = x.shape[axis]
    if n % mult == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, mult - n % mult)
    return jnp.pad(x, pad)


def mont_dot_pallas_v2(
    lin_vals: jnp.ndarray | None,
    lin_coeff: jnp.ndarray | None,
    mul_vals1: jnp.ndarray | None,
    mul_vals2: jnp.ndarray | None,
    mul_coeff: jnp.ndarray | None,
    qc: jnp.ndarray,
    scale: jnp.ndarray | None = None,
    params: FieldParams = BN254_FR,
    tile_b: int = 8,
    tile_e: int = 128,
) -> jnp.ndarray:
    """Fully fused expression-panel evaluation (unrolled-limb kernel):

        out[b, e] = [scale[e] *R] ( qc[e]
                    + sum_t lcoeff[e, t] *R lvals[b, e, t]
                    + sum_k mcoeff[e, k] *R (m1[b, e, k] *R m2[b, e, k]) )

    ``*R`` is the Montgomery product; lin/mul coefficients are pre-scaled
    c*R / c*R^2 as in v1 ``mont_dot_pallas``.  Unlike v1, the quadratic
    witness*witness pre-multiply happens INSIDE the kernel (chained CIOS with
    VMEM-resident accumulators), so the whole gate costs one HBM pass.

    Shapes: lin_vals (B, E, T1, 16); mul_vals* (B, E, T2, 16); coeffs
    (E, T*, 16); qc / scale (E, 16).  Returns (B, E, 16) canonical limbs.
    Mirrors the arithmetic-gate evaluation of acvm/src/pwg/arithmetic.rs.
    """
    some = lin_vals if lin_vals is not None else mul_vals1
    B, E = some.shape[0], some.shape[1]
    T1 = lin_vals.shape[2] if lin_vals is not None else 0
    T2 = mul_vals1.shape[2] if mul_vals1 is not None else 0
    # Gates ride the lanes (per-gate coefficients become natural lane
    # vectors, broadcast over sublanes); batch rides the sublanes.
    TE, TB = tile_e, tile_b

    def prep_vals(v):  # (B, E, T, L) -> (T, L, B, E) padded
        v = _pad_to(_pad_to(v, 0, TB), 1, TE)
        return v.transpose(2, 3, 0, 1)

    def prep_coeff(c):  # (E, T, L) -> (T, L, E) padded
        return _pad_to(jnp.asarray(c), 0, TE).transpose(1, 2, 0)

    def prep_row(x):  # (E, L) -> (L, E) padded
        return _pad_to(jnp.asarray(x), 0, TE).T

    args, in_specs = [], []

    def vspec(t):
        return pl.BlockSpec(
            (t, L, TB, TE), lambda b, e: (0, 0, b, e), memory_space=pltpu.VMEM
        )

    def cspec(t):
        return pl.BlockSpec(
            (t, L, TE), lambda b, e: (0, 0, e), memory_space=pltpu.VMEM
        )

    rspec = pl.BlockSpec((L, TE), lambda b, e: (0, e), memory_space=pltpu.VMEM)

    Ep = Bp = None
    if T1:
        lv = prep_vals(lin_vals)
        args += [lv, prep_coeff(lin_coeff)]
        in_specs += [vspec(T1), cspec(T1)]
        Bp, Ep = lv.shape[2], lv.shape[3]
    if T2:
        m1 = prep_vals(mul_vals1)
        args += [m1, prep_vals(mul_vals2), prep_coeff(mul_coeff)]
        in_specs += [vspec(T2), vspec(T2), cspec(T2)]
        Bp, Ep = m1.shape[2], m1.shape[3]
    args.append(prep_row(qc))
    in_specs.append(rspec)
    has_scale = scale is not None
    if has_scale:
        args.append(prep_row(scale))
        in_specs.append(rspec)
    grid = (Bp // TB, Ep // TE)

    out = pl.pallas_call(
        _make_dot_kernel_v2(params, T1, T2, has_scale, TB),
        out_shape=jax.ShapeDtypeStruct((L, Bp, Ep), jnp.uint32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (L, TB, TE), lambda b, e: (0, b, e), memory_space=pltpu.VMEM
        ),
    )(*args)
    return out.transpose(1, 2, 0)[:B, :E]
