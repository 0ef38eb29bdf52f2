"""MXU-based fused expression evaluation over BN254 Fr.

The VPU CIOS kernels (`pallas_mul.py`) are instruction-issue bound: ~3k int32
vector ops per Montgomery multiply.  This module instead routes the field
arithmetic of an expression panel through the MXU (the systolic array — where
the TPU's FLOPs actually are) using three exact-integer matmul facts:

1. **Limb convolution is a matmul against a Toeplitz matrix.**  With 8-bit
   limbs, `c * v` has convolution coefficients `sum_{i+j=k} c_i v_j`; for the
   per-gate coefficient `c` (shared across the instance batch) this is
   `Toeplitz(c) @ v` — an (E-batched) matmul with the batch on the N axis.
2. **bf16 x bf16 -> f32 MXU products are exact here.**  8-bit limbs are exact
   in bf16; products are < 2^16 and accumulate over at most 256 terms to
   < 2^24, inside f32's exact-integer range.
3. **Montgomery reduction (REDC) is linear and its two multiplies use
   CONSTANT matrices.**  REDC(X) = (X + m*p)/2^256 with m = X*N' mod 2^256
   (N' = -p^-1 mod 2^256): both `X*N' mod 2^256` (lower-triangular Toeplitz of
   N') and `m*p` (Toeplitz of p) are matmuls against matrices fixed by the
   field — shared across every gate, instance and level.  Linearity means ONE
   reduction per gate covers the whole linear combination:
   REDC(sum_t c_t*R * v_t + qc*R) = sum_t c_t v_t + qc.

So an entire expression panel — T Montgomery multiplies, the modular-add
fold and the constant term — becomes one einsum plus one constant-matrix
REDC, with only cheap carry bookkeeping on the VPU.

Bound analysis (all enforced by the T<=8 guard in `mxu_ok`):
- conv coefficients <= T*32*255^2 + 255 < 2^24 (f32-exact);
- X < T*p^2 + p*2^256 < 2^512 (fits 64 8-bit limbs);
- m normalized to limbs <= 256 => m < 2^257;
- result (X + m*p)/2^256 < (T/4 + 3.01)*p < 2^256 for T <= 8, reduced to
  canonical by conditional subtracts of 4p, 2p, p.

Reference semantics covered: the arithmetic-gate solve/check path of
`acvm/src/pwg/arithmetic.rs:27-127` (partial evaluation of degree-2
expressions), batched over instances.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .params import FieldParams, BN254_FR, LIMB_BITS, NUM_LIMBS

N8 = NUM_LIMBS * 2  # 8-bit limb count (32)
CONV = 2 * N8 - 1  # convolution output width (63)


@lru_cache(maxsize=None)
def _constants(modulus: int):
    """(NPT, PT, p4_2_1) for one modulus:

    - NPT (32, 32): lower-triangular Toeplitz of N' = -p^-1 mod 2^256, so that
      ``m = X_low @ NPT`` is X*N' truncated mod 2^256;
    - PT (32, 64): Toeplitz of p, so that ``m @ PT`` is m*p on 64 8-bit limbs;
    - p4_2_1: (3, 16) uint32 16-bit limb rows of 4p, 2p, p for the final
      conditional subtracts.
    """
    p = modulus
    n_prime = (-pow(p, -1, 1 << 256)) % (1 << 256)
    n8 = [(n_prime >> (8 * i)) & 0xFF for i in range(N8)]
    p8 = [(p >> (8 * i)) & 0xFF for i in range(N8)]
    npt = np.zeros((N8, N8), dtype=np.float32)
    pt = np.zeros((N8, 2 * N8), dtype=np.float32)
    for j in range(N8):
        for k in range(j, N8):
            npt[j, k] = n8[k - j]
        for i in range(N8):
            pt[j, j + i] = p8[i]
    mults = np.zeros((3, NUM_LIMBS), dtype=np.uint32)
    for row, mult in enumerate((4, 2, 1)):
        v = mult * p
        for i in range(NUM_LIMBS):
            mults[row, i] = (v >> (LIMB_BITS * i)) & 0xFFFF
    # numpy, not jnp: this cache must stay trace-free (a jnp constant created
    # under jit would leak a tracer into later calls).
    return npt, pt, mults


def split8(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 16) uint32 16-bit limbs -> (..., 32) int32 8-bit limbs (LE)."""
    x = x.astype(jnp.int32)
    lo = x & 0xFF
    hi = (x >> 8) & 0xFF
    return jnp.stack([lo, hi], axis=-1).reshape(*x.shape[:-1], N8)


def _shift_passes(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """n carry-save passes: limb_k = (x_k & 255) + (x_{k-1} >> 8).  Carries
    out of the top limb are dropped (callers size the limb array so the value
    fits, or — for the mod-2^256 `m` — dropping is the point)."""
    for _ in range(n):
        hi = x >> 8
        x = (x & 0xFF) + jnp.concatenate(
            [jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1
        )
    return x


def redc_mxu(conv: jnp.ndarray, params: FieldParams = BN254_FR) -> jnp.ndarray:
    """Montgomery-reduce (..., 63) int32 convolution coefficients (< 2^24) to
    canonical (..., 16) uint32 16-bit limbs of value*2^-256 mod p."""
    from .jnp_ops import _carry_propagate, _cond_sub

    npt_np, pt_np, p421_np = _constants(params.modulus)
    npt = jnp.asarray(npt_np, dtype=jnp.bfloat16)
    pt = jnp.asarray(pt_np, dtype=jnp.bfloat16)
    p421 = jnp.asarray(p421_np)

    x = jnp.concatenate(
        [conv, jnp.zeros_like(conv[..., :1])], axis=-1
    )  # (..., 64); X < 2^512 fits
    x = _shift_passes(x, 4)  # limbs <= 256

    m = jnp.einsum(
        "...j,jk->...k", x[..., :N8].astype(jnp.bfloat16), npt,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    m = _shift_passes(m, 4)  # limbs <= 256 => m < 2^257, m == X*N' mod 2^256

    mp = jnp.einsum(
        "...j,jk->...k", m.astype(jnp.bfloat16), pt,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # (..., 64)

    total = x + mp  # limbs < 2^21 + 256

    # X + m*p == 0 mod 2^256: only the carry out of the low 32 limbs survives.
    carry = jnp.zeros(total.shape[:-1], jnp.int32)
    for k in range(N8):
        carry = (total[..., k] + carry) >> 8
    hi = total[..., N8:].at[..., 0].add(carry)  # (..., 32), value < 5.01p

    # 8-bit -> 16-bit limbs, normalize, reduce below p.
    l16 = (hi[..., 0::2] + (hi[..., 1::2] << 8)).astype(jnp.uint32)
    l16 = _carry_propagate(l16)
    for row in range(3):  # subtract 4p, 2p, p conditionally
        l16 = _cond_sub(l16, p421[row])
    return l16


def toeplitz8(c8: jnp.ndarray) -> jnp.ndarray:
    """(..., 32) 8-bit limbs -> (..., 32, 63) bf16 Toeplitz: row j is the limb
    vector shifted j positions (so ``v8 @ T`` is the limb convolution)."""
    rows = [
        jnp.pad(c8, [(0, 0)] * (c8.ndim - 1) + [(j, N8 - 1 - j)])
        for j in range(N8)
    ]
    return jnp.stack(rows, axis=-2).astype(jnp.bfloat16)


def mont_dot_mxu(
    vals: jnp.ndarray,
    coeffs: jnp.ndarray,
    qc: jnp.ndarray,
    params: FieldParams = BN254_FR,
) -> jnp.ndarray:
    """Fused expression-panel evaluation on the MXU:

        out[b, e] = qc[e] + sum_t coeff[e, t] *R vals[b, e, t]

    ``vals`` (B, E, T, 16) uint32 (standard form); ``coeffs`` (E, T, 16)
    (Montgomery form, c*R — or c*R^2 when the matching panel holds v1*v2*R^-1
    products); ``qc`` (E, 16) **Montgomery form** (qc*R).  Returns (B, E, 16)
    standard-form limbs.  Requires T <= 8 (see module bound analysis).
    """
    B, E, T, L = vals.shape
    assert L == NUM_LIMBS and T <= 8, (vals.shape,)
    v8 = split8(vals).astype(jnp.bfloat16)  # (B, E, T, 32)
    ct = toeplitz8(split8(coeffs))  # (E, T, 32, 63)
    conv = jnp.einsum(
        "betj,etjk->bek", v8, ct, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    qc8 = split8(qc)  # (E, 32) int32, qc*R
    conv = conv.at[..., :N8].add(qc8[None])
    return redc_mxu(conv, params)


def mxu_ok(params: FieldParams, batch: int, gates: int, terms: int) -> bool:
    """Route an expression panel through the MXU path.

    Opt-in (ACVM_TPU_MXU=1): end-to-end on the 2^16-gate headline bench the
    narrow gates (2-3 terms) run FASTER on the fused Pallas VPU kernel
    (28.2M vs 22.3M witness-solves/s at B=256) — the per-gate reduction and
    Toeplitz materialization don't amortize at tiny T.  Isolated wide panels
    measure ~3x the Pallas kernel (T=4, E=8192: 2.5 ms vs 7.6 ms), so the
    path stays available for term-heavy workloads.  Force-on for differential
    tests (any backend): ACVM_TPU_FORCE_MXU=1.  Bounds: BN254, T <= 8 (f32
    exactness), batch big enough to feed the systolic array.
    """
    if params.name != "bn254" or terms > 8 or terms == 0:
        return False
    if os.environ.get("ACVM_TPU_FORCE_MXU"):
        return True
    if not os.environ.get("ACVM_TPU_MXU"):
        return False
    if batch * gates < 2048 or batch < 8:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
