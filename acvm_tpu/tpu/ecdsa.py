"""Batched device ECDSA verification over secp256k1 / secp256r1.

TPU-native replacement for the host verifiers (`acvm_tpu.blackbox.ecdsa`,
mirroring the reference ``blackbox_solver/src/lib.rs:101-210``): prehashed
message, low-S enforcement, exact error semantics.  Everything runs as
vectorized limb arithmetic over the instance batch:

* base-field and scalar-field ops use :class:`LimbContext` in *wide* mode
  (both moduli are 256-bit, one bit past the narrow BN254 layout);
* u1*G uses a precomputed windowed table of the curve generator; u2*Q is a
  batched double-and-add ladder (variable base);
* secp256r1's a = -3 flows through the general Jacobian doubling formula.

The host path *raises* on malformed inputs (off-curve key, out-of-range
scalars — the reference's unwrap panics); the batched analogue reports those
per instance in the ``err`` mask, while ``valid`` is the verification bit.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from ..blackbox.ec import SECP256K1, SECP256R1, Curve, CurveParams
from ..fields.jnp_ops import LimbContext, _geq
from ..fields.limbs import int_to_limbs
from ..fields.params import FieldParams, NUM_LIMBS
from .ec import (
    NUM_WINDOWS,
    WINDOW_BITS,
    bytes_be_to_limbs,
    fixed_base_mul,
    pt_add,
    pt_is_inf,
    pt_to_affine,
    scalar_mul,
)

CURVES = {"secp256k1": SECP256K1, "secp256r1": SECP256R1}


@lru_cache(maxsize=None)
def _curve_ctxs(curve_name: str) -> Tuple[LimbContext, LimbContext]:
    cp = CURVES[curve_name]
    ctx_p = LimbContext(FieldParams(name=f"{curve_name}_p", modulus=cp.p))
    ctx_n = LimbContext(FieldParams(name=f"{curve_name}_n", modulus=cp.n))
    return ctx_p, ctx_n


@lru_cache(maxsize=None)
def _gen_table_np(curve_name: str) -> np.ndarray:
    """Windowed multiples of the curve generator, Montgomery form over Fp:
    table[w][d] = d * 2^(4w) * G (d = 0 encodes infinity as zeros)."""
    cp = CURVES[curve_name]
    curve = Curve(cp)
    params = FieldParams(name=f"{curve_name}_p", modulus=cp.p)
    r, p = params.r, cp.p
    table = np.zeros((NUM_WINDOWS, 1 << WINDOW_BITS, 3, NUM_LIMBS), np.uint32)
    window_base = curve.generator()
    for w in range(NUM_WINDOWS):
        acc = None
        for d in range(1, 1 << WINDOW_BITS):
            acc = curve.add(acc, window_base)
            if acc is not None:
                table[w, d, 0] = int_to_limbs(acc[0] * r % p)
                table[w, d, 1] = int_to_limbs(acc[1] * r % p)
                table[w, d, 2] = int_to_limbs(r % p)
        for _ in range(WINDOW_BITS):
            window_base = curve.add(window_base, window_base)
    return table


def _const(value: int) -> jnp.ndarray:
    return jnp.asarray(int_to_limbs(value), dtype=jnp.uint32)


def _sub_once(a: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """a - m where a >= m else a (single conditional subtract, 16 limbs)."""
    from . import intops

    ge = intops.int_geq(a, m)
    return jnp.where(ge[..., None], intops.int_sub(a, m), a)


def ecdsa_verify_batched(
    curve_name: str,
    pub_x_bytes: jnp.ndarray,  # (B, 32) big-endian bytes as uint32
    pub_y_bytes: jnp.ndarray,  # (B, 32)
    sig_bytes: jnp.ndarray,  # (B, 64)  r || s
    msg_bytes: jnp.ndarray,  # (B, 32)  prehashed message
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(valid, err)`` boolean (B,) masks.

    ``err`` marks instances the host verifier would *raise* on (the
    reference's panicking unwraps — blackbox_solver/src/lib.rs:110-160):
    coordinate >= p, off-curve public key, r/s zero or >= n, z >= n.
    ``valid`` is the verification result (False for high-S, wrong R, or
    infinity), already masked False on erroring instances.
    """
    cp = CURVES[curve_name]
    ctx_p, ctx_n = _curve_ctxs(curve_name)

    x = bytes_be_to_limbs(pub_x_bytes)
    y = bytes_be_to_limbs(pub_y_bytes)
    r = bytes_be_to_limbs(sig_bytes[:, :32])
    s = bytes_be_to_limbs(sig_bytes[:, 32:])
    z = bytes_be_to_limbs(msg_bytes)

    p_limbs = _const(cp.p)
    n_limbs = _const(cp.n)
    is_zero = LimbContext.is_zero

    err = (
        _geq(x, p_limbs)
        | _geq(y, p_limbs)
        | _geq(r, n_limbs)
        | is_zero(r)
        | _geq(s, n_limbs)
        | is_zero(s)
        | _geq(z, n_limbs)
    )

    # Public key on the curve: y^2 == x^3 + a*x + b over Fp.
    xm = ctx_p.to_mont(x)
    ym = ctx_p.to_mont(y)
    mont = lambda v: _const(v % cp.p * ctx_p.params.r % cp.p)
    rhs = ctx_p.mont_mul(ctx_p.mont_mul(xm, xm), xm)
    a_mont = None
    if cp.a % cp.p:
        a_mont = mont(cp.a)
        rhs = ctx_p.add(rhs, ctx_p.mont_mul(a_mont, xm))
    rhs = ctx_p.add(rhs, jnp.broadcast_to(mont(cp.b), xm.shape))
    err = err | ~ctx_p.eq(ctx_p.mont_mul(ym, ym), rhs)

    # Low-S rule: s > n/2 verifies False (lib.rs:137-140).
    high_s = _geq(s, _const(cp.n // 2 + 1))

    # u1 = z/s, u2 = r/s mod n.
    s_inv = ctx_n.mont_inv_grouped(ctx_n.to_mont(s))  # s^-1 * R
    u1 = ctx_n.from_mont(ctx_n.mont_mul(ctx_n.to_mont(z), s_inv))
    u2 = ctx_n.from_mont(ctx_n.mont_mul(ctx_n.to_mont(r), s_inv))

    # R = u1*G + u2*Q.
    table = jnp.asarray(_gen_table_np(curve_name))
    u1G = fixed_base_mul(ctx_p, table, u1, a_mont)
    one_m = jnp.broadcast_to(_const(ctx_p.params.r % cp.p), xm.shape)
    Q = (xm, ym, one_m)
    u2Q = scalar_mul(ctx_p, Q, u2, a_mont)
    R = pt_add(ctx_p, u1G, u2Q, a_mont)

    inf = pt_is_inf(R)
    rx, _ = pt_to_affine(ctx_p, R)
    # R.x mod n: both curves have n <= p < 2n, one conditional subtract.
    rx_mod_n = _sub_once(rx, n_limbs)
    valid = ~high_s & ~inf & ctx_p.eq(rx_mod_n, r) & ~err
    return valid, err
