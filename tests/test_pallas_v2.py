"""Unrolled-limb (v2) Pallas kernels vs python-int oracle.

`acvm_tpu.fields.pallas_mul_v2` holds each 16-bit limb as a separate
full-vector-register SSA value (no sublane slicing/relayouts — see the module
docstring), and fuses the quadratic witness*witness pre-multiply into the
expression-panel kernel.  These are the default device hot paths of
`eval_exprs` / `LimbContext.mont_mul`, so both get bit-exactness tests
against arbitrary-precision ints (TPU only; the jnp fallback is covered by
test_batch_solver.py's differentials).

Reference semantics: the arithmetic-gate evaluation of
acvm/src/pwg/arithmetic.rs:27-127 batched over instances.
"""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acvm_tpu.fields.params import BN254_FR, NUM_LIMBS
from acvm_tpu.fields.limbs import int_to_limbs, limbs_to_int

P = BN254_FR.modulus
R = BN254_FR.r
R_INV = pow(R, -1, P)

requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="pallas kernel needs TPU",
)


def _rand_panel(rng, shape):
    flat = [rng.randrange(P) for _ in range(int(np.prod(shape)))]
    arr = np.zeros(shape + (NUM_LIMBS,), np.uint32)
    for idx, v in zip(np.ndindex(*shape), flat):
        arr[idx] = int_to_limbs(v)
    ints = np.array(flat, dtype=object).reshape(shape)
    return arr, ints


@requires_tpu
def test_mont_mul_v2_bls12_381_matches_ints():
    """The fused kernel parametrized over the second reference field
    (acir_field/src/lib.rs:27-40 treats BLS12-381 Fr as first-class)."""
    from acvm_tpu.fields.params import BLS12_381_FR
    from acvm_tpu.fields.pallas_mul_v2 import mont_mul_pallas_v2

    p2 = BLS12_381_FR.modulus
    r2_inv = pow(BLS12_381_FR.r, -1, p2)
    rng = random.Random(7)
    n = 4096
    flat_a = [rng.randrange(p2) for _ in range(n)]
    flat_b = [rng.randrange(p2) for _ in range(n)]
    flat_a[:3] = [0, 1, p2 - 1]
    flat_b[:3] = [0, p2 - 1, p2 - 1]
    a = np.stack([np.asarray(int_to_limbs(v), np.uint32) for v in flat_a])
    b = np.stack([np.asarray(int_to_limbs(v), np.uint32) for v in flat_b])
    out = np.asarray(
        mont_mul_pallas_v2(jnp.asarray(a), jnp.asarray(b), params=BLS12_381_FR)
    )
    for i in range(0, n, 67):
        got = limbs_to_int(out[i])
        want = flat_a[i] * flat_b[i] * r2_inv % p2
        assert got == want, (i, hex(got), hex(want))


@requires_tpu
@pytest.mark.parametrize("n", [4096, 1024 + 13])  # aligned + padded
def test_mont_mul_v2_matches_ints(n):
    from acvm_tpu.fields.pallas_mul_v2 import mont_mul_pallas_v2

    rng = random.Random(n)
    a, a_i = _rand_panel(rng, (n,))
    b, b_i = _rand_panel(rng, (n,))
    # edge rows: 0, 1, p-1 pairs
    for row, (x, y) in enumerate([(0, 0), (1, P - 1), (P - 1, P - 1)]):
        a[row], b[row] = int_to_limbs(x), int_to_limbs(y)
        a_i[row], b_i[row] = x, y
    out = np.asarray(mont_mul_pallas_v2(jnp.asarray(a), jnp.asarray(b)))
    for i in range(0, n, max(1, n // 61)):
        got = limbs_to_int(out[i])
        want = a_i[i] * b_i[i] * R_INV % P
        assert got == want, (i, hex(got), hex(want))
    for row in range(3):
        assert limbs_to_int(out[row]) == a_i[row] * b_i[row] * R_INV % P


@requires_tpu
def test_mont_mul_tiled_lazy_is_valid_chain_input():
    """reduce=False output (< 2p) feeds another multiply bit-exactly."""
    from acvm_tpu.fields.pallas_mul_v2 import (
        from_tiled,
        mont_mul_tiled,
        to_tiled,
    )

    rng = random.Random(77)
    n = 2048
    a, a_i = _rand_panel(rng, (n,))
    b, b_i = _rand_panel(rng, (n,))
    at, _ = to_tiled(jnp.asarray(a))
    bt, _ = to_tiled(jnp.asarray(b))
    lazy = mont_mul_tiled(at, bt, reduce=False)  # a*b*R^-1, maybe + p
    out = np.asarray(from_tiled(mont_mul_tiled(lazy, bt), n))
    for i in range(0, n, 127):
        got = limbs_to_int(out[i])
        want = a_i[i] * b_i[i] * b_i[i] * R_INV * R_INV % P
        assert got == want, (i, hex(got), hex(want))


@requires_tpu
@pytest.mark.parametrize(
    "B,E,T1,T2,with_scale",
    [
        (8, 256, 3, 0, False),  # aligned, linear only (headline shape)
        (8, 256, 0, 2, False),  # quadratic only: in-kernel pre-multiply
        (5, 300, 2, 1, True),  # mixed + scale, B and E both padded
        (8, 128, 6, 0, False),  # bound > k_max: mid-chain re-reduction
    ],
)
def test_mont_dot_v2_matches_ints(B, E, T1, T2, with_scale):
    from acvm_tpu.fields.pallas_mul_v2 import mont_dot_pallas_v2

    rng = random.Random(9000 + B + E + T1 + 10 * T2)
    lv = lc = m1 = m2 = mc = None
    lv_i = lc_i = m1_i = m2_i = mc_i = None
    if T1:
        lv, lv_i = _rand_panel(rng, (B, E, T1))
        lc, lc_i = _rand_panel(rng, (E, T1))
    if T2:
        m1, m1_i = _rand_panel(rng, (B, E, T2))
        m2, m2_i = _rand_panel(rng, (B, E, T2))
        mc, mc_i = _rand_panel(rng, (E, T2))
    qc, qc_i = _rand_panel(rng, (E,))
    scale = scale_i = None
    if with_scale:
        scale, scale_i = _rand_panel(rng, (E,))

    j = lambda x: jnp.asarray(x) if x is not None else None
    out = np.asarray(
        jax.jit(
            lambda *a: mont_dot_pallas_v2(*a)
        )(j(lv), j(lc), j(m1), j(m2), j(mc), j(qc), j(scale))
    )

    for b in range(0, B, max(1, B // 3)):
        for e in range(0, E, max(1, E // 7)):
            acc = qc_i[e]
            for t in range(T1):
                acc = (acc + lc_i[e, t] * lv_i[b, e, t] * R_INV) % P
            for t in range(T2):
                # coeff *R (m1 *R m2) = c * m1 * m2 * R^-2
                acc = (
                    acc
                    + mc_i[e, t] * m1_i[b, e, t] * m2_i[b, e, t]
                    * R_INV * R_INV
                ) % P
            if with_scale:
                acc = acc * scale_i[e] * R_INV % P
            got = limbs_to_int(out[b, e])
            assert got == acc, (b, e, hex(got), hex(acc))
