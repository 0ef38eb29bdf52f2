"""Fused Montgomery-dot Pallas kernel vs python-int oracle.

The kernel (`acvm_tpu.fields.pallas_mul.mont_dot_pallas`) evaluates a whole
packed expression panel — per gate: T Montgomery multiplies, the modular-add
fold, q_c, and an optional final scale multiply — in one pallas_call.  It is
the hot path of the batched solver's `eval_exprs`, so it gets its own
bit-exactness test against arbitrary-precision ints (TPU only; the jnp
fallback path is covered by the differential tests in test_batch_solver.py).
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


def _expected(vals_i, coeff_i, qc_i, scale_i, b, e):
    acc = qc_i[e]
    for t in range(vals_i.shape[2]):
        acc = (acc + coeff_i[e, t] * vals_i[b, e, t] * R_INV) % P
    if scale_i is not None:
        acc = acc * scale_i[e] * R_INV % P
    return acc


@requires_tpu
@pytest.mark.parametrize(
    "B,E,T,with_scale",
    [
        (16, 256, 3, True),  # aligned tiles
        (8, 300, 2, False),  # E padded to the gate tile
        (5, 512, 1, True),  # B padded to the batch tile
    ],
)
def test_mont_dot_matches_ints(B, E, T, with_scale):
    from acvm_tpu.fields.pallas_mul import mont_dot_pallas

    rng = random.Random(1000 + B + E + T)
    vals, vals_i = _rand_panel(rng, (B, E, T))
    coeff, coeff_i = _rand_panel(rng, (E, T))
    qc, qc_i = _rand_panel(rng, (E,))
    scale, scale_i = (None, None)
    if with_scale:
        scale, scale_i = _rand_panel(rng, (E,))

    fn = jax.jit(lambda *a: mont_dot_pallas(*a))
    args = [jnp.asarray(vals), jnp.asarray(coeff), jnp.asarray(qc)]
    if with_scale:
        args.append(jnp.asarray(scale))
    else:
        args.append(None)
    out = np.asarray(fn(*args))

    checks = [(b, e) for b in range(0, B, max(1, B // 4))
              for e in range(0, E, max(1, E // 7))]
    for b, e in checks:
        got = limbs_to_int(out[b, e])
        want = _expected(vals_i, coeff_i, qc_i, scale_i, b, e)
        assert got == want, (b, e, hex(got), hex(want))


@requires_tpu
def test_mont_pow_inverse_matches_ints():
    from acvm_tpu.fields.pallas_mul import mont_pow_pallas

    rng = random.Random(4242)
    N = 2048 + 7  # exercises the pad path
    vals = [rng.randrange(P) for _ in range(N - 2)] + [0, 1]
    arr = np.zeros((N, NUM_LIMBS), np.uint32)
    for i, v in enumerate(vals):
        arr[i] = int_to_limbs(v * R % P)  # Montgomery form

    fn = jax.jit(lambda a: mont_pow_pallas(a, P - 2))
    out = np.asarray(fn(jnp.asarray(arr)))
    for i in range(0, N, 97):
        got = limbs_to_int(out[i]) * R_INV % P  # out is vals[i]^-1 * R
        want = pow(vals[i], -1, P) if vals[i] else 0
        assert got == want, (i, hex(got), hex(want))
    # explicit zero and one rows
    assert limbs_to_int(out[N - 2]) == 0
    assert limbs_to_int(out[N - 1]) * R_INV % P == 1
