"""Device limb arithmetic vs the host FieldElement oracle (random vectors).

All device computation funnels through one jitted pipeline: in this
environment per-op eager dispatch is extremely slow, while a single compiled
graph (persisted in the JAX compilation cache) runs in milliseconds.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp

from acvm_tpu.fields import BN254_FR
from acvm_tpu.fields.jnp_ops import LimbContext
from acvm_tpu.fields.limbs import ints_to_limbs, limbs_to_ints

P = BN254_FR.modulus
rng = random.Random(42)


def rand_vals(n):
    vals = [rng.randrange(P) for _ in range(n - 3)]
    vals += [0, 1, P - 1]
    return vals


CTX = LimbContext(BN254_FR)
N = 16
A_INT = rand_vals(N)
B_INT = rand_vals(N)

RANGE_VALS = [0, 1, 255, 256, (1 << 32) - 1, 1 << 32, (1 << 33) - 1, P - 1]
RANGE_BITS = (1, 8, 16, 32, 33, 254)


@jax.jit
def _pipeline(a, b, range_vals):
    am, bm = CTX.to_mont(a), CTX.to_mont(b)
    return dict(
        add=CTX.add(a, b),
        sub=CTX.sub(a, b),
        neg=CTX.neg(a),
        mont_roundtrip=CTX.from_mont(am),
        prod=CTX.from_mont(CTX.mont_mul(am, bm)),
        inv=CTX.from_mont(CTX.mont_inv(am)),
        div=CTX.from_mont(CTX.mont_div(am, bm)),
        mask35=CTX.mask_bits(a, 35),
        is_zero=CTX.is_zero(a),
        eq=CTX.eq(a, a),
        ranges=jnp.stack(
            [CTX.num_bits_leq(range_vals, bits) for bits in RANGE_BITS]
        ),
    )


_RESULTS = None


def results():
    global _RESULTS
    if _RESULTS is None:
        out = _pipeline(
            jnp.asarray(ints_to_limbs(A_INT)),
            jnp.asarray(ints_to_limbs(B_INT)),
            jnp.asarray(ints_to_limbs(RANGE_VALS)),
        )
        _RESULTS = {k: np.asarray(v) for k, v in out.items()}
    return _RESULTS


def test_add():
    assert limbs_to_ints(results()["add"]) == [(a + b) % P for a, b in zip(A_INT, B_INT)]


def test_sub():
    assert limbs_to_ints(results()["sub"]) == [(a - b) % P for a, b in zip(A_INT, B_INT)]


def test_neg():
    assert limbs_to_ints(results()["neg"]) == [(-a) % P for a in A_INT]


def test_mont_roundtrip():
    assert limbs_to_ints(results()["mont_roundtrip"]) == A_INT


def test_mont_mul():
    assert limbs_to_ints(results()["prod"]) == [
        (a * b) % P for a, b in zip(A_INT, B_INT)
    ]


def test_mont_inv():
    assert limbs_to_ints(results()["inv"]) == [
        pow(a, -1, P) if a else 0 for a in A_INT
    ]


def test_mont_div():
    assert limbs_to_ints(results()["div"]) == [
        (a * pow(b, -1, P)) % P if b else 0 for a, b in zip(A_INT, B_INT)
    ]


def test_mask_bits():
    assert limbs_to_ints(results()["mask35"]) == [a & ((1 << 35) - 1) for a in A_INT]


def test_predicates():
    assert results()["is_zero"].tolist() == [a == 0 for a in A_INT]
    assert results()["eq"].all()


def test_range_check():
    got = results()["ranges"]
    for row, bits in enumerate(RANGE_BITS):
        assert got[row].tolist() == [v < (1 << bits) for v in RANGE_VALS], bits


def test_mont_batch_inv_matches_host():
    """Montgomery-trick batch inversion == per-element Fermat == host pow."""
    vals = rand_vals(24)  # includes 0, 1, p-1
    expected = [pow(v, -1, P) if v else 0 for v in vals]

    @jax.jit
    def run(a):
        am = CTX.to_mont(a)
        grid = am.reshape(4, 6, -1)
        return dict(
            axis1=CTX.from_mont(CTX.mont_batch_inv(grid, axis=1)).reshape(24, -1),
            axis0=CTX.from_mont(CTX.mont_batch_inv(grid, axis=0)).reshape(24, -1),
            grouped=CTX.from_mont(CTX.mont_inv_grouped(am, group=8)),
        )

    out = run(jnp.asarray(ints_to_limbs(vals)))
    assert limbs_to_ints(np.asarray(out["axis1"])) == expected
    assert limbs_to_ints(np.asarray(out["axis0"])) == expected
    assert limbs_to_ints(np.asarray(out["grouped"])) == expected


def test_mont_inv_grouped_odd_length_falls_back():
    vals = rand_vals(7)
    expected = [pow(v, -1, P) if v else 0 for v in vals]

    @jax.jit
    def run(a):
        return CTX.from_mont(CTX.mont_inv_grouped(CTX.to_mont(a)))

    out = run(jnp.asarray(ints_to_limbs(vals)))
    assert limbs_to_ints(np.asarray(out)) == expected
