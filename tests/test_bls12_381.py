"""BLS12-381 Fr validation — the reference's alternative field
(acir_field/src/lib.rs:27-40): device limb arithmetic differential against the
host field, and the engines end-to-end on a BLS12-381 circuit.

Values above the BN254 modulus are included on purpose: they reduce
differently in the two fields, so accidental BN254 binding fails loudly.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp

from acvm_tpu.acir import Circuit, Expression, Witness, WitnessMap
from acvm_tpu.acir import opcodes as ops
from acvm_tpu.config import EngineConfig
from acvm_tpu.fields import FieldElement
from acvm_tpu.fields.jnp_ops import LimbContext
from acvm_tpu.fields.limbs import ints_to_limbs, limbs_to_ints
from acvm_tpu.fields.params import BLS12_381_FR, BN254_FR

P = BLS12_381_FR.modulus
rng = random.Random(7)

CTX = LimbContext(BLS12_381_FR)


def rand_vals(n):
    vals = [rng.randrange(P) for _ in range(n - 4)]
    # BN254-vs-BLS discriminating values: p_bn254 reduces to itself here.
    vals += [0, 1, P - 1, BN254_FR.modulus]
    return vals


N = 16
A_INT = rand_vals(N)
B_INT = rand_vals(N)

_RESULTS = None


def results():
    global _RESULTS
    if _RESULTS is None:

        @jax.jit
        def pipeline(a, b):
            am, bm = CTX.to_mont(a), CTX.to_mont(b)
            return dict(
                add=CTX.add(a, b),
                sub=CTX.sub(a, b),
                neg=CTX.neg(a),
                prod=CTX.from_mont(CTX.mont_mul(am, bm)),
                inv=CTX.from_mont(CTX.mont_inv(am)),
                batch_inv=CTX.from_mont(CTX.mont_inv_grouped(am, group=8)),
                div=CTX.from_mont(CTX.mont_div(am, bm)),
            )

        out = pipeline(
            jnp.asarray(ints_to_limbs(A_INT)), jnp.asarray(ints_to_limbs(B_INT))
        )
        _RESULTS = {k: np.asarray(v) for k, v in out.items()}
    return _RESULTS


def test_limb_arithmetic_matches_host():
    got = results()
    assert limbs_to_ints(got["add"]) == [(a + b) % P for a, b in zip(A_INT, B_INT)]
    assert limbs_to_ints(got["sub"]) == [(a - b) % P for a, b in zip(A_INT, B_INT)]
    assert limbs_to_ints(got["neg"]) == [(-a) % P for a in A_INT]
    assert limbs_to_ints(got["prod"]) == [
        (a * b) % P for a, b in zip(A_INT, B_INT)
    ]
    expected_inv = [pow(a, -1, P) if a else 0 for a in A_INT]
    assert limbs_to_ints(got["inv"]) == expected_inv
    assert limbs_to_ints(got["batch_inv"]) == expected_inv
    assert limbs_to_ints(got["div"]) == [
        (a * pow(b, -1, P)) % P if b else 0 for a, b in zip(A_INT, B_INT)
    ]


def _bls_circuit():
    """w2 = w1^2 + 3; w3 solves w1*w3 = w2 + 1 (dynamic denominator)."""
    fe = lambda v: FieldElement(v, BLS12_381_FR)
    one = fe(1)
    w = lambda i: Witness(i)
    opcodes = [
        ops.OpcodeArithmetic(
            Expression(
                mul_terms=[(one, w(1), w(1))],
                linear_combinations=[(-one, w(2))],
                q_c=fe(3),
            )
        ),
        ops.OpcodeArithmetic(
            Expression(
                mul_terms=[(one, w(1), w(3))],
                linear_combinations=[(-one, w(2))],
                q_c=-one,
            )
        ),
    ]
    return Circuit(
        current_witness_index=3, opcodes=opcodes, private_parameters={w(1)}
    )


def _expected(x):
    w2 = (x * x + 3) % P
    # w1*w3 - w2 - 1 = 0  =>  w3 = (w2 + 1) / x
    w3 = ((w2 + 1) * pow(x, -1, P)) % P
    return w2, w3


def test_sequential_engine_bls12_381():
    from acvm_tpu.blackbox import GrumpkinSolver
    from acvm_tpu.pwg import ACVM, ACVMStatus

    x = BN254_FR.modulus + 12345  # reduces mod BLS only
    circuit = _bls_circuit()
    wm = WitnessMap()
    wm.insert(Witness(1), FieldElement(x, BLS12_381_FR))
    acvm = ACVM(GrumpkinSolver(), circuit.opcodes, wm)
    assert acvm.solve() == ACVMStatus.SOLVED
    solved = acvm.finalize()
    w2, w3 = _expected(x % P)
    assert int(solved.get(Witness(2))) == w2
    assert int(solved.get(Witness(3))) == w3


def test_batched_engine_bls12_381():
    config = EngineConfig(field="bls12_381")
    circuit = _bls_circuit()
    plan = config.plan(circuit)
    assert plan.params is BLS12_381_FR
    solver = config.solver(plan)
    xs = [rng.randrange(1, P) for _ in range(3)] + [BN254_FR.modulus + 99]
    result = solver.solve([{1: x} for x in xs])
    assert result.ok.all()
    for b, x in enumerate(xs):
        w2, w3 = _expected(x % P)
        assert result.witness_ints(2)[b] == w2
        assert result.witness_ints(3)[b] == w3


def test_bls12_381_routes_to_pallas(monkeypatch):
    """Since round 4 the fused Pallas kernel is parametrized over the field
    (the reference treats BLS12-381 Fr as first-class, acir_field/src/
    lib.rs:27-40): BLS batches route through the same fast path as BN254,
    and the jnp fallback stays bit-exact for the NO_PALLAS escape hatch."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from acvm_tpu.fields.jnp_ops import LimbContext
    from acvm_tpu.fields.limbs import ints_to_limbs, limbs_to_ints
    from acvm_tpu.fields.params import BLS12_381_FR

    ctx = LimbContext(BLS12_381_FR)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    assert ctx._pallas_ok((4096, 16)) == on_tpu  # the policy itself

    # Whatever path dispatches, mont_mul must be bit-exact at a
    # pallas-eligible batch size (on TPU this exercises the fused kernel).
    import random

    rng = random.Random(42)
    p = BLS12_381_FR.modulus
    r_inv = pow(BLS12_381_FR.r, -1, p)
    a_i = [rng.randrange(p) for _ in range(4096)]
    b_i = [rng.randrange(p) for _ in range(4096)]
    out = np.asarray(
        ctx.mont_mul(
            jnp.asarray(ints_to_limbs(a_i)), jnp.asarray(ints_to_limbs(b_i))
        )
    )
    got = limbs_to_ints(out)
    for i in range(0, 4096, 211):
        assert got[i] == a_i[i] * b_i[i] * r_inv % p

    # jnp fallback exactness (the ACVM_TPU_NO_PALLAS escape hatch).
    monkeypatch.setenv("ACVM_TPU_NO_PALLAS", "1")
    assert not ctx._pallas_ok((4096, 16))
    out2 = np.asarray(
        ctx.mont_mul(
            jnp.asarray(ints_to_limbs(a_i[:256])),
            jnp.asarray(ints_to_limbs(b_i[:256])),
        )
    )
    got2 = limbs_to_ints(out2)
    for i in range(0, 256, 17):
        assert got2[i] == a_i[i] * b_i[i] * r_inv % p
