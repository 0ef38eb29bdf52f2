"""Differential tests for the MXU expression-evaluation path
(acvm_tpu/fields/mxu_ops.py): exact bf16 limb-convolution einsum + constant-
matrix Montgomery reduction, vs Python big-int ground truth and vs the
sequential engine through the batch solver.
"""

import os
import random

import numpy as np
import pytest

import jax.numpy as jnp

from acvm_tpu.fields.params import BN254_FR
from acvm_tpu.fields.limbs import int_to_limbs, limbs_to_ints
from acvm_tpu.fields.mxu_ops import mont_dot_mxu, mxu_ok

P = BN254_FR.modulus
RV = (1 << 256) % P


def _limbs(v):
    return np.asarray(int_to_limbs(v), dtype=np.uint32)


def test_mont_dot_mxu_matches_ints():
    rng = random.Random(7)
    B, E, T = 4, 6, 8  # T at the exactness-bound maximum
    vals_i = [[[rng.randrange(P) for _ in range(T)] for _ in range(E)]
              for _ in range(B)]
    coeff_i = [[rng.randrange(P) for _ in range(T)] for _ in range(E)]
    qc_i = [rng.randrange(P) for _ in range(E)]

    vals = np.asarray(
        [[[_limbs(v) for v in row] for row in inst] for inst in vals_i]
    )
    coeff = np.asarray([[_limbs(c * RV % P) for c in row] for row in coeff_i])
    qc_r = np.asarray([_limbs(q * RV % P) for q in qc_i])

    out = np.asarray(
        mont_dot_mxu(jnp.asarray(vals), jnp.asarray(coeff), jnp.asarray(qc_r))
    )
    for b in range(B):
        got = limbs_to_ints(out[b])
        for e in range(E):
            expected = (
                qc_i[e]
                + sum(coeff_i[e][t] * vals_i[b][e][t] for t in range(T))
            ) % P
            assert got[e] == expected, (b, e)


def test_mont_dot_mxu_edge_values():
    """p-1 everywhere (worst-case limb magnitudes) and all-zeros."""
    B, E, T = 2, 3, 8
    pm1 = _limbs(P - 1)
    vals = np.broadcast_to(pm1, (B, E, T, 16)).copy()
    coeff = np.broadcast_to(_limbs((P - 1) * RV % P), (E, T, 16)).copy()
    qc_r = np.broadcast_to(_limbs((P - 1) * RV % P), (E, 16)).copy()
    out = np.asarray(
        mont_dot_mxu(jnp.asarray(vals), jnp.asarray(coeff), jnp.asarray(qc_r))
    )
    expected = ((P - 1) + T * (P - 1) * (P - 1)) % P
    for b in range(B):
        assert limbs_to_ints(out[b]) == [expected] * E

    zero = np.zeros((B, E, T, 16), np.uint32)
    out = np.asarray(
        mont_dot_mxu(jnp.asarray(zero), jnp.asarray(coeff),
                     jnp.asarray(np.zeros((E, 16), np.uint32)))
    )
    for b in range(B):
        assert limbs_to_ints(out[b]) == [0] * E


def test_mxu_ok_gating():
    assert not mxu_ok(BN254_FR, 4, 4, 9)  # too many terms
    assert not mxu_ok(BN254_FR, 4, 4, 0)
    # Opt-in: off without ACVM_TPU_MXU / ACVM_TPU_FORCE_MXU.
    os.environ.pop("ACVM_TPU_MXU", None)
    os.environ.pop("ACVM_TPU_FORCE_MXU", None)
    assert not mxu_ok(BN254_FR, 1024, 1024, 4)
    os.environ["ACVM_TPU_FORCE_MXU"] = "1"
    try:
        assert mxu_ok(BN254_FR, 1, 1, 4)
    finally:
        del os.environ["ACVM_TPU_FORCE_MXU"]


def test_batch_solver_mxu_matches_sequential(monkeypatch):
    """Force the MXU eval path at small shapes and check the solver still
    matches the sequential engine bit-for-bit (mixed lin+mul gates, static
    denominators folded at pack time)."""
    monkeypatch.setenv("ACVM_TPU_FORCE_MXU", "1")

    from acvm_tpu.acir import Witness, WitnessMap
    from acvm_tpu.acir.expression import Expression
    from acvm_tpu.acir import opcodes as ops
    from acvm_tpu.acir.circuit import Circuit
    from acvm_tpu.blackbox import StubBlackBoxSolver
    from acvm_tpu.fields import FieldElement
    from acvm_tpu.pwg import ACVM, ACVMStatus
    from acvm_tpu.tpu import BatchSolver, plan_circuit

    one = FieldElement.one()
    three = FieldElement(3)

    def w(i):
        return Witness(i)

    opcodes = [
        # w3 = 3*w1*w2 + w1 + 7  (solve w3; denominator -1 folded at pack)
        ops.OpcodeArithmetic(
            Expression(
                mul_terms=[(three, w(1), w(2))],
                linear_combinations=[(one, w(1)), (-one, w(3))],
                q_c=FieldElement(7),
            )
        ),
        # 5*w3 = 2*w2 + w4  (solve w4)
        ops.OpcodeArithmetic(
            Expression(
                linear_combinations=[
                    (FieldElement(5), w(3)),
                    (-FieldElement(2), w(2)),
                    (-one, w(4)),
                ]
            )
        ),
    ]
    circuit = Circuit(
        current_witness_index=4, opcodes=opcodes,
        private_parameters={w(1), w(2)},
    )
    solver = BatchSolver(plan_circuit(circuit))
    rng = random.Random(3)
    batch = [
        {1: rng.randrange(P), 2: rng.randrange(P)} for _ in range(4)
    ]
    result = solver.solve(batch)
    assert result.ok.all()
    for i, assignment in enumerate(batch):
        wm = WitnessMap()
        for k, v in assignment.items():
            wm.insert(Witness(k), FieldElement(v))
        acvm = ACVM(StubBlackBoxSolver(), circuit.opcodes, wm)
        assert acvm.solve() == ACVMStatus.SOLVED
        expected = acvm.finalize()
        assert result.witness_ints(3)[i] == int(expected.get(w(3)))
        assert result.witness_ints(4)[i] == int(expected.get(w(4)))
