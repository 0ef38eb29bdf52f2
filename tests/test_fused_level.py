"""Fused gather->CIOS->scatter level kernel (tpu/fused_level.py).

TPU-only: the kernel manually DMAs witness rows between HBM and VMEM with
descriptor-driven indices, which only lowers through Mosaic.  The CPU suite
covers the same circuits through the legacy path (ACVM_TPU_NO_FUSED and
sub-1024 batches fall back automatically).

Covers the three integration surfaces the rows layout touches:
- pure arith-static levels (scan-grouped) solved by the fused kernel;
- a host stage (PermutationSort) fed from and written back into a
  rows-layout panel;
- BatchResult row reads off the device panel.
"""

import random

import numpy as np
import pytest
import jax

from acvm_tpu.acir import Circuit, Witness, WitnessMap
from acvm_tpu.acir import opcodes as ops
from acvm_tpu.acir.expression import Expression
from acvm_tpu.blackbox import StubBlackBoxSolver
from acvm_tpu.fields import FieldElement
from acvm_tpu.tpu import BatchSolver, plan_circuit
from acvm_tpu.utils import build_wide_arith_circuit, random_inputs

requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="fused level kernel needs TPU",
)

B = 1024  # fused-path batch granule


def _sequential_expect(circuit, inputs, witnesses):
    from acvm_tpu.pwg import ACVM, ACVMStatus

    wm = WitnessMap()
    for w, v in inputs.items():
        wm.insert(Witness(w), FieldElement(v))
    acvm = ACVM(StubBlackBoxSolver(), circuit.opcodes, wm)
    assert acvm.solve() == ACVMStatus.SOLVED
    solved = acvm.finalize()
    return [int(solved.get(Witness(w))) for w in witnesses]


@requires_tpu
def test_fused_path_matches_sequential():
    circuit = build_wide_arith_circuit(
        num_inputs=32, num_levels=3, gates_per_level=512
    )
    plan = plan_circuit(circuit)
    solver = BatchSolver(plan)
    inputs = random_inputs(circuit, B)
    result = solver.solve(inputs)
    assert result.ok.all()
    # rows layout reached the result (fused path actually engaged)
    assert not isinstance(result._W, np.ndarray) and result._W.ndim == 4
    last = circuit.current_witness_index
    got = result.witness_ints(last)
    for b in (0, 1, B - 1):
        assert got[b] == _sequential_expect(circuit, inputs[b], [last])[0], b


@requires_tpu
def test_fused_path_with_host_stage_roundtrip():
    """arith levels (fused, rows layout) -> PermutationSort host stage ->
    arith gate depending on the host output: exercises the rows-layout host
    read/write-back path."""
    one = FieldElement.one()
    w = Witness
    opcodes = []
    # 128 fused-sized static gates: w(2+i) = (2+i)*w1 + w2
    n_gates = 128
    for i in range(n_gates):
        opcodes.append(
            ops.OpcodeArithmetic(
                Expression(
                    linear_combinations=[
                        (FieldElement(2 + i), w(1)),
                        (one, w(2)),
                        (-one, w(3 + i)),
                    ]
                )
            )
        )
    sort_bit = w(3 + n_gates)
    final = w(4 + n_gates)
    # host stage: permutation sort of (w1, w2) -> control bit
    opcodes.append(
        ops.OpcodeDirective(
            ops.DirPermutationSort(
                inputs=[
                    [Expression.from_witness(w(1))],
                    [Expression.from_witness(w(2))],
                ],
                tuple_size=1,
                bits=[sort_bit],
                sort_by=[0],
            )
        )
    )
    # final = sort_bit + w(3) (depends on the host-stage output AND a
    # fused-level output)
    opcodes.append(
        ops.OpcodeArithmetic(
            Expression(
                linear_combinations=[
                    (one, sort_bit), (one, w(3)), (-one, final)
                ]
            )
        )
    )
    circuit = Circuit(
        current_witness_index=int(final),
        opcodes=opcodes,
        private_parameters={w(1), w(2)},
    )
    solver = BatchSolver(plan_circuit(circuit))
    assert solver._has_fused_levels  # the rows + host-stage path engages
    rng = random.Random(3)
    p = solver.plan.params.modulus
    inputs = [
        {1: rng.randrange(p), 2: rng.randrange(p)} for _ in range(B)
    ]
    result = solver.solve(inputs)
    assert result.ok.all()
    check = [3, 2 + n_gates, int(sort_bit), int(final)]
    for b in (0, 7, B - 1):
        want = _sequential_expect(circuit, inputs[b], check)
        got = [result.witness_ints(x)[b] for x in check]
        assert got == want, b


@requires_tpu
def test_chunked_solve_on_chip():
    """A batch larger than max_batch_per_pass streams through passes."""
    import os

    circuit = build_wide_arith_circuit(
        num_inputs=16, num_levels=2, gates_per_level=256
    )
    solver = BatchSolver(plan_circuit(circuit))
    inputs = random_inputs(circuit, 3 * B)
    os.environ["ACVM_TPU_MAX_BATCH_PER_PASS"] = str(B)
    try:
        result = solver.solve(inputs)
    finally:
        del os.environ["ACVM_TPU_MAX_BATCH_PER_PASS"]
    assert result.ok.shape[0] == 3 * B
    assert result.ok.all()
