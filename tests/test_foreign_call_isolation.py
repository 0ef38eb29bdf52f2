"""Foreign-call oracle results must be scoped to one execution / one instance.

The reference never reuses a solved opcode list: ``ACVM::new`` takes the
opcodes by value per execution (acvm/src/pwg/mod.rs:139-152) and acvm_js
deserializes a fresh circuit per ``executeCircuit`` (acvm_js/src/execute.rs:
44-55), so accumulated ``foreign_call_results`` die with the run.  Round-3
regression: results were appended to the *shared* opcode object, so a second
instance in a batch (and a second ``execute_circuit`` on the same in-memory
Circuit) silently replayed the first instance's oracle result.
"""

from __future__ import annotations

from acvm_tpu import brillig as br
from acvm_tpu.acir import opcodes as ops
from acvm_tpu.acir.circuit import Circuit
from acvm_tpu.acir.expression import Expression
from acvm_tpu.acir.witness import Witness
from acvm_tpu.api import execute_circuit, execute_circuit_batched
from acvm_tpu.fields.field import FieldElement


def w(i):
    return Witness(i)


def build_doubling_oracle_circuit() -> Circuit:
    """w2 = double_oracle(w1), via a Brillig ForeignCall."""
    brillig_data = ops.Brillig(
        inputs=[ops.BrilligInputSingle(Expression.from_witness(w(1)))],
        outputs=[ops.BrilligOutputSimple(w(2))],
        foreign_call_results=[],
        bytecode=[
            br.OpForeignCall(
                "double",
                destinations=(br.RomRegister(br.RegisterIndex(0)),),
                inputs=(br.RomRegister(br.RegisterIndex(0)),),
            ),
        ],
        predicate=None,
    )
    return Circuit(
        current_witness_index=2,
        opcodes=[ops.OpcodeBrillig(brillig_data)],
        private_parameters={w(1)},
    )


def doubling_handler(calls):
    def handler(name, inputs):
        assert name == "double"
        value = inputs[0][0]
        calls.append(int(value))
        return [value + value]

    return handler


def test_reexecuting_same_circuit_gets_fresh_oracle_results():
    circuit = build_doubling_oracle_circuit()
    calls = []
    handler = doubling_handler(calls)

    solved1 = execute_circuit(circuit, {1: 5}, handler)
    assert solved1.get(w(2)) == FieldElement(10)

    # Second execution of the *same in-memory* Circuit must call the oracle
    # again with the new input, not replay the cached result.
    solved2 = execute_circuit(circuit, {1: 9}, handler)
    assert solved2.get(w(2)) == FieldElement(18)
    assert calls == [5, 9]
    # The circuit-embedded replay list must be untouched.
    assert circuit.opcodes[0].brillig.foreign_call_results == []


def test_batched_instances_get_independent_oracle_results():
    circuit = build_doubling_oracle_circuit()
    calls = []
    handler = doubling_handler(calls)

    result = execute_circuit_batched(
        circuit, [{1: 5}, {1: 9}], foreign_call_handler=handler
    )
    assert list(result.ok) == [True, True]
    assert result.witness_ints(2) == [10, 18]
    assert sorted(calls) == [5, 9]
    assert circuit.opcodes[0].brillig.foreign_call_results == []


def test_embedded_results_still_replay():
    # A circuit that ships with pre-baked foreign_call_results (the wire
    # format supports this) must consume them without calling the handler.
    circuit = build_doubling_oracle_circuit()
    circuit.opcodes[0].brillig.foreign_call_results.append(
        br.ForeignCallResult.single(br.Value(FieldElement(14)))
    )
    solved = execute_circuit(circuit, {1: 7})
    assert solved.get(w(2)) == FieldElement(14)
    # And they are still there for the next run (not consumed destructively).
    solved2 = execute_circuit(circuit, {1: 7})
    assert solved2.get(w(2)) == FieldElement(14)
