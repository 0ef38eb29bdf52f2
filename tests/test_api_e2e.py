"""End-to-end executeCircuit conformance against the acvm_js test fixtures
(reference: acvm_js/test/shared/*.ts + test/node/execute_circuit.test.ts)."""

import pytest

from acvm_tpu.acir import Witness, WitnessMap
from acvm_tpu.api import (
    ExecutionError,
    compress_witness,
    decompress_witness,
    execute_circuit,
    get_public_parameters_witness,
    get_public_witness,
    get_return_witness,
)
from acvm_tpu.fields import FieldElement

import golden_vectors as gv


def witness_map(entries):
    wm = WitnessMap()
    for index, hex_value in entries.items():
        wm.insert(Witness(index), FieldElement.from_hex(hex_value))
    return wm


def as_dict(wm):
    return {int(w): v.to_hex() for w, v in wm}


def h(value):
    return FieldElement(value).to_hex()


def test_addition_circuit():
    initial = witness_map({1: h(1), 2: h(2)})
    solved = execute_circuit(gv.ADDITION_CIRCUIT, initial)
    assert solved.get(Witness(3)) == FieldElement(3)


def test_addition_return_witness_extraction():
    initial = witness_map({1: h(1), 2: h(2)})
    solved = execute_circuit(gv.ADDITION_CIRCUIT, initial)
    ret = get_return_witness(gv.ADDITION_CIRCUIT, solved)
    assert as_dict(ret) == {3: h(3)}


def test_memory_op_circuit():
    initial = witness_map({1: h(1), 2: h(1), 3: h(2)})
    solved = execute_circuit(gv.MEMORY_OP_CIRCUIT, initial)
    assert solved.get(Witness(4)) == FieldElement(2)


def test_fixed_base_scalar_mul_circuit():
    initial = witness_map({1: h(1), 2: h(0)})
    solved = execute_circuit(gv.FIXED_BASE_SCALAR_MUL_CIRCUIT, initial)
    assert solved.get(Witness(3)).to_hex() == gv.FIXED_BASE_1_0[0]
    assert solved.get(Witness(4)).to_hex() == gv.FIXED_BASE_1_0[1]


def test_pedersen_circuit():
    initial = witness_map({1: h(1)})
    solved = execute_circuit(gv.PEDERSEN_CIRCUIT, initial)
    # pedersen([1], 0) == pinned generator 0 (acvm_js/test/shared/pedersen.ts)
    assert (
        solved.get(Witness(2)).to_hex()
        == "09489945604c9686e698cb69d7bd6fc0cdb02e9faae3e1a433f1c342c1a5ecc4"
    )
    assert (
        solved.get(Witness(3)).to_hex()
        == "24f50d25508b4dfb1e8a834e39565f646e217b24cb3a475c2e4991d1bb07a9d8"
    )


def test_simple_foreign_call():
    # acvm_js/test/shared/foreign_call.ts: invert(5)
    calls = []

    def handler(name, inputs):
        calls.append((name, inputs))
        assert name == "invert"
        assert len(inputs) == 1 and len(inputs[0]) == 1
        return [inputs[0][0].inverse()]

    initial = witness_map({1: h(5)})
    solved = execute_circuit(gv.SIMPLE_BRILLIG_FOREIGN_CALL, initial, handler)
    assert (
        solved.get(Witness(2)).to_hex()
        == "135b52945a13d9aa49b9b57c33cd568ba9ae5ce9ca4a2d06e7f3fbd4c6666667"
    )
    assert len(calls) == 1


def test_complex_foreign_call():
    # acvm_js/test/shared/complex_foreign_call.ts
    def handler(name, inputs):
        assert name == "complex"
        assert [[int(v) for v in group] for group in inputs] == [[1, 2, 3], [6]]
        arr = [int(v) for v in inputs[0]]
        total = int(inputs[1][0])
        return [
            [a * i for a, i in zip(arr, (2, 3, 4))],  # [2, 6, 12]
            total,
            total * 2,
        ]

    initial = witness_map({1: h(1), 2: h(2), 3: h(3)})
    solved = execute_circuit(gv.COMPLEX_BRILLIG_FOREIGN_CALL, initial, handler)
    expected = {1: 1, 2: 2, 3: 3, 4: 2, 5: 6, 6: 12, 7: 6, 8: 12}
    for index, value in expected.items():
        assert solved.get(Witness(index)) == FieldElement(value)


def test_foreign_call_without_handler_errors():
    initial = witness_map({1: h(5)})
    with pytest.raises(ExecutionError):
        execute_circuit(gv.SIMPLE_BRILLIG_FOREIGN_CALL, initial)


def test_witness_compression_roundtrip():
    # acvm_js/test/shared/witness_compression.ts expected solved witness
    expected = witness_map(
        {
            1: h(1),
            2: h(2),
            3: "0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000",
            4: "0x30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000000",
            5: h(1),
            6: h(3),
        }
    )
    # Decompress the reference-produced bytes (gzip produced by flate2).
    reference_bytes = bytes(
        [
            31, 139, 8, 0, 0, 0, 0, 0, 2, 255, 173, 208, 187, 13, 128, 48, 12, 4,
            80, 190, 153, 199, 142, 237, 196, 238, 88, 133, 8, 103, 255, 17, 64,
            34, 5, 61, 62, 233, 164, 171, 94, 113, 105, 122, 51, 63, 61, 198, 134,
            127, 193, 37, 206, 202, 235, 199, 34, 40, 204, 94, 179, 35, 225, 9,
            217, 154, 10, 176, 180, 162, 168, 40, 42, 87, 86, 34, 87, 214, 106,
            205, 42, 24, 50, 57, 118, 49, 234, 3, 219, 2, 173, 61, 240, 175, 20,
            103, 209, 13, 151, 252, 77, 33, 208, 1, 0, 0,
        ]
    )
    assert decompress_witness(reference_bytes) == expected
    # Our own compression round-trips.
    assert decompress_witness(compress_witness(expected)) == expected


def test_public_witness_extraction():
    initial = witness_map({1: h(1), 2: h(0)})
    solved = execute_circuit(gv.FIXED_BASE_SCALAR_MUL_CIRCUIT, initial)
    ret = get_return_witness(gv.FIXED_BASE_SCALAR_MUL_CIRCUIT, solved)
    assert set(as_dict(ret)) == {3, 4}
    pub_params = get_public_parameters_witness(gv.FIXED_BASE_SCALAR_MUL_CIRCUIT, solved)
    assert as_dict(pub_params) == {}
    pub = get_public_witness(gv.FIXED_BASE_SCALAR_MUL_CIRCUIT, solved)
    assert set(as_dict(pub)) == {3, 4}


def test_unsatisfied_constraint_error_has_location():
    # addition circuit with a wrong claimed sum
    initial = witness_map({1: h(1), 2: h(2), 3: h(7)})
    with pytest.raises(ExecutionError) as exc:
        execute_circuit(gv.ADDITION_CIRCUIT, initial)
    assert exc.value.call_stack is not None
    assert str(exc.value.call_stack[0]) == "0"
