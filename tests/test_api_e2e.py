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


# ---------------------------------------------------------------------------
# Barretenberg-compatibility tracking tests (expected failures, strict)
# ---------------------------------------------------------------------------
#
# Our Pedersen/Schnorr are bit-exact with barretenberg only for the pinned
# generators (<= 2 inputs, domain separator 0).  The generator-derivation
# blocker is documented in docs/pedersen_compat.md; these strict xfails make
# the ledger complete and flip LOUDLY the day a derivation lands.

# acvm_js/test/shared/schnorr_verify.ts: witnesses 1-2 = public key (x, y),
# 3-66 = signature bytes, 67-76 = message bytes 0..9; output witness 77 = 1.
_SCHNORR_PUB_X = "17cbd3ed3151ccfd170efe1d54280a6a4822640bf5c369908ad74ea21518a9c5"
_SCHNORR_PUB_Y = "0e0456e3795c1a31f20035b741cd6158929eeccd320d299cfcac962865a6bc74"
_SCHNORR_BYTES_3_76 = [
    5, 202, 31, 146, 81, 242, 246, 69, 43, 107, 249, 153, 198, 44, 14, 111,
    191, 121, 137, 166, 160, 103, 18, 181, 243, 233, 226, 95, 67, 16, 37, 128,
    85, 76, 19, 253, 30, 77, 192, 53, 138, 205, 69, 33, 236, 163, 83, 194, 84,
    137, 184, 221, 176, 121, 179, 27, 63, 70, 54, 16, 176, 250, 39, 239, 0, 1,
    2, 3, 4, 5, 6, 7, 8, 9,
]


@pytest.mark.xfail(
    strict=True,
    reason="Schnorr bit-exactness blocked on barretenberg Pedersen generator "
    "derivation (docs/pedersen_compat.md); signature was produced by "
    "barretenberg's construct_signature (wasm/schnorr.rs:18-103)",
)
def test_schnorr_verify_circuit():
    entries = {1: "0x" + _SCHNORR_PUB_X, 2: "0x" + _SCHNORR_PUB_Y}
    for i, v in enumerate(_SCHNORR_BYTES_3_76, start=3):
        entries[i] = h(v)
    solved = execute_circuit(gv.SCHNORR_VERIFY_CIRCUIT, witness_map(entries))
    assert solved.get(Witness(77)) == FieldElement(1)


@pytest.mark.xfail(
    strict=True,
    reason="pedersen with >2 inputs leaves the pinned-generator range "
    "(docs/pedersen_compat.md); barretenberg golden point for "
    "pedersen([1,1,1], 0) from pedersen_plookup_commit",
)
def test_pedersen_three_inputs_barretenberg_point():
    from acvm_tpu.blackbox import GrumpkinSolver

    # barretenberg's wasm/pedersen.rs golden test pins pedersen([1], 0); for
    # three inputs our generator set diverges from the plookup tables.  The
    # expected x below is the reference solver's own 2-input point chained --
    # i.e. deliberately NOT what our solver returns for 3 inputs; if the
    # derivation ever lands this must be replaced by the true golden vector
    # and will then pass.
    solver = GrumpkinSolver()
    x2, _ = solver.pedersen([FieldElement(1), FieldElement(1)], 0)
    x3, _ = solver.pedersen(
        [FieldElement(1), FieldElement(1), FieldElement(1)], 0
    )
    # Plookup-compatible 3-input commitments are NOT reachable from our
    # generator set today: assert the (currently impossible) compatibility
    # marker so the xfail flips loudly when generator derivation lands.
    assert solver.pedersen_barretenberg_compatible(3), (
        "3-input pedersen not barretenberg-compatible; x2=%s x3=%s"
        % (x2, x3)
    )
