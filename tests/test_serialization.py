"""Wire-format parity tests against the reference's pinned circuit bytes.

The reference pins gzip(bincode(Circuit)) byte vectors for a family of circuits
(acir/tests/test_program_serialization.rs).  gzip output is compressor-specific,
so parity is asserted at the bincode layer: gunzip(reference bytes) must equal
our serializer's bincode output exactly, and deserialization must round-trip.
"""

import gzip

from acvm_tpu.fields import FieldElement
from acvm_tpu.acir import (
    Circuit,
    Expression,
    PublicInputs,
    Witness,
    WitnessMap,
)
from acvm_tpu.acir import opcodes as ops
from acvm_tpu.acir.serialization import (
    circuit_from_bincode,
    circuit_to_bincode,
    compress_witness,
    decompress_witness,
    deserialize_circuit,
    serialize_circuit,
)
from acvm_tpu import brillig as br

import golden_vectors as gv


def one():
    return FieldElement.one()


def build_addition_circuit():
    addition = ops.OpcodeArithmetic(
        Expression(
            mul_terms=[],
            linear_combinations=[
                (one(), Witness(1)),
                (one(), Witness(2)),
                (-one(), Witness(3)),
            ],
            q_c=FieldElement.zero(),
        )
    )
    return Circuit(
        current_witness_index=4,
        opcodes=[addition],
        private_parameters={Witness(1), Witness(2)},
        return_values=PublicInputs({Witness(3)}),
    )


def build_fixed_base_circuit():
    op = ops.OpcodeBlackBoxFuncCall(
        ops.BBFixedBaseScalarMul(
            low=ops.FunctionInput(Witness(1), 128),
            high=ops.FunctionInput(Witness(2), 128),
            outputs=(Witness(3), Witness(4)),
        )
    )
    return Circuit(
        current_witness_index=5,
        opcodes=[op],
        private_parameters={Witness(1), Witness(2)},
        return_values=PublicInputs({Witness(3), Witness(4)}),
    )


def build_pedersen_circuit():
    op = ops.OpcodeBlackBoxFuncCall(
        ops.BBPedersen(
            inputs=[ops.FunctionInput(Witness(1), 254)],
            domain_separator=0,
            outputs=(Witness(2), Witness(3)),
        )
    )
    return Circuit(
        current_witness_index=4,
        opcodes=[op],
        private_parameters={Witness(1)},
        return_values=PublicInputs({Witness(2), Witness(3)}),
    )


def build_schnorr_circuit():
    signature = [ops.FunctionInput(Witness(i), 8) for i in range(3, 3 + 64)]
    message = [ops.FunctionInput(Witness(i), 8) for i in range(3 + 64, 3 + 64 + 10)]
    output = Witness(3 + 64 + 10)
    op = ops.OpcodeBlackBoxFuncCall(
        ops.BBSchnorrVerify(
            public_key_x=ops.FunctionInput(Witness(1), 254),
            public_key_y=ops.FunctionInput(Witness(2), 254),
            signature=signature,
            message=message,
            output=output,
        )
    )
    return Circuit(
        current_witness_index=100,
        opcodes=[op],
        private_parameters={Witness(i) for i in range(1, int(output))},
        return_values=PublicInputs({output}),
    )


def build_simple_brillig_circuit():
    brillig = ops.Brillig(
        inputs=[ops.BrilligInputSingle(Expression.from_witness(Witness(1)))],
        outputs=[ops.BrilligOutputSimple(Witness(2))],
        foreign_call_results=[],
        bytecode=[
            br.OpForeignCall(
                function="invert",
                destinations=(br.RomRegister(br.RegisterIndex(0)),),
                inputs=(br.RomRegister(br.RegisterIndex(0)),),
            )
        ],
        predicate=None,
    )
    return Circuit(
        current_witness_index=8,
        opcodes=[ops.OpcodeBrillig(brillig)],
        private_parameters={Witness(1), Witness(2)},
    )


def build_complex_brillig_circuit():
    a, b, c = Witness(1), Witness(2), Witness(3)
    brillig = ops.Brillig(
        inputs=[
            ops.BrilligInputArray(
                [Expression.from_witness(w) for w in (a, b, c)]
            ),
            ops.BrilligInputSingle(
                Expression(
                    linear_combinations=[(one(), a), (one(), b), (one(), c)],
                )
            ),
        ],
        outputs=[
            ops.BrilligOutputArray([Witness(4), Witness(5), Witness(6)]),
            ops.BrilligOutputSimple(Witness(7)),
            ops.BrilligOutputSimple(Witness(8)),
        ],
        foreign_call_results=[],
        bytecode=[
            br.OpForeignCall(
                function="complex",
                destinations=(
                    br.RomHeapArray(br.HeapArray(br.RegisterIndex(0), 3)),
                    br.RomRegister(br.RegisterIndex(1)),
                    br.RomRegister(br.RegisterIndex(2)),
                ),
                inputs=(
                    br.RomHeapArray(br.HeapArray(br.RegisterIndex(0), 3)),
                    br.RomRegister(br.RegisterIndex(1)),
                ),
            )
        ],
        predicate=None,
    )
    return Circuit(
        current_witness_index=8,
        opcodes=[ops.OpcodeBrillig(brillig)],
        private_parameters={a, b, c},
    )


def build_memory_op_circuit():
    init = ops.OpcodeMemoryInit(ops.BlockId(0), [Witness(1), Witness(2)])
    write = ops.OpcodeMemoryOp(
        ops.BlockId(0),
        ops.MemOp.write_to_mem_index(
            Expression.from_field(one()), Expression.from_witness(Witness(3))
        ),
        predicate=None,
    )
    read = ops.OpcodeMemoryOp(
        ops.BlockId(0),
        ops.MemOp.read_at_mem_index(Expression.from_field(one()), Witness(4)),
        predicate=None,
    )
    return Circuit(
        current_witness_index=5,
        opcodes=[init, write, read],
        private_parameters={Witness(1), Witness(2), Witness(3)},
        return_values=PublicInputs({Witness(4)}),
    )


GOLDEN_CASES = [
    (build_addition_circuit, gv.ADDITION_CIRCUIT),
    (build_fixed_base_circuit, gv.FIXED_BASE_SCALAR_MUL_CIRCUIT),
    (build_pedersen_circuit, gv.PEDERSEN_CIRCUIT),
    (build_schnorr_circuit, gv.SCHNORR_VERIFY_CIRCUIT),
    (build_simple_brillig_circuit, gv.SIMPLE_BRILLIG_FOREIGN_CALL),
    (build_complex_brillig_circuit, gv.COMPLEX_BRILLIG_FOREIGN_CALL),
    (build_memory_op_circuit, gv.MEMORY_OP_CIRCUIT),
]


def test_bincode_layer_byte_exact():
    for builder, golden in GOLDEN_CASES:
        circuit = builder()
        reference_bincode = gzip.decompress(golden)
        assert circuit_to_bincode(circuit) == reference_bincode, builder.__name__


def test_deserialize_reference_bytes():
    for builder, golden in GOLDEN_CASES:
        expected = builder()
        got = deserialize_circuit(golden)
        assert circuit_to_bincode(got) == circuit_to_bincode(expected), builder.__name__


def test_roundtrip_through_our_gzip():
    for builder, _ in GOLDEN_CASES:
        circuit = builder()
        data = serialize_circuit(circuit)
        got = deserialize_circuit(data)
        assert circuit_to_bincode(got) == circuit_to_bincode(circuit)


def test_witness_map_roundtrip():
    wm = WitnessMap()
    wm.insert(Witness(1), FieldElement(13))
    wm.insert(Witness(9), -FieldElement(1))
    wm.insert(Witness(4), FieldElement(0))
    data = compress_witness(wm)
    assert decompress_witness(data) == wm


def test_circuit_bincode_rejects_trailing():
    import pytest

    data = circuit_to_bincode(build_addition_circuit()) + b"\x00"
    with pytest.raises(ValueError):
        circuit_from_bincode(data)


def test_msgpack_circuit_roundtrip_all_goldens():
    """The `serialize-messagepack` feature analogue
    (acir/src/circuit/mod.rs:128-143): every golden circuit round-trips
    through msgpack+deflate, and the encoding is genuinely distinct from
    (and here, smaller than) the bincode body."""
    from acvm_tpu.acir.serialization import (
        deserialize_circuit,
        deserialize_circuit_msgpack,
        serialize_circuit,
        serialize_circuit_msgpack,
    )
    from tests import golden_vectors as gv

    goldens = [
        gv.ADDITION_CIRCUIT,
        gv.FIXED_BASE_SCALAR_MUL_CIRCUIT,
        gv.PEDERSEN_CIRCUIT,
        gv.SCHNORR_VERIFY_CIRCUIT,
        gv.SIMPLE_BRILLIG_FOREIGN_CALL,
        gv.COMPLEX_BRILLIG_FOREIGN_CALL,
        gv.MEMORY_OP_CIRCUIT,
    ]
    for golden in goldens:
        circuit = deserialize_circuit(bytes(golden))
        packed = serialize_circuit_msgpack(circuit)
        back = deserialize_circuit_msgpack(packed)
        assert serialize_circuit(back) == serialize_circuit(circuit)
        assert packed != bytes(golden)
