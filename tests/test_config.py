"""EngineConfig wiring: the config object must actually drive the planner,
compiler, and solver construction (SURVEY.md §5 "config system"; the
reference's knobs are cargo features + the (Language, width,
is_opcode_supported) triple, acvm/src/compiler/mod.rs:75-124)."""

import pytest

from acvm_tpu.acir.circuit import Circuit
from acvm_tpu.acir.expression import Expression
from acvm_tpu.acir.witness import Witness
from acvm_tpu.acir import opcodes as ops
from acvm_tpu.config import DEFAULT_CONFIG, EngineConfig
from acvm_tpu.fields.field import FieldElement


def _hash_circuit():
    """witness 1 -> sha256 -> witnesses 2..33."""
    call = ops.BBSha256(
        inputs=[ops.FunctionInput(Witness(1), 8)],
        outputs=[Witness(i) for i in range(2, 34)],
    )
    return Circuit(
        current_witness_index=33,
        opcodes=[ops.OpcodeBlackBoxFuncCall(call)],
        private_parameters={Witness(1)},
    )


def _arith_circuit():
    # w2 = w1 + 1
    expr = (
        Expression.from_witness(Witness(1))
        - Expression.from_witness(Witness(2))
        + Expression.from_field(FieldElement(1))
    )
    return Circuit(
        current_witness_index=2,
        opcodes=[ops.OpcodeArithmetic(expr)],
        private_parameters={Witness(1)},
    )


def test_field_params_selection():
    assert EngineConfig(field="bn254").field_params().name == "bn254"
    bls = EngineConfig(field="bls12_381").field_params()
    assert bls.modulus.bit_length() == 255
    assert bls.modulus != EngineConfig().field_params().modulus


def test_plan_honors_device_hash_toggle():
    circuit = _hash_circuit()
    plan_dev = DEFAULT_CONFIG.plan(circuit)
    assert any(level.hashes for level in plan_dev.levels)
    assert not any(level.host for level in plan_dev.levels)

    plan_host = EngineConfig(device_hash_kernels=False).plan(circuit)
    assert not any(level.hashes for level in plan_host.levels)
    assert any(level.host for level in plan_host.levels)


def test_plan_field_follows_config():
    plan = EngineConfig(field="bls12_381").plan(_arith_circuit())
    assert plan.params.name == "bls12_381"


def test_compile_language_and_width():
    compiled, _ = EngineConfig(width=3).compile(_arith_circuit())
    assert all(
        isinstance(op, ops.OpcodeArithmetic) for op in compiled.opcodes
    )
    # r1cs is a passthrough for arithmetic-only circuits
    compiled_r1cs, _ = EngineConfig(language="r1cs").compile(_arith_circuit())
    assert len(compiled_r1cs.opcodes) == 1


def test_compile_hash_fallback_gate():
    from acvm_tpu.compiler.fallback import UnsupportedBlackBox

    banned = lambda op: not isinstance(op, ops.OpcodeBlackBoxFuncCall)
    # Enabled (default): the sha256 call expands into gates.
    compiled, _ = DEFAULT_CONFIG.compile(_hash_circuit(), banned)
    assert len(compiled.opcodes) > 1
    # Disabled: mirrors the reference without `unstable-fallbacks` —
    # no expansion exists (fallback.rs:107-162).
    with pytest.raises(UnsupportedBlackBox):
        EngineConfig(enable_hash_fallbacks=False).compile(_hash_circuit(), banned)


def test_solver_and_mesh_shape(monkeypatch):
    import jax

    config = EngineConfig(mesh_shape=(1,))
    plan = config.plan(_arith_circuit())
    solver = config.solver(plan)
    assert solver.mesh is not None
    assert solver.mesh.shape["data"] == 1
    result = solver.solve([{1: 41}, {1: 1}])
    assert result.ok.all()
    assert result.witness_ints(2) == [42, 2]


def test_config_generator_table_does_not_leak_across_configs():
    """A config with pedersen_generators installs the table; a later config
    WITHOUT one must not inherit it (ADVICE r4: module-global external
    generator store leaked across EngineConfigs)."""
    from acvm_tpu.blackbox.grumpkin import (
        clear_external_generators,
        derive_generator,
        grumpkin,
    )

    baseline = derive_generator(0, 0)
    # A synthetic on-curve table: 2*G and 3*G.
    g = grumpkin.generator()
    table = (grumpkin.add(g, g), grumpkin.add(grumpkin.add(g, g), g))
    try:
        injected = EngineConfig(pedersen_generators=table)
        injected.plan(_arith_circuit())
        assert derive_generator(0, 0) == table[0]
        # Plain config: must clear the config-installed table.
        DEFAULT_CONFIG.plan(_arith_circuit())
        assert derive_generator(0, 0) == baseline
    finally:
        clear_external_generators()
        import acvm_tpu.config as config_mod

        config_mod._GENERATORS_FROM_CONFIG = False


def test_direct_generator_injection_survives_plain_config():
    """Tables installed directly via set_external_generators (not through a
    config) are left alone by configs without pedersen_generators."""
    from acvm_tpu.blackbox.grumpkin import (
        clear_external_generators,
        derive_generator,
        grumpkin,
        set_external_generators,
    )

    g = grumpkin.generator()
    table = (grumpkin.add(g, g),)
    try:
        set_external_generators(table)
        DEFAULT_CONFIG.plan(_arith_circuit())
        assert derive_generator(0, 0) == table[0]
    finally:
        clear_external_generators()
