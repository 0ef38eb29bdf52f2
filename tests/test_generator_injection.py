"""Pedersen generator / Schnorr challenge escape hatches.

The barretenberg generator derivation is sealed inside the reference's
prebuilt WASM binary (barretenberg_blackbox_solver/src/wasm/pedersen.rs:13-36;
docs/pedersen_compat.md documents the reconstruction attempts).  The
framework is therefore correct-by-injection: an externally-supplied table
must flow bit-exactly through BOTH engines, and a Schnorr challenge hook
must route hooked circuits to the bit-exact host stage.
"""

from __future__ import annotations

import pytest

from acvm_tpu.acir import Circuit, Witness
from acvm_tpu.acir import opcodes as ops
from acvm_tpu.acir.witness import WitnessMap
from acvm_tpu.blackbox import GrumpkinSolver
from acvm_tpu.blackbox.ec import grumpkin
from acvm_tpu.blackbox.grumpkin import (
    clear_external_generators,
    derive_generator,
    pedersen_commit,
    set_external_generators,
    set_schnorr_challenge_hook,
)
from acvm_tpu.config import EngineConfig
from acvm_tpu.fields.field import FieldElement
from acvm_tpu.pwg import ACVM, ACVMStatus
from acvm_tpu.tpu import BatchSolver, plan_circuit


@pytest.fixture(autouse=True)
def _clean_hooks():
    yield
    clear_external_generators()
    set_schnorr_challenge_hook(None)


def synthetic_table(n=3):
    # Known multiples of the Grumpkin generator: on-curve, definitely not the
    # default table.
    return tuple(grumpkin.mul_g(k) for k in (5, 7, 11)[:n])


def test_injected_generators_change_host_commitment():
    default = pedersen_commit([FieldElement(1)], 0)
    set_external_generators(synthetic_table())
    assert derive_generator(0, 0) == grumpkin.mul_g(5)
    injected = pedersen_commit([FieldElement(1)], 0)
    assert injected != default
    # commitment over [1] with generator 5G is just 5G
    assert (int(injected[0]), int(injected[1])) == grumpkin.mul_g(5)
    clear_external_generators()
    assert pedersen_commit([FieldElement(1)], 0) == default


def test_injected_generators_reject_off_curve():
    with pytest.raises(Exception):
        set_external_generators([(1, 2)])


def build_pedersen_circuit(n_inputs=2):
    ins = [Witness(i + 1) for i in range(n_inputs)]
    call = ops.BBPedersen(
        inputs=[ops.FunctionInput(w, 254) for w in ins],
        domain_separator=0,
        outputs=(Witness(n_inputs + 1), Witness(n_inputs + 2)),
    )
    return Circuit(
        current_witness_index=n_inputs + 2,
        opcodes=[ops.OpcodeBlackBoxFuncCall(call)],
        private_parameters=set(ins),
    )


def test_injected_generators_flow_through_both_engines():
    config = EngineConfig(pedersen_generators=synthetic_table())
    circuit = build_pedersen_circuit(2)
    scalars = [3, 9]

    plan = config.plan(circuit)
    solver = config.solver(plan)
    res = solver.solve([{1: scalars[0], 2: scalars[1]}])
    assert res.ok.all()

    # host engine with the same injected table
    wm = WitnessMap()
    for i, v in enumerate(scalars):
        wm.insert(Witness(i + 1), FieldElement(v))
    acvm = ACVM(GrumpkinSolver(), circuit.opcodes, wm)
    assert acvm.solve() == ACVMStatus.SOLVED
    host = acvm.finalize()

    # python-int oracle: 3 * 5G + 9 * 7G
    expected = grumpkin.add(
        grumpkin.mul(3, grumpkin.mul_g(5)), grumpkin.mul(9, grumpkin.mul_g(7))
    )
    for engine_x, engine_y in (
        (res.witness_ints(3)[0], res.witness_ints(4)[0]),
        (int(host.get(Witness(3))), int(host.get(Witness(4)))),
    ):
        assert (engine_x, engine_y) == expected


def test_schnorr_hook_routes_to_host_and_applies():
    calls = []

    def hook(r_x, pub, message):
        calls.append(bytes(message))
        return (r_x + pub[0] + len(message)) % grumpkin.params.n

    set_schnorr_challenge_hook(hook)

    # Device planner must route SchnorrVerify to a host stage now.
    ins = [ops.FunctionInput(Witness(i + 1), 8) for i in range(2)]
    call = ops.BBSchnorrVerify(
        public_key_x=ops.FunctionInput(Witness(3), 254),
        public_key_y=ops.FunctionInput(Witness(4), 254),
        signature=[ops.FunctionInput(Witness(5 + i), 8) for i in range(64)],
        message=ins,
        output=Witness(69),
    )
    circuit = Circuit(
        current_witness_index=69,
        opcodes=[ops.OpcodeBlackBoxFuncCall(call)],
        private_parameters={Witness(i) for i in range(1, 69)},
    )
    plan = plan_circuit(circuit)
    assert any(level.host for level in plan.levels)
    assert not any(level.schnorr for level in plan.levels)

    # And the host verify path consults the hook: a signature built against
    # the hooked challenge verifies.
    from acvm_tpu.blackbox.grumpkin import schnorr_sign, schnorr_verify

    pub_x, pub_y = grumpkin.mul_g(1234567)
    sig = schnorr_sign(1234567, b"hi")
    assert schnorr_verify(
        FieldElement(pub_x), FieldElement(pub_y), sig, b"hi"
    )
    assert calls, "hook was not consulted"
