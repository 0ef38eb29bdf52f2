"""Device ECDSA verification (secp256k1 / secp256r1) vs the host verifiers,
through a full batched circuit solve.

The host verifiers mirror the reference bit-for-bit
(blackbox_solver/src/lib.rs:101-210, covered by test_blackbox.py's golden
vectors); here the batched device kernels must agree with them on valid,
tampered, high-S, and off-curve inputs — and map the host's raising cases to
per-instance ok=False.
"""

import random

import pytest

from acvm_tpu.acir import Circuit, Expression, Witness
from acvm_tpu.acir import opcodes as ops
from acvm_tpu.blackbox.ec import secp256k1, secp256r1
from acvm_tpu.tpu import BatchSolver, plan_circuit

rng = random.Random(20260818)


def _sign(curve, z, d, low_s=True, tamper=False):
    n = curve.params.n
    while True:
        k = rng.randrange(1, n)
        R = curve.mul(k, curve.generator())
        r = R[0] % n
        if r == 0:
            continue
        s = pow(k, -1, n) * (z + r * d) % n
        if s == 0:
            continue
        if low_s != (s <= n // 2):
            s = n - s
        if tamper:
            s = (s + 1) % n or 1
        return r.to_bytes(32, "big") + s.to_bytes(32, "big")


def _build_circuit(kind):
    """witnesses: 1..32 pub_x, 33..64 pub_y, 65..128 sig, 129..160 msg, 161 out."""
    fi = lambda w: ops.FunctionInput(Witness(w), 8)
    call_cls = (
        ops.BBEcdsaSecp256k1 if kind == "secp256k1" else ops.BBEcdsaSecp256r1
    )
    call = call_cls(
        public_key_x=[fi(1 + i) for i in range(32)],
        public_key_y=[fi(33 + i) for i in range(32)],
        signature=[fi(65 + i) for i in range(64)],
        hashed_message=[fi(129 + i) for i in range(32)],
        output=Witness(161),
    )
    return Circuit(
        current_witness_index=161,
        opcodes=[ops.OpcodeBlackBoxFuncCall(call)],
        private_parameters=set(Witness(i) for i in range(1, 161)),
    )


def _assignment(pub_x, pub_y, sig, msg):
    a = {}
    data = pub_x + pub_y + sig + msg
    for i, byte in enumerate(data):
        a[1 + i] = byte
    return a


@pytest.mark.slow
@pytest.mark.parametrize("kind,curve", [
    ("secp256k1", secp256k1),
    ("secp256r1", secp256r1),
])
def test_ecdsa_circuit_on_device(kind, curve):
    circuit = _build_circuit(kind)
    plan = plan_circuit(circuit)
    assert all(not level.host for level in plan.levels), "must plan on device"
    solver = BatchSolver(plan)

    n, p = curve.params.n, curve.params.p
    d = rng.randrange(1, n)
    Q = curve.mul(d, curve.generator())
    pub_x = list(Q[0].to_bytes(32, "big"))
    pub_y = list(Q[1].to_bytes(32, "big"))
    z = rng.randrange(1, n)
    msg = list(z.to_bytes(32, "big"))

    good = list(_sign(curve, z, d))
    bad = list(_sign(curve, z, d, tamper=True))
    high_s = list(_sign(curve, z, d, low_s=False))
    off_y = list(((Q[1] + 1) % p).to_bytes(32, "big"))

    batch = [
        _assignment(pub_x, pub_y, good, msg),   # valid -> 1
        _assignment(pub_x, pub_y, bad, msg),    # wrong sig -> 0
        _assignment(pub_x, pub_y, high_s, msg), # high-S -> 0
        _assignment(pub_x, off_y, good, msg),   # off-curve: host raises -> ok=False
    ]
    result = solver.solve(batch)
    assert result.ok.tolist() == [True, True, True, False]
    assert result.witness_ints(161)[:3] == [1, 0, 0]
