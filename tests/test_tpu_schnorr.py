"""Device Schnorr verification vs the host backend, via the golden schnorr
circuit bytes."""

import pytest

from acvm_tpu.acir import Witness
from acvm_tpu.acir.serialization import deserialize_circuit
from acvm_tpu.blackbox import grumpkin as gk
from acvm_tpu.tpu import BatchSolver, plan_circuit

import golden_vectors as gv


@pytest.mark.slow
def test_schnorr_circuit_on_device():
    circuit = deserialize_circuit(gv.SCHNORR_VERIFY_CIRCUIT)
    plan = plan_circuit(circuit)
    assert all(not level.host for level in plan.levels)
    solver = BatchSolver(plan)

    sk = 0xDEADBEEFCAFE1234
    pub_x, pub_y = gk.schnorr_public_key(sk)
    message = bytes(range(10))
    sig = gk.schnorr_sign(sk, message)

    def assignment(sig_bytes, msg):
        a = {1: int(pub_x), 2: int(pub_y)}
        for i, byte in enumerate(sig_bytes):
            a[3 + i] = byte
        for i, byte in enumerate(msg):
            a[3 + 64 + i] = byte
        return a

    bad_sig = bytes([sig[0] ^ 1]) + sig[1:]
    batch = [assignment(sig, message), assignment(bad_sig, message)]
    result = solver.solve(batch)
    assert result.ok.all()
    assert result.witness_ints(77) == [1, 0]
