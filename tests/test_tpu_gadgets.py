"""Batched hash kernels vs host digests, both direct and end-to-end through
the batch solver on hash-gadget circuits."""

import hashlib
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acvm_tpu.acir import Circuit, Witness, WitnessMap
from acvm_tpu.acir import opcodes as ops
from acvm_tpu.blackbox import keccak256 as host_keccak256
from acvm_tpu.fields import FieldElement
from acvm_tpu.tpu import BatchSolver, plan_circuit
from acvm_tpu.tpu import gadgets

rng = random.Random(8)


@pytest.fixture(scope="module")
def digests():
    messages = [
        b"",
        b"abc",
        bytes(range(55)),  # sha256 one-block boundary
        bytes(range(56)),  # forces a second block
        bytes(range(64)),
        bytes(range(200)),  # multi-block for all three
    ]
    out = {}

    for msg in messages:
        arr = jnp.asarray(
            np.frombuffer(msg, dtype=np.uint8).astype(np.uint32)[None].repeat(3, 0)
        ).reshape(3, len(msg))
        sha = jax.jit(gadgets.sha256_digest)(arr)
        b2s = jax.jit(gadgets.blake2s_digest)(arr)
        kec = jax.jit(gadgets.keccak256_digest)(arr)
        out[msg] = tuple(
            bytes(np.asarray(d)[0].astype(np.uint8)) for d in (sha, b2s, kec)
        )
    return out


def test_sha256_kernel(digests):
    for msg, (sha, _, _) in digests.items():
        assert sha == hashlib.sha256(msg).digest(), msg


def test_blake2s_kernel(digests):
    for msg, (_, b2s, _) in digests.items():
        assert b2s == hashlib.blake2s(msg).digest(), msg


def test_keccak256_kernel(digests):
    for msg, (_, _, kec) in digests.items():
        assert kec == host_keccak256(msg), msg


def test_hash_gadgets_in_batch_solver():
    # Circuit: sha256 + keccak256 + blake2s over the same 6 input bytes.
    n = 6
    inputs = [ops.FunctionInput(Witness(i + 1), 8) for i in range(n)]
    next_w = n + 1
    opcodes = []
    out_map = {}
    for cls, name in (
        (ops.BBSha256, "sha256"),
        (ops.BBBlake2s, "blake2s"),
        (ops.BBKeccak256, "keccak256"),
    ):
        outs = [Witness(next_w + i) for i in range(32)]
        next_w += 32
        opcodes.append(ops.OpcodeBlackBoxFuncCall(cls(list(inputs), outs)))
        out_map[name] = outs

    circuit = Circuit(
        current_witness_index=next_w - 1,
        opcodes=opcodes,
        private_parameters={Witness(i + 1) for i in range(n)},
    )
    plan = plan_circuit(circuit)
    # all three hash gadgets must be on the device path (no host stages)
    assert all(not level.host for level in plan.levels)

    solver = BatchSolver(plan)
    batch = [
        {i + 1: rng.randrange(256) for i in range(n)} for _ in range(3)
    ]
    result = solver.solve(batch)
    assert result.ok.all()

    for b, assignment in enumerate(batch):
        msg = bytes(assignment[i + 1] for i in range(n))
        expected = {
            "sha256": hashlib.sha256(msg).digest(),
            "blake2s": hashlib.blake2s(msg).digest(),
            "keccak256": host_keccak256(msg),
        }
        for name, outs in out_map.items():
            got = bytes(
                result.witness_ints(int(w))[b] for w in outs
            )
            assert got == expected[name], (name, msg)


def test_hash_to_field_in_batch_solver():
    """HashToField128Security on the device path: blake2s + big-endian
    reduce mod p (blackbox_solver/src/lib.rs:85-99).  The 1-output gate
    must not fall back to a per-instance host stage."""
    from acvm_tpu.blackbox import hash_to_field_128_security

    n = 6
    inputs = [ops.FunctionInput(Witness(i + 1), 8) for i in range(n)] + [
        ops.FunctionInput(Witness(n + 1), 16)  # multi-byte input too
    ]
    out = Witness(n + 2)
    circuit = Circuit(
        current_witness_index=n + 2,
        opcodes=[
            ops.OpcodeBlackBoxFuncCall(
                ops.BBHashToField128Security(inputs=inputs, output=out)
            )
        ],
        private_parameters={Witness(i + 1) for i in range(n + 1)},
    )
    plan = plan_circuit(circuit)
    assert all(not level.host for level in plan.levels)
    assert sum(len(level.hashes) for level in plan.levels) == 1

    solver = BatchSolver(plan)
    batch = [
        {i + 1: rng.randrange(256) for i in range(n)} | {n + 1: 0xBEE0 + b}
        for b in range(3)
    ]
    result = solver.solve(batch)
    assert result.ok.all()
    for b, assignment in enumerate(batch):
        msg = bytes(assignment[i + 1] for i in range(n))
        msg += (0xBEE0 + b).to_bytes(2, "little")  # fetch_nearest_bytes order
        expected = hash_to_field_128_security(msg)
        assert result.witness_ints(int(out))[b] == int(expected), b


def test_keccak_var_kernel():
    msg = bytes(range(150))
    arr = jnp.asarray(
        np.frombuffer(msg, dtype=np.uint8).astype(np.uint32)[None].repeat(4, 0)
    )
    lengths = jnp.asarray(np.array([0, 5, 136, 150], dtype=np.uint32))
    digests = jax.jit(gadgets.keccak256_var_digest)(arr, lengths)
    for i, n in enumerate([0, 5, 136, 150]):
        got = bytes(np.asarray(digests)[i].astype(np.uint8))
        assert got == host_keccak256(msg[:n]), n


def test_keccak_var_in_batch_solver():
    n = 10
    inputs = [ops.FunctionInput(Witness(i + 1), 8) for i in range(n)]
    size_w = Witness(n + 1)
    outs = [Witness(n + 2 + i) for i in range(32)]
    opcode = ops.OpcodeBlackBoxFuncCall(
        ops.BBKeccak256VariableLength(list(inputs), ops.FunctionInput(size_w, 32), outs)
    )
    circuit = Circuit(
        current_witness_index=int(outs[-1]),
        opcodes=[opcode],
        private_parameters={Witness(i + 1) for i in range(n + 1)},
    )
    plan = plan_circuit(circuit)
    assert all(not level.host for level in plan.levels)
    solver = BatchSolver(plan)

    msg = bytes(rng.randrange(256) for _ in range(n))
    batch = []
    for size in (0, 4, 10, 11):  # 11 > n -> must flag the instance
        a = {i + 1: msg[i] for i in range(n)}
        a[int(size_w)] = size
        batch.append(a)
    result = solver.solve(batch)
    assert result.ok.tolist() == [True, True, True, False]
    for b, size in enumerate((0, 4, 10)):
        got = bytes(result.witness_ints(int(w))[b] for w in outs)
        assert got == host_keccak256(msg[:size]), size
