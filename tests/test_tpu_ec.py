"""Batched device EC kernels vs golden vectors and the host implementation."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acvm_tpu.acir.serialization import deserialize_circuit
from acvm_tpu.blackbox.ec import grumpkin
from acvm_tpu.fields import BN254_FR
from acvm_tpu.fields.jnp_ops import LimbContext
from acvm_tpu.fields.limbs import ints_to_limbs
from acvm_tpu.tpu import BatchSolver, plan_circuit
from acvm_tpu.tpu import ec

import golden_vectors as gv

rng = random.Random(17)
CTX = LimbContext(BN254_FR)
G = grumpkin.generator()


def test_fixed_base_mul_kernel_matches_host():
    scalars = [1, 2, 5, rng.randrange(grumpkin.params.n), 1 + 2 * (1 << 128)]
    arr = jnp.asarray(ints_to_limbs(scalars))
    table = ec.window_table(G)

    @jax.jit
    def run(s):
        return ec.pt_to_affine(CTX, ec.fixed_base_mul(CTX, table, s))

    ax, ay = run(arr)
    from acvm_tpu.fields.limbs import limbs_to_ints

    xs = limbs_to_ints(np.asarray(ax))
    ys = limbs_to_ints(np.asarray(ay))
    for s, x, y in zip(scalars, xs, ys):
        expected = grumpkin.mul(s, G)
        assert (x, y) == expected, s


def test_scalar_mul_kernel_matches_host():
    base = grumpkin.mul(987654321, G)
    scalars = [3, rng.randrange(grumpkin.params.n)]
    arr = jnp.asarray(ints_to_limbs(scalars))
    base_pt = (
        jnp.asarray(ints_to_limbs([(base[0] * BN254_FR.r) % BN254_FR.modulus] * 2)),
        jnp.asarray(ints_to_limbs([(base[1] * BN254_FR.r) % BN254_FR.modulus] * 2)),
        jnp.asarray(ints_to_limbs([BN254_FR.r] * 2)),
    )

    @jax.jit
    def run(s):
        return ec.pt_to_affine(CTX, ec.scalar_mul(CTX, base_pt, s))

    ax, ay = run(arr)
    from acvm_tpu.fields.limbs import limbs_to_ints

    xs = limbs_to_ints(np.asarray(ax))
    ys = limbs_to_ints(np.asarray(ay))
    for s, x, y in zip(scalars, xs, ys):
        assert (x, y) == grumpkin.mul(s, base), s


def test_fixed_base_circuit_on_device():
    circuit = deserialize_circuit(gv.FIXED_BASE_SCALAR_MUL_CIRCUIT)
    plan = plan_circuit(circuit)
    assert all(not level.host for level in plan.levels)
    solver = BatchSolver(plan)
    result = solver.solve([{1: 1, 2: 0}, {1: 1, 2: 2}])
    assert result.ok.all()
    x_hex = [f"{v:064x}" for v in result.witness_ints(3)]
    y_hex = [f"{v:064x}" for v in result.witness_ints(4)]
    assert (x_hex[0], y_hex[0]) == gv.FIXED_BASE_1_0
    assert (x_hex[1], y_hex[1]) == gv.FIXED_BASE_1_2


def test_fixed_base_circuit_flags_invalid_scalar():
    circuit = deserialize_circuit(gv.FIXED_BASE_SCALAR_MUL_CIRCUIT)
    solver = BatchSolver(plan_circuit(circuit))
    result = solver.solve([{1: 1, 2: 0}, {1: 1 << 130, 2: 0}])
    assert result.ok.tolist() == [True, False]


def test_pedersen_circuit_on_device():
    circuit = deserialize_circuit(gv.PEDERSEN_CIRCUIT)
    plan = plan_circuit(circuit)
    assert all(not level.host for level in plan.levels)
    solver = BatchSolver(plan)
    result = solver.solve([{1: 1}, {1: 7}])
    assert result.ok.all()
    # instance 0: pedersen([1], 0) pins generator 0 (acvm_js fixture)
    assert (
        f"{result.witness_ints(2)[0]:064x}"
        == "09489945604c9686e698cb69d7bd6fc0cdb02e9faae3e1a433f1c342c1a5ecc4"
    )
    # instance 1 matches the host backend
    from acvm_tpu.blackbox import GrumpkinSolver
    from acvm_tpu.fields import FieldElement

    x, y = GrumpkinSolver().pedersen([FieldElement(7)], 0)
    assert result.witness_ints(2)[1] == int(x)
    assert result.witness_ints(3)[1] == int(y)


def test_pedersen_two_input_circuit_on_device():
    """2-input commitment end-to-end on device AND through the sequential
    API: pedersen([0, 1], 0) is the wasm/pedersen.rs:42-50 golden vector
    (pinned generator 1); a random pair cross-checks the host backend."""
    from acvm_tpu.acir import opcodes as ops
    from acvm_tpu.acir.circuit import Circuit, PublicInputs
    from acvm_tpu.acir.witness import Witness
    from acvm_tpu.blackbox import GrumpkinSolver
    from acvm_tpu.fields import FieldElement

    op = ops.OpcodeBlackBoxFuncCall(
        ops.BBPedersen(
            inputs=[
                ops.FunctionInput(Witness(1), 254),
                ops.FunctionInput(Witness(2), 254),
            ],
            domain_separator=0,
            outputs=(Witness(3), Witness(4)),
        )
    )
    circuit = Circuit(
        current_witness_index=5,
        opcodes=[op],
        private_parameters={Witness(1), Witness(2)},
        return_values=PublicInputs({Witness(3), Witness(4)}),
    )
    plan = plan_circuit(circuit)
    assert all(not level.host for level in plan.levels)
    solver = BatchSolver(plan)
    result = solver.solve([{1: 0, 2: 1}, {1: 123456789, 2: 987654321}])
    assert result.ok.all()
    # wasm/pedersen.rs golden vector
    assert (
        f"{result.witness_ints(3)[0]:064x}",
        f"{result.witness_ints(4)[0]:064x}",
    ) == gv.PEDERSEN_0_1
    # host-backend differential for the random pair
    x, y = GrumpkinSolver().pedersen(
        [FieldElement(123456789), FieldElement(987654321)], 0
    )
    assert result.witness_ints(3)[1] == int(x)
    assert result.witness_ints(4)[1] == int(y)

    # and the sequential product API agrees
    from acvm_tpu.api import execute_circuit
    from acvm_tpu.acir.serialization import serialize_circuit

    solved = execute_circuit(serialize_circuit(circuit), {1: 0, 2: 1})
    assert f"{int(solved.get(Witness(3))):064x}" == gv.PEDERSEN_0_1[0]


def test_fused_tree_msm_matches_host_at_batch_1024():
    """The fused Pallas point-add tree (ec_pallas, engaged on TPU when the
    batch is a multiple of 1024) must agree bit-for-bit with the host
    grumpkin implementation, including the 0 / 1 / n-1 scalar edges."""
    if jax.default_backend() != "tpu":
        pytest.skip("fused EC tree is a TPU kernel")
    from acvm_tpu.blackbox.grumpkin import derive_generator
    from acvm_tpu.fields.limbs import limbs_to_ints

    B = 1024
    gens = [derive_generator(0, i) for i in range(2)]
    tables = jnp.stack([ec.window_table(tuple(g)) for g in gens])
    n_order = grumpkin.params.n
    s1 = [rng.randrange(n_order) for _ in range(B)]
    s2 = [rng.randrange(n_order) for _ in range(B)]
    s1[0], s2[0] = 0, 0
    s1[1], s2[1] = 1, 0
    s1[2], s2[2] = n_order - 1, 12345
    scalars = jnp.stack(
        [jnp.asarray(ints_to_limbs(s1)), jnp.asarray(ints_to_limbs(s2))],
        axis=1,
    )

    fn = jax.jit(
        lambda s: ec.pt_to_affine(CTX, ec.msm_fixed_tables(CTX, tables, s))
    )
    ax, ay = fn(scalars)
    xs = limbs_to_ints(np.asarray(ax))
    ys = limbs_to_ints(np.asarray(ay))
    for i in (0, 1, 2, 3, 500, 1023):
        expected = grumpkin.add(
            grumpkin.mul(s1[i], tuple(gens[0])),
            grumpkin.mul(s2[i], tuple(gens[1])),
        )
        got = None if (xs[i], ys[i]) == (0, 0) else (xs[i], ys[i])
        assert got == expected, i


def test_fused_ladder_scalar_mul_matches_host_at_batch_1024():
    """The fused-kernel variable-base ladder (ec_pallas.scalar_mul_fused,
    engaged on TPU at B % 1024 == 0) must match the host implementation."""
    if jax.default_backend() != "tpu":
        pytest.skip("fused EC ladder is a TPU kernel")
    from acvm_tpu.fields.limbs import limbs_to_ints

    B = 1024
    base = grumpkin.mul(424242, G)
    r = BN254_FR.r
    p = BN254_FR.modulus
    base_pt = (
        jnp.asarray(ints_to_limbs([(base[0] * r) % p] * B)),
        jnp.asarray(ints_to_limbs([(base[1] * r) % p] * B)),
        jnp.asarray(ints_to_limbs([r % p] * B)),
    )
    n_order = grumpkin.params.n
    scalars = [rng.randrange(n_order) for _ in range(B)]
    scalars[0], scalars[1], scalars[2] = 0, 1, n_order - 1
    arr = jnp.asarray(ints_to_limbs(scalars))

    fn = jax.jit(
        lambda s: ec.pt_to_affine(CTX, ec.scalar_mul(CTX, base_pt, s))
    )
    ax, ay = fn(arr)
    xs = limbs_to_ints(np.asarray(ax))
    ys = limbs_to_ints(np.asarray(ay))
    for i in (0, 1, 2, 3, 999):
        expected = grumpkin.mul(scalars[i], base)
        got = None if (xs[i], ys[i]) == (0, 0) else (xs[i], ys[i])
        assert got == expected, i
