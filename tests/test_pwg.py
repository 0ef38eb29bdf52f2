"""ACVM engine conformance tests (reference: acvm/tests/solver.rs and inline
pwg module tests)."""

import pytest

from acvm_tpu import brillig as br
from acvm_tpu.acir import Expression, OpcodeLocation, Witness, WitnessMap
from acvm_tpu.acir import opcodes as ops
from acvm_tpu.fields import FieldElement
from acvm_tpu.pwg import (
    ACVM,
    ACVMStatus,
    ArithmeticSolver,
    BrilligFunctionFailed,
    IndexOutOfBounds,
    MemoryOpSolver,
    UnsatisfiedConstrain,
    route,
    solve_directives,
)


class StubbedBackend:
    """Panics on any EC gadget (solver.rs:20-46)."""

    def schnorr_verify(self, *a):
        raise AssertionError("Path not trodden by this test")

    def pedersen(self, *a):
        raise AssertionError("Path not trodden by this test")

    def fixed_base_scalar_mul(self, *a):
        raise AssertionError("Path not trodden by this test")


fe = FieldElement
one = FieldElement.one
zero = FieldElement.zero


def wmap(**kwargs):
    wm = WitnessMap()
    for k, v in kwargs.items():
        wm.insert(Witness(int(k[1:])), fe(v))
    return wm


# ---------------------------------------------------------------------------
# arithmetic solver
# ---------------------------------------------------------------------------


def test_arithmetic_smoke():
    a, b, c, d, e = (Witness(i) for i in range(5))
    opcode_a = Expression(
        linear_combinations=[(one(), a), (-one(), b), (-one(), c), (-one(), d)],
    )
    opcode_b = Expression(
        linear_combinations=[(one(), e), (-one(), a), (-one(), b)],
    )
    values = wmap(w1=2, w2=1, w3=1)
    ArithmeticSolver.solve(values, opcode_a)
    ArithmeticSolver.solve(values, opcode_b)
    assert values.get(a) == fe(4)
    assert values.get(e) == fe(6)


def test_arithmetic_solves_mul_unknown():
    # 2*a*b - 12 = 0 with a=3 -> b = 2
    a, b = Witness(0), Witness(1)
    expr = Expression(mul_terms=[(fe(2), a, b)], q_c=fe(-12))
    values = wmap(w0=3)
    ArithmeticSolver.solve(values, expr)
    assert values.get(b) == fe(2)


def test_arithmetic_mul_plus_linear():
    # a*b + c = 0 with b=4, c=8 -> 4a + 8 = 0 -> a = -2
    a, b, c = Witness(0), Witness(1), Witness(2)
    expr = Expression(
        mul_terms=[(one(), a, b)], linear_combinations=[(one(), c)]
    )
    values = wmap(w1=4, w2=8)
    ArithmeticSolver.solve(values, expr)
    assert values.get(a) == -fe(2)


def test_arithmetic_same_unknown_twice_unsolvable():
    # a*b + a with only b known: partial evaluation leaves two linear terms of
    # the same unknown, which the reference solver reports as too many unknowns
    # (arithmetic.rs:176-209 counts per-term, without merging).
    from acvm_tpu.pwg import ExpressionHasTooManyUnknowns

    a, b = Witness(0), Witness(1)
    expr = Expression(mul_terms=[(one(), a, b)], linear_combinations=[(one(), a)])
    values = wmap(w1=4)
    with pytest.raises(ExpressionHasTooManyUnknowns):
        ArithmeticSolver.solve(values, expr)


# ---------------------------------------------------------------------------
# full ACVM with brillig oracles
# ---------------------------------------------------------------------------


def build_inversion_oracle_circuit():
    w_x, w_y, w_oracle, w_z, w_z_inverse, w_x_plus_y, w_equal_res = (
        Witness(i) for i in range(1, 8)
    )
    equal_opcode = br.OpBinaryFieldOp(
        br.RegisterIndex(2), br.BinaryFieldOp.Equals, br.RegisterIndex(0), br.RegisterIndex(1)
    )
    brillig_data = ops.Brillig(
        inputs=[
            ops.BrilligInputSingle(
                Expression(linear_combinations=[(one(), w_x), (one(), w_y)])
            ),
            ops.BrilligInputSingle(Expression()),
        ],
        outputs=[
            ops.BrilligOutputSimple(w_x_plus_y),
            ops.BrilligOutputSimple(w_oracle),
            ops.BrilligOutputSimple(w_equal_res),
        ],
        foreign_call_results=[],
        bytecode=[
            equal_opcode,
            br.OpForeignCall(
                "invert",
                destinations=(br.RomRegister(br.RegisterIndex(1)),),
                inputs=(br.RomRegister(br.RegisterIndex(0)),),
            ),
        ],
        predicate=None,
    )
    opcodes = [
        ops.OpcodeBrillig(brillig_data),
        ops.OpcodeArithmetic(
            Expression(linear_combinations=[(one(), w_x), (one(), w_y), (-one(), w_z)])
        ),
        ops.OpcodeArithmetic(
            Expression(mul_terms=[(one(), w_z, w_z_inverse)], q_c=-one())
        ),
        ops.OpcodeArithmetic(
            Expression(
                linear_combinations=[(-one(), w_oracle), (one(), w_z_inverse)]
            )
        ),
    ]
    return opcodes


def test_inversion_brillig_oracle_equivalence():
    opcodes = build_inversion_oracle_circuit()
    acvm = ACVM(StubbedBackend(), opcodes, wmap(w1=2, w2=3))
    status = acvm.solve()
    assert status == ACVMStatus.REQUIRES_FOREIGN_CALL
    assert acvm.instruction_pointer == 0

    wait = acvm.get_pending_foreign_call()
    assert wait is not None
    assert wait.function == "invert"
    assert len(wait.inputs) == 1

    result = br.Value(wait.inputs[0][0].to_field().inverse())
    acvm.resolve_pending_foreign_call(br.ForeignCallResult.single(result))

    status = acvm.solve()
    assert status == ACVMStatus.SOLVED
    witness_map = acvm.finalize()
    # z = 5, oracle = 1/5, z_inverse = 1/5
    assert witness_map.get(Witness(3)) == fe(5).inverse()
    assert witness_map.get(Witness(5)) == fe(5).inverse()


def test_brillig_oracle_predicate():
    # A zero predicate skips the brillig block and zeroes its outputs.
    w_x, w_y, w_oracle, w_x_plus_y, w_equal_res, w_lt_res = (
        Witness(i) for i in range(1, 7)
    )
    brillig_opcode = ops.OpcodeBrillig(
        ops.Brillig(
            inputs=[
                ops.BrilligInputSingle(
                    Expression(linear_combinations=[(one(), w_x), (one(), w_y)])
                ),
                ops.BrilligInputSingle(Expression()),
            ],
            outputs=[
                ops.BrilligOutputSimple(w_x_plus_y),
                ops.BrilligOutputSimple(w_oracle),
                ops.BrilligOutputSimple(w_equal_res),
                ops.BrilligOutputSimple(w_lt_res),
            ],
            foreign_call_results=[],
            bytecode=[
                br.OpBinaryFieldOp(
                    br.RegisterIndex(2),
                    br.BinaryFieldOp.Equals,
                    br.RegisterIndex(0),
                    br.RegisterIndex(1),
                ),
                br.OpForeignCall(
                    "invert",
                    destinations=(br.RomRegister(br.RegisterIndex(1)),),
                    inputs=(br.RomRegister(br.RegisterIndex(0)),),
                ),
            ],
            predicate=Expression(),  # zero predicate
        )
    )
    acvm = ACVM(StubbedBackend(), [brillig_opcode], wmap(w1=2, w2=3))
    assert acvm.solve() == ACVMStatus.SOLVED
    witness_map = acvm.finalize()
    for w in (w_x_plus_y, w_oracle, w_equal_res, w_lt_res):
        assert witness_map.get(w) == zero()


def test_unsatisfied_opcode_resolved():
    a, b, c, d = (Witness(i) for i in range(4))
    opcode_a = Expression(
        linear_combinations=[(one(), a), (-one(), b), (-one(), c), (-one(), d)],
    )
    values = wmap(w0=4, w1=2, w2=1, w3=2)
    acvm = ACVM(StubbedBackend(), [ops.OpcodeArithmetic(opcode_a)], values)
    assert acvm.solve() == ACVMStatus.FAILURE
    assert isinstance(acvm.error, UnsatisfiedConstrain)
    assert acvm.error.opcode_location == OpcodeLocation.acir(0)


def test_unsatisfied_opcode_resolved_brillig():
    a, b, c, d = (Witness(i) for i in range(4))
    w_x, w_y, w_result = Witness(4), Witness(5), Witness(6)

    brillig_opcode = ops.OpcodeBrillig(
        ops.Brillig(
            inputs=[
                ops.BrilligInputSingle(Expression(linear_combinations=[(one(), w_x)])),
                ops.BrilligInputSingle(Expression(linear_combinations=[(one(), w_y)])),
            ],
            outputs=[ops.BrilligOutputSimple(w_result)],
            foreign_call_results=[],
            bytecode=[
                br.OpBinaryFieldOp(
                    br.RegisterIndex(2),
                    br.BinaryFieldOp.Equals,
                    br.RegisterIndex(0),
                    br.RegisterIndex(1),
                ),
                br.OpJumpIf(br.RegisterIndex(2), 3),
                br.OpTrap(),
                br.OpStop(),
            ],
            predicate=Expression.one(),
        )
    )
    opcode_a = Expression(
        linear_combinations=[(one(), a), (-one(), b), (-one(), c), (-one(), d)],
    )
    values = wmap(w0=4, w1=2, w2=1, w3=2, w4=0, w5=1, w6=0)
    acvm = ACVM(
        StubbedBackend(), [brillig_opcode, ops.OpcodeArithmetic(opcode_a)], values
    )
    assert acvm.solve() == ACVMStatus.FAILURE
    assert isinstance(acvm.error, BrilligFunctionFailed)
    assert acvm.error.message == "explicit trap hit in brillig"
    assert acvm.error.call_stack == [OpcodeLocation.brillig(0, 2)]


def test_memory_operations_end_to_end():
    initial = wmap(w1=1, w2=2, w3=3, w4=4, w5=5, w6=4)
    block_id = ops.BlockId(0)
    init = ops.OpcodeMemoryInit(block_id, [Witness(i) for i in range(1, 6)])
    read_op = ops.OpcodeMemoryOp(
        block_id,
        ops.MemOp.read_at_mem_index(Expression.from_witness(Witness(6)), Witness(7)),
        predicate=None,
    )
    expression = ops.OpcodeArithmetic(
        Expression(
            linear_combinations=[(one(), Witness(7)), (-one(), Witness(8))],
            q_c=one(),
        )
    )
    acvm = ACVM(StubbedBackend(), [init, read_op, expression], initial)
    assert acvm.solve() == ACVMStatus.SOLVED
    witness_map = acvm.finalize()
    assert witness_map.get(Witness(8)) == fe(6)


# ---------------------------------------------------------------------------
# memory solver unit tests (memory_op.rs:126-259)
# ---------------------------------------------------------------------------


def memop_write(index_val, value_witness):
    return ops.MemOp.write_to_mem_index(
        Expression.from_field(fe(index_val)), Expression.from_witness(value_witness)
    )


def memop_read(index_val, into_witness):
    return ops.MemOp.read_at_mem_index(
        Expression.from_field(fe(index_val)), into_witness
    )


def test_memory_solver_basic():
    initial = wmap(w1=1, w2=1, w3=2)
    solver = MemoryOpSolver()
    solver.init([Witness(1), Witness(2)], initial)
    solver.solve_memory_op(memop_write(1, Witness(3)), initial, None)
    solver.solve_memory_op(memop_read(1, Witness(4)), initial, None)
    assert initial.get(Witness(4)) == fe(2)


def test_memory_index_out_of_bounds():
    initial = wmap(w1=1, w2=1, w3=2)
    solver = MemoryOpSolver()
    solver.init([Witness(1), Witness(2)], initial)
    solver.solve_memory_op(memop_write(1, Witness(3)), initial, None)
    with pytest.raises(IndexOutOfBounds) as exc:
        solver.solve_memory_op(memop_read(2, Witness(4)), initial, None)
    assert exc.value.index == 2
    assert exc.value.array_size == 2


def test_memory_predicate_on_read():
    initial = wmap(w1=1, w2=1, w3=2)
    solver = MemoryOpSolver()
    solver.init([Witness(1), Witness(2)], initial)
    solver.solve_memory_op(memop_write(1, Witness(3)), initial, Expression())
    solver.solve_memory_op(memop_read(2, Witness(4)), initial, Expression())
    # No OOB error under a zero predicate, and the read produced zero.
    assert initial.get(Witness(4)) == zero()


def test_memory_predicate_on_write():
    initial = wmap(w1=1, w2=1, w3=2)
    solver = MemoryOpSolver()
    solver.init([Witness(1), Witness(2)], initial)
    solver.solve_memory_op(memop_write(2, Witness(3)), initial, Expression())
    solver.solve_memory_op(memop_read(0, Witness(4)), initial, Expression())
    solver.solve_memory_op(memop_read(1, Witness(5)), initial, Expression())
    assert initial.get(Witness(4)) == zero()
    assert initial.get(Witness(5)) == zero()


# ---------------------------------------------------------------------------
# directives
# ---------------------------------------------------------------------------


def test_quotient_divisor_zero():
    directive = ops.DirQuotient(
        ops.QuotientDirective(
            a=Expression.zero(),
            b=Expression.zero(),
            q=Witness(0),
            r=Witness(0),
            predicate=Expression.one(),
        )
    )
    wm = wmap(w0=0)
    solve_directives(wm, directive)  # 0/0 yields 0
    assert wm.get(Witness(0)) == zero()


def test_quotient_basic():
    directive = ops.DirQuotient(
        ops.QuotientDirective(
            a=Expression.from_field(fe(17)),
            b=Expression.from_field(fe(5)),
            q=Witness(0),
            r=Witness(1),
            predicate=None,
        )
    )
    wm = WitnessMap()
    solve_directives(wm, directive)
    assert wm.get(Witness(0)) == fe(3)
    assert wm.get(Witness(1)) == fe(2)


def test_to_le_radix():
    directive = ops.DirToLeRadix(
        a=Expression.from_field(fe(0x12345)),
        b=[Witness(i) for i in range(4)],
        radix=256,
    )
    wm = WitnessMap()
    solve_directives(wm, directive)
    assert [int(wm.get(Witness(i))) for i in range(4)] == [0x45, 0x23, 0x01, 0]


def test_to_le_radix_overflow_errors():
    directive = ops.DirToLeRadix(
        a=Expression.from_field(fe(0x12345)),
        b=[Witness(0)],
        radix=256,
    )
    with pytest.raises(UnsatisfiedConstrain):
        solve_directives(WitnessMap(), directive)


def test_permutation_sort():
    values = [3, 1, 2]
    directive = ops.DirPermutationSort(
        inputs=[[Expression.from_field(fe(v))] for v in values],
        tuple_size=1,
        bits=[Witness(i) for i in range(10)],
        sort_by=[0],
    )
    wm = WitnessMap()
    solve_directives(wm, directive)
    control = []
    i = 0
    while wm.get(Witness(i)) is not None:
        control.append(bool(int(wm.get(Witness(i)))))
        i += 1
    out = execute_network(control, [fe(v) for v in values])
    assert [int(v) for v in out] == [1, 2, 3]


# ---------------------------------------------------------------------------
# sorting network router (sorting.rs tests)
# ---------------------------------------------------------------------------


def switch_nb(n):
    import math

    return sum(math.ceil(math.log2(i + 1)) for i in range(n))


def execute_network(config, inputs):
    n = len(inputs)
    if n == 1:
        return inputs
    in1, in2 = [], []
    for i in range(n // 2):
        if config[i]:
            in1.append(inputs[2 * i + 1])
            in2.append(inputs[2 * i])
        else:
            in1.append(inputs[2 * i])
            in2.append(inputs[2 * i + 1])
    if n % 2 == 1:
        in2.append(inputs[-1])
    n2 = n // 2 + (n - 1) // 2
    n3 = n2 + switch_nb(n // 2)
    out1 = execute_network(config[n2:n3], in1)
    out2 = execute_network(config[n3:], in2)
    result = []
    for i in range((n - 1) // 2):
        if config[n // 2 + i]:
            result.append(out2[i])
            result.append(out1[i])
        else:
            result.append(out1[i])
            result.append(out2[i])
    if n % 2 == 0:
        result.append(out1[-1])
        result.append(out2[-1])
    else:
        result.append(out2[-1])
    return result


def test_route_reference_vectors():
    def fes(vals):
        return [fe(v) for v in vals]

    assert route(fes([1, 2, 3]), fes([1, 2, 3])) == [False, False, False]
    assert route(fes([1, 2, 3]), fes([1, 3, 2])) == [False, False, True]
    assert route(fes([1, 2, 3]), fes([3, 2, 1])) == [True, True, True]
    assert route(fes([0, 1, 2, 3]), fes([2, 3, 0, 1])) == [
        False,
        True,
        True,
        True,
        True,
    ]
    assert route(fes([0, 1, 2, 3, 4]), fes([0, 3, 4, 2, 1])) == [
        False,
        False,
        False,
        True,
        False,
        True,
        False,
        True,
    ]


def test_route_random_roundtrip():
    import random

    rng = random.Random(1234)
    for n in range(2, 50):
        a = [fe(i) for i in range(n)]
        b = list(a)
        rng.shuffle(b)
        config = route(list(a), list(b))
        assert execute_network(config, a) == b
