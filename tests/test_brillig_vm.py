"""Brillig VM conformance tests, mirroring brillig_vm/src/lib.rs inline tests."""

from acvm_tpu import brillig as br
from acvm_tpu.brillig_vm import VM, Registers, VMStatus
from acvm_tpu.blackbox import StubBlackBoxSolver
from acvm_tpu.fields import FieldElement

import golden_vectors as gv


def val(x):
    return br.Value.from_int(x)


def reg(i):
    return br.RegisterIndex(i)


def run_vm(memory, opcodes, registers=None):
    vm = VM(
        Registers(registers or [val(0)] * 16),
        memory,
        opcodes,
        [],
        StubBlackBoxSolver(),
    )
    status = vm.process_opcodes()
    return vm, status


def test_add_single_step():
    opcodes = [
        br.OpBinaryIntOp(reg(2), br.BinaryIntOp.Add, 2, reg(0), reg(1)),
    ]
    vm, status = run_vm([], opcodes, registers=[val(1), val(2), val(0)])
    assert status == VMStatus.FINISHED
    assert vm.registers.get(reg(2)) == val(3)


def test_jmpif():
    opcodes = [
        br.OpBinaryIntOp(reg(2), br.BinaryIntOp.Equals, 1, reg(0), reg(1)),
        br.OpJump(2),
        br.OpJumpIf(reg(2), 3),
    ]
    vm, status = run_vm([], opcodes, registers=[val(2), val(2), val(0)])
    assert status == VMStatus.FINISHED
    assert vm.registers.get(reg(2)) == val(1)


def test_jmpifnot_and_trap():
    opcodes = [
        br.OpJump(2),
        br.OpTrap(),
        br.OpBinaryFieldOp(reg(2), br.BinaryFieldOp.Equals, reg(0), reg(1)),
        br.OpJumpIfNot(reg(2), 1),
        br.OpBinaryFieldOp(reg(2), br.BinaryFieldOp.Add, reg(0), reg(1)),
    ]
    vm, status = run_vm([], opcodes, registers=[val(1), val(2), val(0)])
    assert status == VMStatus.FAILURE
    assert vm.status_data.message == "explicit trap hit in brillig"
    assert vm.status_data.call_stack == [1]
    # jumped over the add: register 2 still holds the comparison result (false)
    assert vm.registers.get(reg(2)) == val(0)


def test_mov():
    opcodes = [br.OpMov(reg(2), reg(0))]
    vm, status = run_vm([], opcodes, registers=[val(1), val(2), val(3)])
    assert status == VMStatus.FINISHED
    assert vm.registers.get(reg(2)) == val(1)
    assert vm.registers.get(reg(0)) == val(1)


def test_cmp_binary_ops():
    bit_size = 32
    registers = [val(2), val(2), val(0), val(5), val(6)]
    cases = [
        (br.OpBinaryIntOp(reg(2), br.BinaryIntOp.Equals, bit_size, reg(0), reg(1)), 1),
        (br.OpBinaryIntOp(reg(2), br.BinaryIntOp.Equals, bit_size, reg(0), reg(3)), 0),
        (br.OpBinaryIntOp(reg(2), br.BinaryIntOp.LessThan, bit_size, reg(3), reg(4)), 1),
        (
            br.OpBinaryIntOp(
                reg(2), br.BinaryIntOp.LessThanEquals, bit_size, reg(3), reg(4)
            ),
            1,
        ),
    ]
    for opcode, expected in cases:
        vm, status = run_vm([], [opcode], registers=list(registers))
        assert status == VMStatus.FINISHED
        assert vm.registers.get(reg(2)) == val(expected)


def test_store_loop():
    def brillig_write_memory(memory):
        bit_size = 32
        r_i, r_len, r_tmp = reg(0), reg(1), reg(2)
        start = [
            br.OpConst(r_i, val(0)),
            br.OpConst(r_len, val(len(memory))),
        ]
        loop_body = [
            br.OpStore(r_i, r_i),
            br.OpConst(r_tmp, val(1)),
            br.OpBinaryIntOp(r_i, br.BinaryIntOp.Add, bit_size, r_i, r_tmp),
            br.OpBinaryIntOp(r_tmp, br.BinaryIntOp.LessThan, bit_size, r_i, r_len),
            br.OpJumpIf(r_tmp, len(start)),
        ]
        vm, status = run_vm(memory, start + loop_body)
        assert status == VMStatus.FINISHED
        return vm.get_memory()

    memory = brillig_write_memory([val(0)] * 5)
    assert memory == [val(i) for i in range(5)]
    memory = brillig_write_memory([val(0)] * 100)
    assert memory == [val(i) for i in range(100)]


def test_load_loop_sum():
    def brillig_sum_memory(memory):
        bit_size = 32
        r_i, r_len, r_sum, r_tmp = reg(0), reg(1), reg(2), reg(3)
        start = [
            br.OpConst(r_sum, val(0)),
            br.OpConst(r_i, val(0)),
            br.OpConst(r_len, val(len(memory))),
        ]
        loop_body = [
            br.OpLoad(r_tmp, r_i),
            br.OpBinaryIntOp(r_sum, br.BinaryIntOp.Add, bit_size, r_sum, r_tmp),
            br.OpConst(r_tmp, val(1)),
            br.OpBinaryIntOp(r_i, br.BinaryIntOp.Add, bit_size, r_i, r_tmp),
            br.OpBinaryIntOp(r_tmp, br.BinaryIntOp.LessThan, bit_size, r_i, r_len),
            br.OpJumpIf(r_tmp, len(start)),
        ]
        vm, status = run_vm(memory, start + loop_body)
        assert status == VMStatus.FINISHED
        return vm.registers.get(r_sum)

    assert brillig_sum_memory([val(x) for x in (1, 2, 3, 4, 5)]) == val(15)
    assert brillig_sum_memory([val(1)] * 100) == val(100)


def test_call_and_return_recursion():
    def brillig_recursive_write_memory(memory):
        bit_size = 32
        r_i, r_len, r_tmp = reg(0), reg(1), reg(2)
        start = [
            br.OpConst(r_i, val(0)),
            br.OpConst(r_len, val(len(memory))),
            br.OpCall(4),
            br.OpJump(100),
        ]
        recursive_fn = [
            br.OpBinaryIntOp(r_tmp, br.BinaryIntOp.LessThanEquals, bit_size, r_len, r_i),
            br.OpJumpIf(r_tmp, len(start) + 6),
            br.OpStore(r_i, r_i),
            br.OpConst(r_tmp, val(1)),
            br.OpBinaryIntOp(r_i, br.BinaryIntOp.Add, bit_size, r_i, r_tmp),
            br.OpCall(len(start)),
            br.OpReturn(),
        ]
        vm, status = run_vm(memory, start + recursive_fn)
        assert status == VMStatus.FINISHED
        assert vm.call_stack == []
        return vm.get_memory()

    memory = brillig_recursive_write_memory([val(0)] * 5)
    assert memory == [val(i) for i in range(5)]


def test_foreign_call_register_result():
    opcodes = [
        br.OpConst(reg(0), val(5)),
        br.OpForeignCall(
            "double",
            destinations=(br.RomRegister(reg(1)),),
            inputs=(br.RomRegister(reg(0)),),
        ),
    ]
    vm = VM(Registers([]), [], opcodes, [], StubBlackBoxSolver())
    status = vm.process_opcodes()
    assert status == VMStatus.FOREIGN_CALL_WAIT
    assert vm.status_data.function == "double"
    assert vm.status_data.inputs == [[val(5)]]

    vm.foreign_call_results.append(br.ForeignCallResult.single(val(10)))
    vm.status = VMStatus.IN_PROGRESS
    status = vm.process_opcodes()
    assert status == VMStatus.FINISHED
    assert vm.registers.get(reg(1)) == val(10)
    assert vm.foreign_call_counter == 1


def test_foreign_call_memory_result():
    initial_matrix = [val(1), val(2), val(3), val(4)]
    expected = [val(1), val(3), val(2), val(4)]
    opcodes = [
        br.OpConst(reg(0), val(0)),
        br.OpConst(reg(1), val(0)),
        br.OpForeignCall(
            "matrix_2x2_transpose",
            destinations=(br.RomHeapArray(br.HeapArray(reg(1), 4)),),
            inputs=(br.RomHeapArray(br.HeapArray(reg(0), 4)),),
        ),
    ]
    vm = VM(Registers([]), initial_matrix, opcodes, [], StubBlackBoxSolver())
    status = vm.process_opcodes()
    assert status == VMStatus.FOREIGN_CALL_WAIT
    assert vm.status_data.inputs == [initial_matrix]

    vm.foreign_call_results.append(br.ForeignCallResult.array(expected))
    vm.status = VMStatus.IN_PROGRESS
    status = vm.process_opcodes()
    assert status == VMStatus.FINISHED
    assert vm.memory.read_slice(0, 4) == expected


def test_foreign_call_vector_input_output():
    input_string = [val(1), val(2), val(3), val(4)]
    output_string = [val(x) for x in (4, 3, 2, 1, 4, 3, 2, 1)]
    opcodes = [
        br.OpConst(reg(0), val(0)),
        br.OpConst(reg(1), val(len(input_string))),
        br.OpConst(reg(2), val(len(input_string))),
        br.OpConst(reg(3), val(len(input_string) * 2)),
        br.OpForeignCall(
            "string_double",
            destinations=(br.RomHeapVector(br.HeapVector(reg(2), reg(3))),),
            inputs=(br.RomHeapVector(br.HeapVector(reg(0), reg(1))),),
        ),
    ]
    vm = VM(Registers([]), list(input_string), opcodes, [], StubBlackBoxSolver())
    status = vm.process_opcodes()
    assert status == VMStatus.FOREIGN_CALL_WAIT
    vm.foreign_call_results.append(br.ForeignCallResult.array(output_string))
    vm.status = VMStatus.IN_PROGRESS
    status = vm.process_opcodes()
    assert status == VMStatus.FINISHED
    assert vm.memory.read_slice(len(input_string), len(output_string)) == output_string


def test_blackbox_sha256():
    message = b"hello world"
    msg_ptr = 0
    result_ptr = len(message)
    opcodes = [
        br.OpBlackBox(
            br.BBSha256(
                message=br.HeapVector(reg(0), reg(1)),
                output=br.HeapArray(reg(2), 32),
            )
        )
    ]
    memory = [val(b) for b in message]
    vm = VM(
        Registers([val(msg_ptr), val(len(message)), val(result_ptr)]),
        memory,
        opcodes,
        [],
        StubBlackBoxSolver(),
    )
    status = vm.process_opcodes()
    assert status == VMStatus.FINISHED
    digest = bytes(
        int(v.to_field()) for v in vm.memory.read_slice(result_ptr, 32)
    )
    assert digest == gv.SHA256_HELLO_WORLD


def test_int_op_semantics():
    from acvm_tpu.brillig_vm import evaluate_binary_int_op as ev
    from acvm_tpu.brillig import BinaryIntOp as Op

    def neg(a, bits):
        return (1 << bits) - a

    # 4-bit wraparound (reference arithmetic.rs tests)
    assert ev(Op.Add, 10, 10, 4) == 4
    assert ev(Op.Add, 5, neg(3, 4), 4) == 2
    assert ev(Op.Sub, 5, 10, 4) == neg(5, 4)
    assert ev(Op.Sub, 14, neg(3, 4), 4) == 1
    assert ev(Op.Mul, neg(1, 4), neg(5, 4), 4) == 5
    assert ev(Op.Mul, 2**127 - 1, 3, 127) == (2**127 - 1) - 2
    assert ev(Op.UnsignedDiv, 5, 3, 4) == 1
    assert ev(Op.UnsignedDiv, 5, 10, 4) == 0
    # signed division truncates toward zero
    assert ev(Op.SignedDiv, 5, neg(10, 32), 32) == 0
    assert ev(Op.SignedDiv, 5, neg(1, 32), 32) == neg(5, 32)
    assert ev(Op.SignedDiv, neg(5, 32), neg(1, 32), 32) == 5
    assert ev(Op.SignedDiv, 7, neg(2, 32), 32) == neg(3, 32)
    assert ev(Op.Shl, 1, 3, 8) == 8
    assert ev(Op.Shr, 9, 1, 8) == 4


def test_return_with_empty_callstack_fails():
    vm, status = run_vm([], [br.OpReturn()])
    assert status == VMStatus.FAILURE
    assert "callstack already empty" in vm.status_data.message
