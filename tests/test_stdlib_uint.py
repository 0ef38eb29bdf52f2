"""Per-op differential tests for the stdlib UInt gadget library.

Mirrors the reference proptest matrix (`/root/reference/acvm/tests/stdlib.rs:23-193`,
macros test_uint!/test_uint_inner!) with fixed-seed random operands: every
UIntGadget op — rol/ror/euclidean_division/add/sub/mul/shl/shr/lt/gte and the
bitwise and/or/xor/not — is emitted as raw opcodes (Brillig hint + arithmetic
constraints) and solved with the sequential engine; results must equal the
Python machine-int semantics the reference checks against Rust's
rotate_left/div_euclid/overflowing_shl etc.
"""

import random

import pytest

from acvm_tpu.acir import Witness, WitnessMap
from acvm_tpu.blackbox import StubBlackBoxSolver
from acvm_tpu.fields import FieldElement
from acvm_tpu.pwg import ACVM, ACVMStatus
from acvm_tpu.stdlib.uint import UIntGadget

WIDTHS = (8, 32, 64)
CASES_PER_OP = 6

rng = random.Random(271828)


def solve_ops(opcodes, assignment):
    wm = WitnessMap()
    for k, v in assignment.items():
        wm.insert(Witness(k), FieldElement(v))
    acvm = ACVM(StubBlackBoxSolver(), opcodes, wm)
    status = acvm.solve()
    assert status == ACVMStatus.SOLVED, getattr(acvm, "error", None)
    return acvm.finalize()


def value_of(solved, gadget):
    return int(solved.get(gadget.inner))


def rand_u(width):
    return rng.randrange(1 << width)


def rotl(x, r, w):
    r %= w
    return ((x << r) | (x >> (w - r))) & ((1 << w) - 1) if r else x


def rotr(x, r, w):
    return rotl(x, w - (r % w), w) if r % w else x


@pytest.mark.parametrize("width", WIDTHS)
def test_uint_rol_ror(width):
    # The reference draws rotations in 0..32 regardless of width
    # (stdlib.rs:73, Rust rotate_left reduces mod the bit width).
    for _ in range(CASES_PER_OP):
        x = rand_u(width)
        y = rng.randrange(32)
        for op, expected in (("rol", rotl(x, y, width)), ("ror", rotr(x, y, width))):
            g = UIntGadget(Witness(1), width)
            out, opcodes, _ = getattr(g, op)(y, 2)
            solved = solve_ops(opcodes, {1: x})
            assert value_of(solved, out) == expected, (width, op, x, y)


@pytest.mark.parametrize("width", WIDTHS)
def test_uint_shifts(width):
    for _ in range(CASES_PER_OP):
        x = rand_u(width)
        y = rng.randrange(32)
        mask = (1 << width) - 1
        # Rust overflowing_shl/shr shift by y % width (stdlib.rs:178,192).
        left = (x << (y % width)) & mask
        right = x >> (y % width)
        for op, expected in (("leftshift", left), ("rightshift", right)):
            g = UIntGadget(Witness(1), width)
            out, opcodes, _ = getattr(g, op)(y, 2)
            solved = solve_ops(opcodes, {1: x})
            assert value_of(solved, out) == expected, (width, op, x, y)


@pytest.mark.parametrize("width", WIDTHS)
def test_uint_euclidean_division(width):
    for _ in range(CASES_PER_OP):
        x = rand_u(width)
        y = rng.randrange(1, 1 << width)
        a = UIntGadget(Witness(1), width)
        b = UIntGadget(Witness(2), width)
        q, r, opcodes, _ = UIntGadget.euclidean_division(a, b, 3)
        solved = solve_ops(opcodes, {1: x, 2: y})
        assert value_of(solved, q) == x // y, (width, x, y)
        assert value_of(solved, r) == x % y, (width, x, y)


@pytest.mark.parametrize("width", WIDTHS)
def test_uint_add_sub_chained(width):
    # Chained x op y op z, wrapping at the width (stdlib.rs:130-170).
    mask = (1 << width) - 1
    for _ in range(CASES_PER_OP):
        x, y, z = rand_u(width), rand_u(width), rand_u(width)
        for op, expected in (
            ("add", ((x + y) + z) & mask),
            ("sub", ((x - y) - z) & mask),
        ):
            a = UIntGadget(Witness(1), width)
            b = UIntGadget(Witness(2), width)
            c = UIntGadget(Witness(3), width)
            opcodes = []
            t, extra, nw = getattr(a, op)(b, 4)
            opcodes.extend(extra)
            out, extra, _ = getattr(t, op)(c, nw)
            opcodes.extend(extra)
            solved = solve_ops(opcodes, {1: x, 2: y, 3: z})
            assert value_of(solved, out) == expected, (width, op, x, y, z)


@pytest.mark.parametrize("width", WIDTHS)
def test_uint_mul(width):
    mask = (1 << width) - 1
    for _ in range(CASES_PER_OP):
        x, y = rand_u(width), rand_u(width)
        a = UIntGadget(Witness(1), width)
        b = UIntGadget(Witness(2), width)
        out, opcodes, _ = a.mul(b, 3)
        solved = solve_ops(opcodes, {1: x, 2: y})
        assert value_of(solved, out) == (x * y) & mask, (width, x, y)


@pytest.mark.parametrize("width", WIDTHS)
def test_uint_bitwise(width):
    for _ in range(CASES_PER_OP):
        x, y = rand_u(width), rand_u(width)
        for op, expected in (
            ("and_", x & y),
            ("xor", x ^ y),
            ("or_", x | y),
        ):
            a = UIntGadget(Witness(1), width)
            b = UIntGadget(Witness(2), width)
            out, opcodes, _ = getattr(a, op)(b, 3)
            solved = solve_ops(opcodes, {1: x, 2: y})
            assert value_of(solved, out) == expected, (width, op, x, y)


@pytest.mark.parametrize("width", WIDTHS)
def test_uint_not(width):
    mask = (1 << width) - 1
    for _ in range(CASES_PER_OP):
        x = rand_u(width)
        a = UIntGadget(Witness(1), width)
        out, opcodes, _ = a.not_(2)
        solved = solve_ops(opcodes, {1: x})
        assert value_of(solved, out) == (~x) & mask, (width, x)


@pytest.mark.parametrize("width", WIDTHS)
def test_uint_comparisons(width):
    cases = [(rand_u(width), rand_u(width)) for _ in range(CASES_PER_OP)]
    x = rand_u(width)
    cases += [(x, x), (0, (1 << width) - 1), ((1 << width) - 1, 0)]
    for x, y in cases:
        a = UIntGadget(Witness(1), width)
        b = UIntGadget(Witness(2), width)
        lt, opcodes, _ = a.less_than_comparison(b, 3)
        solved = solve_ops(opcodes, {1: x, 2: y})
        assert value_of(solved, lt) == int(x < y), (width, x, y)

        a = UIntGadget(Witness(1), width)
        b = UIntGadget(Witness(2), width)
        gte, opcodes, _ = a.more_than_eq_comparison(b, 3)
        solved = solve_ops(opcodes, {1: x, 2: y})
        assert value_of(solved, gte) == int(x >= y), (width, x, y)
