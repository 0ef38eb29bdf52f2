"""Batched Brillig execution for straight-line bytecode.

The Brillig VM (``acvm_tpu.brillig_vm``) is a sequential interpreter; the hint
blocks the stdlib emits (uint arithmetic helpers: one Const or one BinaryIntOp,
reference stdlib/src/blackbox_fallbacks/uint.rs:43-92,213-264) are straight-line
register programs with no data-dependent control flow.  Those are batched here
by *symbolic execution*: registers hold either host constants (folded) or
(B, NUM_LIMBS) limb arrays, and each VM instruction maps to vectorized limb
kernels.  Bytecode with jumps/calls/memory/foreign-calls falls back to the
host-stage per-instance VM.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import jax.numpy as jnp

from .. import brillig as br
from ..fields.jnp_ops import LimbContext
from ..fields.limbs import int_to_limbs
from . import intops

RegValue = Union[int, jnp.ndarray]  # host constant | (B, L) batched limbs


class BrilligTraceError(Exception):
    pass


class BatchedRegisters:
    def __init__(self, batch: int, ctx: LimbContext):
        self.values: Dict[int, RegValue] = {}
        self.batch = batch
        self.ctx = ctx

    def get_arr(self, index: int) -> jnp.ndarray:
        v = self.values.get(int(index), 0)
        if isinstance(v, int):
            arr = jnp.asarray(int_to_limbs(v % self.ctx.params.modulus))
            return jnp.broadcast_to(arr, (self.batch,) + arr.shape)
        return v

    def get_const(self, index: int) -> Optional[int]:
        v = self.values.get(int(index), 0)
        return v if isinstance(v, int) else None

    def set(self, index: int, value: RegValue):
        self.values[int(index)] = value


def _field_binary(ctx: LimbContext, op: br.BinaryFieldOp, a, b):
    if op == br.BinaryFieldOp.Add:
        return ctx.add(a, b)
    if op == br.BinaryFieldOp.Sub:
        return ctx.sub(a, b)
    if op == br.BinaryFieldOp.Mul:
        return ctx.mont_mul(ctx.to_mont(a), b)
    if op == br.BinaryFieldOp.Div:
        # a / b in standard form: (aR) * (b^-1 R) * R^-1 = a b^-1 R, then strip R.
        num_m = ctx.to_mont(a)
        inv_m = ctx.mont_inv_grouped(ctx.to_mont(b))
        return ctx.from_mont(ctx.mont_mul(num_m, inv_m))
    if op == br.BinaryFieldOp.Equals:
        eq = ctx.eq(a, b)
        return _bool_to_limbs(eq)
    raise BrilligTraceError(f"unsupported field op {op}")


def _bool_to_limbs(flag: jnp.ndarray) -> jnp.ndarray:
    from ..fields.params import NUM_LIMBS

    out = jnp.zeros(flag.shape + (NUM_LIMBS,), dtype=jnp.uint32)
    return out.at[..., 0].set(flag.astype(jnp.uint32))


def _int_binary(ctx, op: br.BinaryIntOp, bit_size: int, a, b, b_const):
    m = lambda x: intops.mask_to_bits(x, bit_size)
    a_raw = a
    a = m(a)
    b = m(b)
    if op == br.BinaryIntOp.Add:
        return m(intops.int_add(a, b))
    if op == br.BinaryIntOp.Sub:
        return m(intops.int_sub(a, b))
    if op == br.BinaryIntOp.Mul:
        return m(intops.int_mul(a, b))
    if op == br.BinaryIntOp.UnsignedDiv:
        q, _ = intops.long_divmod(a, b, num_bits=min(bit_size, 256))
        return q
    if op == br.BinaryIntOp.SignedDiv:
        half = intops.shl_static(_one_limbs(a), bit_size - 1)
        a_neg = intops.int_geq(a, half)
        b_neg = intops.int_geq(b, half)
        abs_a = jnp.where(a_neg[..., None], m(intops.int_sub(_zero(a), a)), a)
        abs_b = jnp.where(b_neg[..., None], m(intops.int_sub(_zero(b), b)), b)
        q, _ = intops.long_divmod(abs_a, abs_b, num_bits=min(bit_size, 256))
        neg = a_neg ^ b_neg
        return jnp.where(neg[..., None], m(intops.int_sub(_zero(q), q)), q)
    if op == br.BinaryIntOp.Equals:
        return _bool_to_limbs(jnp.all(a == b, axis=-1))
    if op == br.BinaryIntOp.LessThan:
        return _bool_to_limbs(intops.int_lt(a, b))
    if op == br.BinaryIntOp.LessThanEquals:
        return _bool_to_limbs(~intops.int_lt(b, a))
    if op == br.BinaryIntOp.And:
        return a & b
    if op == br.BinaryIntOp.Or:
        return a | b
    if op == br.BinaryIntOp.Xor:
        return a ^ b
    if op in (br.BinaryIntOp.Shl, br.BinaryIntOp.Shr):
        if b_const is None:
            raise BrilligTraceError(
                "dynamic shift amounts require the host VM fallback"
            )
        if op == br.BinaryIntOp.Shl:
            return m(intops.shl_static(a, b_const))
        # Shr shifts the *unmasked* register value then reduces
        # (arithmetic.rs:75-79 applies the modulo to the shifted result).
        return m(intops.shr_static(a_raw, b_const))
    raise BrilligTraceError(f"unsupported int op {op}")


def _zero(like):
    return jnp.zeros_like(like)


def _one_limbs(like):
    return jnp.zeros_like(like).at[..., 0].set(1)


def trace_brillig(
    ctx: LimbContext,
    batch: int,
    bytecode,
    input_registers,
) -> BatchedRegisters:
    """Symbolically execute straight-line bytecode over batched registers.

    ``input_registers`` is a list of (B, L) arrays (or ints) loaded into
    registers 0..n-1, mirroring Registers::load in the sequential path.
    """
    regs = BatchedRegisters(batch, ctx)
    for i, value in enumerate(input_registers):
        regs.set(i, value)

    for pc, op in enumerate(bytecode):
        if isinstance(op, br.OpStop):
            break
        if isinstance(op, br.OpConst):
            regs.set(op.destination, int(op.value.inner))
        elif isinstance(op, br.OpMov):
            regs.set(op.destination, regs.values.get(int(op.source), 0))
        elif isinstance(op, br.OpBinaryFieldOp):
            a = regs.get_arr(op.lhs)
            b = regs.get_arr(op.rhs)
            regs.set(op.destination, _field_binary(ctx, op.op, a, b))
        elif isinstance(op, br.OpBinaryIntOp):
            a = regs.get_arr(op.lhs)
            b = regs.get_arr(op.rhs)
            b_const = regs.get_const(op.rhs)
            regs.set(
                op.destination,
                _int_binary(ctx, op.op, op.bit_size, a, b, b_const),
            )
        else:
            raise BrilligTraceError(
                f"opcode {type(op).__name__} at pc {pc} is not traceable; "
                "use the host VM fallback"
            )
    return regs
