"""Tier-2 device Brillig VM: batched execution of DIVERGENT bytecode.

Tier 1 (`brillig_trace.py`) batches straight-line hint blocks by symbolic
execution; anything with Jump/JumpIf/Load/Store previously fell back to one
host interpreter run per instance (10k instances -> 10k sequential VM runs).
This module runs such bytecode for the whole batch on device as a SIMD
interpreter:

* a ``lax.while_loop`` steps per-instance program counters until every
  instance halts (the reference dispatch loop, brillig_vm/src/lib.rs:136-307);
* each step gathers every instance's instruction descriptor from static
  tables (kind / operand registers / jump target / per-pc bit-size masks) and
  computes the result of every opcode KIND PRESENT IN THE BYTECODE over the
  full batch, selecting per instance by kind — divergence costs one extra
  vector op per present kind, not a serialization;
* registers and memory are fixed-size limb tensors ((B, NR, L), (B, M, L));
  register files mirror grow-on-set/read-zero semantics
  (brillig_vm/src/registers.rs:9-43) because NR bounds every STATIC register
  index in the bytecode.

Failure semantics: Trap and Return-on-empty-callstack map to per-instance
failures (the reference's BrilligFunctionFailed, brillig.rs:114-125).
Engine-capacity escapes (memory pointer beyond the static cap, call stack
deeper than the static bound, step budget exhausted) are NOT reference
failures — the caller re-runs the whole stage per instance on the host VM,
so capacity limits can never change results.  Reads of never-written memory
return 0 here; the host VM raises IndexError (a Rust panic in the
reference) — bytecode relying on that is rejected by ``device_vm_eligible``
callers falling back when the differential flags it.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import brillig as br
from ..acir import opcodes as ops
from ..fields.jnp_ops import LimbContext
from ..fields.limbs import int_to_limbs
from ..fields.params import BN254_FR, LIMB_BITS, NUM_LIMBS
from . import intops

L = NUM_LIMBS

# opcode kinds
K_BIN_FIELD = 0
K_BIN_INT = 1
K_JUMP = 2
K_JUMP_IF = 3
K_JUMP_IF_NOT = 4
K_CALL = 5
K_RETURN = 6
K_CONST = 7
K_MOV = 8
K_LOAD = 9
K_STORE = 10
K_TRAP = 11
K_STOP = 12

_REG_WRITERS = (K_BIN_FIELD, K_BIN_INT, K_CONST, K_MOV, K_LOAD)

_TIER2_OPS = (
    br.OpBinaryFieldOp,
    br.OpBinaryIntOp,
    br.OpJump,
    br.OpJumpIf,
    br.OpJumpIfNot,
    br.OpCall,
    br.OpReturn,
    br.OpConst,
    br.OpMov,
    br.OpLoad,
    br.OpStore,
    br.OpTrap,
    br.OpStop,
)

MAX_REGISTERS = 512  # static bound; larger bytecode falls back to the host
CALL_STACK_DEPTH = 32


def device_vm_eligible(brillig: ops.Brillig) -> bool:
    """Bytecode the tier-2 device VM can run: the 13 control/data opcodes
    (no ForeignCall — replay semantics need the host — and no BlackBox),
    with statically-bounded register usage."""
    if brillig.foreign_call_results:
        return False
    max_reg = 0
    for op in brillig.bytecode:
        if not isinstance(op, _TIER2_OPS):
            return False
        for attr in ("destination", "lhs", "rhs", "source", "condition",
                     "source_pointer", "destination_pointer"):
            reg = getattr(op, attr, None)
            if reg is not None:
                max_reg = max(max_reg, int(reg))
    if max_reg + len(brillig.inputs) + len(brillig.outputs) >= MAX_REGISTERS:
        return False
    return True


class _Program:
    """Static instruction tables for one bytecode block."""

    def __init__(self, bytecode: List[br.BrilligOpcode], p: int):
        n = len(bytecode)
        self.n_pc = n
        self.kind = np.full(n, K_STOP, np.int32)
        self.dst = np.zeros(n, np.int32)
        self.lhs = np.zeros(n, np.int32)
        self.rhs = np.zeros(n, np.int32)
        self.subop = np.zeros(n, np.int32)
        self.loc = np.zeros(n, np.int32)
        self.bitmask = np.zeros((n, L), np.uint32)  # BIN_INT operand masks
        self.bit_size = np.zeros(n, np.uint32)
        self.const = np.zeros((n, L), np.uint32)
        self.field_subops: set = set()
        self.int_subops: set = set()
        self.kinds_present: set = set()
        max_reg = 0

        def reg(x):
            nonlocal max_reg
            max_reg = max(max_reg, int(x))
            return int(x)

        for pc, op in enumerate(bytecode):
            if isinstance(op, br.OpBinaryFieldOp):
                self.kind[pc] = K_BIN_FIELD
                self.dst[pc] = reg(op.destination)
                self.lhs[pc] = reg(op.lhs)
                self.rhs[pc] = reg(op.rhs)
                self.subop[pc] = int(op.op.value if hasattr(op.op, "value")
                                     else op.op)
                self.field_subops.add(op.op)
            elif isinstance(op, br.OpBinaryIntOp):
                self.kind[pc] = K_BIN_INT
                self.dst[pc] = reg(op.destination)
                self.lhs[pc] = reg(op.lhs)
                self.rhs[pc] = reg(op.rhs)
                self.subop[pc] = int(op.op.value if hasattr(op.op, "value")
                                     else op.op)
                bits = int(op.bit_size)
                self.bit_size[pc] = min(bits, 256)
                mask = np.zeros(L, np.uint32)
                for j in range(L):
                    lo = j * LIMB_BITS
                    width = max(0, min(LIMB_BITS, bits - lo))
                    mask[j] = (1 << width) - 1
                self.bitmask[pc] = mask
                self.int_subops.add(op.op)
            elif isinstance(op, br.OpJump):
                self.kind[pc] = K_JUMP
                self.loc[pc] = int(op.location)
            elif isinstance(op, br.OpJumpIf):
                self.kind[pc] = K_JUMP_IF
                self.lhs[pc] = reg(op.condition)
                self.loc[pc] = int(op.location)
            elif isinstance(op, br.OpJumpIfNot):
                self.kind[pc] = K_JUMP_IF_NOT
                self.lhs[pc] = reg(op.condition)
                self.loc[pc] = int(op.location)
            elif isinstance(op, br.OpCall):
                self.kind[pc] = K_CALL
                self.loc[pc] = int(op.location)
            elif isinstance(op, br.OpReturn):
                self.kind[pc] = K_RETURN
            elif isinstance(op, br.OpConst):
                self.kind[pc] = K_CONST
                self.dst[pc] = reg(op.destination)
                self.const[pc] = int_to_limbs(int(op.value.to_field()) % p)
            elif isinstance(op, br.OpMov):
                self.kind[pc] = K_MOV
                self.dst[pc] = reg(op.destination)
                self.lhs[pc] = reg(op.source)
            elif isinstance(op, br.OpLoad):
                self.kind[pc] = K_LOAD
                self.dst[pc] = reg(op.destination)
                self.lhs[pc] = reg(op.source_pointer)
            elif isinstance(op, br.OpStore):
                self.kind[pc] = K_STORE
                self.lhs[pc] = reg(op.source)
                self.rhs[pc] = reg(op.destination_pointer)
            elif isinstance(op, br.OpTrap):
                self.kind[pc] = K_TRAP
            elif isinstance(op, br.OpStop):
                self.kind[pc] = K_STOP
            else:  # pragma: no cover - guarded by device_vm_eligible
                raise TypeError(op)
            self.kinds_present.add(int(self.kind[pc]))
        self.max_reg = max_reg


def _scalar_of(v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, L) limb value -> (u32 scalar from the low 32 bits, huge-flag)."""
    s = v[..., 0] | (v[..., 1] << LIMB_BITS)
    huge = jnp.any(v[..., 2:] != 0, axis=-1)
    return s, huge


def _bool_limbs(flag: jnp.ndarray) -> jnp.ndarray:
    out = jnp.zeros(flag.shape + (L,), jnp.uint32)
    return out.at[..., 0].set(flag.astype(jnp.uint32))


@partial(
    jax.jit,
    static_argnames=("prog", "n_regs", "mem_cap", "max_steps", "unroll"),
)
def _run_vm(
    regs0: jnp.ndarray,  # (B, NR, L) initial registers
    mem0: jnp.ndarray,  # (B, M, L) initial memory
    prog: "_ProgramKey",
    n_regs: int,
    mem_cap: int,
    max_steps: int,
    unroll: int = 4,
):
    """Run the SIMD interpreter; returns (regs, mem, trap_fail, escape)."""
    program: _Program = prog.program
    ctx = LimbContext(prog.params)
    B = regs0.shape[0]
    n_pc = program.n_pc
    kinds = jnp.asarray(program.kind)
    t_dst = jnp.asarray(program.dst)
    t_lhs = jnp.asarray(program.lhs)
    t_rhs = jnp.asarray(program.rhs)
    t_sub = jnp.asarray(program.subop)
    t_loc = jnp.asarray(program.loc)
    t_mask = jnp.asarray(program.bitmask)
    t_bits = jnp.asarray(program.bit_size)
    t_const = jnp.asarray(program.const)
    idx = jnp.arange(B)

    # Per-row dynamic gathers/scatters lower to scalar-core loops on TPU and
    # dominated the step (measured ~630 us/step at B=8192, ~95% of the VM's
    # runtime); for the small tables involved (bytecode length, register
    # file, memory cap) a where-chain over a one-hot comparison is a handful
    # of full-width vector selects instead.  Beyond the threshold the
    # gather is likely cheaper than a 100+-way select chain.
    _SEL = 48

    def take_small(table, rows, n):
        """table (n, ...) gathered at rows (B,) -> (B, ...)."""
        if n > _SEL:
            return jnp.take(table, rows, axis=0)
        extra = table.ndim - 1
        cond = [rows == i for i in range(n)]
        out = jnp.zeros((B,) + table.shape[1:], table.dtype)
        for i in range(n):
            c = cond[i].reshape((B,) + (1,) * extra)
            out = jnp.where(c, table[i], out)
        return out

    def row_gather(panel, rows, n):
        """panel (B, n, ...) gathered at per-row rows (B,) -> (B, ...)."""
        if n > _SEL:
            return panel[idx, rows]
        extra = panel.ndim - 2
        out = jnp.zeros((B,) + panel.shape[2:], panel.dtype)
        for i in range(n):
            c = (rows == i).reshape((B,) + (1,) * extra)
            out = jnp.where(c, panel[:, i], out)
        return out

    def row_scatter(panel, rows, val, do, n):
        """panel (B, n, ...) with val (B, ...) written at rows where do."""
        if n > _SEL:
            return panel.at[idx, rows].set(
                jnp.where(
                    do.reshape((B,) + (1,) * (panel.ndim - 2)),
                    val,
                    panel[idx, rows],
                )
            )
        extra = panel.ndim - 2
        cols = []
        for i in range(n):
            c = (do & (rows == i)).reshape((B,) + (1,) * extra)
            cols.append(jnp.where(c, val, panel[:, i]))
        return jnp.stack(cols, axis=1)

    def cond(state):
        pc, halted, trap, escape, regs, mem, cstack, sp, steps = state
        return jnp.any(~(halted | trap | escape)) & (steps < max_steps)

    def stepN(state):
        # Unrolled multi-step body: the while loop's per-iteration overhead
        # (cond evaluation, state threading) dominated short opcodes at
        # ~127 us/step; halted/trapped instances are no-ops inside step()
        # (every write is gated on ``live``), so running ``unroll`` pcs per
        # iteration is semantics-preserving.
        for _ in range(unroll):
            state = step(state)
        return state

    def step(state):
        pc, halted, trap, escape, regs, mem, cstack, sp, steps = state
        live = ~(halted | trap | escape)
        pcc = jnp.clip(pc, 0, n_pc - 1)
        kind = take_small(kinds, pcc, n_pc)
        dst = jnp.clip(take_small(t_dst, pcc, n_pc), 0, n_regs - 1)
        a = row_gather(
            regs, jnp.clip(take_small(t_lhs, pcc, n_pc), 0, n_regs - 1),
            n_regs,
        )  # (B, L)
        b = row_gather(
            regs, jnp.clip(take_small(t_rhs, pcc, n_pc), 0, n_regs - 1),
            n_regs,
        )
        loc = take_small(t_loc, pcc, n_pc)

        res = jnp.zeros((B, L), jnp.uint32)
        new_trap = jnp.zeros((B,), bool)
        new_escape = jnp.zeros((B,), bool)

        if K_CONST in program.kinds_present:
            res = jnp.where(
                (kind == K_CONST)[:, None],
                take_small(t_const, pcc, n_pc),
                res,
            )
        if K_MOV in program.kinds_present:
            res = jnp.where((kind == K_MOV)[:, None], a, res)

        if K_BIN_FIELD in program.kinds_present:
            sub = take_small(t_sub, pcc, n_pc)
            sel = kind == K_BIN_FIELD
            f = br.BinaryFieldOp
            fres = jnp.zeros((B, L), jnp.uint32)
            if f.Add in program.field_subops:
                fres = jnp.where(
                    (sub == int(f.Add.value))[:, None], ctx.add(a, b), fres
                )
            if f.Sub in program.field_subops:
                fres = jnp.where(
                    (sub == int(f.Sub.value))[:, None], ctx.sub(a, b), fres
                )
            if f.Mul in program.field_subops:
                fres = jnp.where(
                    (sub == int(f.Mul.value))[:, None],
                    ctx.mont_mul(ctx.to_mont(a), b),
                    fres,
                )
            if f.Div in program.field_subops:
                inv_m = ctx.mont_inv_grouped(ctx.to_mont(b))  # 0 -> 0
                div = ctx.from_mont(ctx.mont_mul(ctx.to_mont(a), inv_m))
                fres = jnp.where((sub == int(f.Div.value))[:, None], div, fres)
            if f.Equals in program.field_subops:
                fres = jnp.where(
                    (sub == int(f.Equals.value))[:, None],
                    _bool_limbs(ctx.eq(a, b)),
                    fres,
                )
            res = jnp.where(sel[:, None], fres, res)

        if K_BIN_INT in program.kinds_present:
            sub = take_small(t_sub, pcc, n_pc)
            sel = kind == K_BIN_INT
            opm = take_small(t_mask, pcc, n_pc)  # (B, L)
            bits = take_small(t_bits, pcc, n_pc)  # (B,)
            am = a & opm
            bm = b & opm
            i = br.BinaryIntOp
            ires = jnp.zeros((B, L), jnp.uint32)

            def put(op_enum, val):
                nonlocal ires
                ires = jnp.where(
                    (sub == int(op_enum.value))[:, None], val, ires
                )

            if i.Add in program.int_subops:
                put(i.Add, intops.int_add(am, bm) & opm)
            if i.Sub in program.int_subops:
                put(i.Sub, intops.int_sub(am, bm) & opm)
            if i.Mul in program.int_subops:
                put(i.Mul, intops.int_mul(am, bm) & opm)
            if i.UnsignedDiv in program.int_subops:
                q, _ = intops.long_divmod(am, bm, num_bits=256)
                put(i.UnsignedDiv, q)
                # BigUint division by zero is a reference panic.
                new_trap = new_trap | (
                    live & sel & (sub == int(i.UnsignedDiv.value))
                    & intops.is_zero(bm)
                )
            if i.SignedDiv in program.int_subops:
                # Two's-complement division truncating toward zero
                # (arithmetic.rs:51-99); sign bit via the dynamic half bound.
                half = intops.shl_dynamic(
                    _bool_limbs(jnp.ones((B,), bool)), bits - 1
                )
                a_neg = intops.int_geq(am, half)
                b_neg = intops.int_geq(bm, half)
                neg = lambda x: intops.int_sub(jnp.zeros_like(x), x) & opm
                abs_a = jnp.where(a_neg[:, None], neg(am), am)
                abs_b = jnp.where(b_neg[:, None], neg(bm), bm)
                q, _ = intops.long_divmod(abs_a, abs_b, num_bits=256)
                signed = jnp.where((a_neg ^ b_neg)[:, None], neg(q), q)
                put(i.SignedDiv, jnp.where(
                    intops.is_zero(bm)[:, None], 0, signed
                ))
            if i.Equals in program.int_subops:
                put(i.Equals, _bool_limbs(jnp.all(am == bm, axis=-1)))
            if i.LessThan in program.int_subops:
                put(i.LessThan, _bool_limbs(intops.int_lt(am, bm)))
            if i.LessThanEquals in program.int_subops:
                put(i.LessThanEquals, _bool_limbs(~intops.int_lt(bm, am)))
            if i.And in program.int_subops:
                put(i.And, am & bm)
            if i.Or in program.int_subops:
                put(i.Or, am | bm)
            if i.Xor in program.int_subops:
                put(i.Xor, am ^ bm)
            if i.Shl in program.int_subops or i.Shr in program.int_subops:
                s_raw, huge = _scalar_of(b)
                s = jnp.where(huge, jnp.uint32(1 << 16), s_raw)
            if i.Shl in program.int_subops:
                # (a << s) mod 2^bits == ((a mod 2^bits) << min(s, bits))
                # mod 2^bits.
                put(i.Shl, intops.shl_dynamic(am, jnp.minimum(s, bits)) & opm)
            if i.Shr in program.int_subops:
                # Shifts the RAW register value, then reduces
                # (arithmetic.rs:75-79).
                put(i.Shr, intops.shr_dynamic(
                    a, jnp.minimum(s, jnp.uint32(256))
                ) & opm)
            res = jnp.where(sel[:, None], ires, res)

        if K_LOAD in program.kinds_present:
            sel = kind == K_LOAD
            ptr, huge = _scalar_of(a)
            oob = huge | (ptr >= mem_cap)
            val = row_gather(
                mem, jnp.clip(ptr, 0, mem_cap - 1).astype(jnp.int32),
                mem_cap,
            )
            res = jnp.where((sel & ~oob)[:, None], val, res)
            new_escape = new_escape | (live & sel & oob)

        if K_STORE in program.kinds_present:
            sel = kind == K_STORE
            ptr, huge = _scalar_of(b)  # destination_pointer register
            oob = huge | (ptr >= mem_cap)
            do = live & sel & ~oob
            ptr_c = jnp.clip(ptr, 0, mem_cap - 1).astype(jnp.int32)
            mem = row_scatter(mem, ptr_c, a, do, mem_cap)
            new_escape = new_escape | (live & sel & oob)

        # register write-back
        writes = jnp.zeros((B,), bool)
        for k in _REG_WRITERS:
            if k in program.kinds_present:
                writes = writes | (kind == k)
        writes = writes & live & ~new_trap & ~new_escape
        regs = row_scatter(regs, dst, res, writes, n_regs)

        # control flow
        next_pc = pc + 1
        if K_JUMP in program.kinds_present:
            next_pc = jnp.where(kind == K_JUMP, loc, next_pc)
        if K_JUMP_IF in program.kinds_present:
            nz = jnp.any(a != 0, axis=-1)
            next_pc = jnp.where((kind == K_JUMP_IF) & nz, loc, next_pc)
        if K_JUMP_IF_NOT in program.kinds_present:
            z = jnp.all(a == 0, axis=-1)
            next_pc = jnp.where((kind == K_JUMP_IF_NOT) & z, loc, next_pc)
        if K_CALL in program.kinds_present:
            sel = kind == K_CALL
            over = sp >= CALL_STACK_DEPTH
            sp_c = jnp.clip(sp, 0, CALL_STACK_DEPTH - 1)
            do = live & sel & ~over
            cstack = row_scatter(cstack, sp_c, pc, do, CALL_STACK_DEPTH)
            sp = jnp.where(do, sp + 1, sp)
            next_pc = jnp.where(sel, loc, next_pc)
            new_escape = new_escape | (live & sel & over)
        if K_RETURN in program.kinds_present:
            sel = kind == K_RETURN
            empty = sp == 0
            # "return opcode hit, but callstack already empty" — a genuine
            # reference failure (lib.rs:263-267).
            new_trap = new_trap | (live & sel & empty)
            sp_c = jnp.clip(sp - 1, 0, CALL_STACK_DEPTH - 1)
            ret = row_gather(cstack, sp_c, CALL_STACK_DEPTH) + 1
            next_pc = jnp.where(sel & ~empty, ret, next_pc)
            sp = jnp.where(live & sel & ~empty, sp - 1, sp)
        if K_TRAP in program.kinds_present:
            new_trap = new_trap | (live & (kind == K_TRAP))

        stopped = kind == K_STOP
        done = stopped | (next_pc >= n_pc)
        halted = halted | (live & done & ~new_trap & ~new_escape)
        trap = trap | (live & new_trap)
        escape = escape | (live & new_escape)
        pc = jnp.where(live, next_pc, pc)
        return (pc, halted, trap, escape, regs, mem, cstack, sp, steps + 1)

    state = (
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), bool),
        regs0,
        mem0,
        jnp.zeros((B, CALL_STACK_DEPTH), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    pc, halted, trap, escape, regs, mem, cstack, sp, steps = (
        jax.lax.while_loop(cond, stepN, state)
    )
    # Instances still live at the step cap are escapes (host re-runs them;
    # the reference would keep looping).
    escape = escape | ~(halted | trap | escape)
    return regs, mem, trap, escape


class _ProgramKey:
    """Hashable jit key wrapping a compiled _Program (identity hash: one
    cache entry per bytecode block, which is what we want)."""

    def __init__(self, program: _Program, params):
        self.program = program
        self.params = params

    def __hash__(self):
        return id(self.program)

    def __eq__(self, other):
        return self is other


_PROGRAM_CACHE: Dict[int, _ProgramKey] = {}


def _program_for(brillig: ops.Brillig, params) -> _ProgramKey:
    key = id(brillig)
    entry = _PROGRAM_CACHE.get(key)
    if entry is None:
        entry = _ProgramKey(_Program(brillig.bytecode, params.modulus), params)
        _PROGRAM_CACHE[key] = entry
    return entry


def run_brillig_vm_batch(
    brillig: ops.Brillig,
    get_col,
    batch: int,
    p: int,
) -> Tuple[Dict[int, np.ndarray], np.ndarray]:
    """Execute a divergent Brillig block for every instance on device.

    Returns ({witness: (B,) object ints}, trap_mask).  Raises
    ``HostBatchFallback`` when any instance needs host semantics (capacity
    escape) — rare; the caller then re-runs the stage per instance.
    Mirrors BrilligSolver.solve (acvm/src/pwg/brillig.rs:20-130): predicate
    == 0 zeroes outputs; inputs load registers 0..n-1 with array inputs
    flattened into memory behind a base pointer.
    """
    from .host_batch import HostBatchFallback, eval_expr_batch

    params = BN254_FR if p == BN254_FR.modulus else None
    if params is None:  # non-default field: host path keeps bit-exactness
        raise HostBatchFallback("device VM supports the default field only")

    prog = _program_for(brillig, params)
    program = prog.program

    pred = None
    if brillig.predicate is not None:
        pred = eval_expr_batch(brillig.predicate, get_col, batch, p)
        if not any(pred):
            return (
                {
                    int(out.witness): np.zeros(batch, dtype=object)
                    for out in brillig.outputs
                },
                np.zeros(batch, dtype=bool),
            )

    # Registers 0..n_inputs-1; array inputs flatten into initial memory.
    input_cols: List[np.ndarray] = []
    mem_cols: List[np.ndarray] = []
    for inp in brillig.inputs:
        if isinstance(inp, ops.BrilligInputSingle):
            input_cols.append(eval_expr_batch(inp.expr, get_col, batch, p))
        elif isinstance(inp, ops.BrilligInputArray):
            base = len(mem_cols)
            for e in inp.exprs:
                mem_cols.append(eval_expr_batch(e, get_col, batch, p))
            input_cols.append(np.full(batch, base, dtype=object))
        else:  # pragma: no cover
            raise HostBatchFallback(f"unknown input {inp!r}")

    n_regs = max(
        program.max_reg + 1, len(input_cols), len(brillig.outputs), 1
    )
    if n_regs > MAX_REGISTERS:
        raise HostBatchFallback("register file exceeds the device bound")
    mem_cap = max(32, 2 * len(mem_cols) + 32)
    import os

    max_steps = int(
        os.environ.get("ACVM_TPU_DEVICE_VM_STEPS", 64 * program.n_pc + 1024)
    )

    def cols_to_limbs(cols: List[np.ndarray]) -> np.ndarray:
        n = len(cols)
        out = np.zeros((batch, max(n, 1), L), np.uint32)
        nbytes = L * LIMB_BITS // 8
        for k, col in enumerate(cols):
            try:
                # < 2^64 (< p, so already reduced): vectorized limb split
                # instead of per-element to_bytes.
                v64 = col.astype(np.uint64)
            except (OverflowError, TypeError):
                buf = b"".join(
                    (int(v) % p).to_bytes(nbytes, "little") for v in col
                )
                out[:, k] = np.frombuffer(buf, dtype="<u2").reshape(batch, L)
                continue
            for li in range(64 // LIMB_BITS):
                out[:, k, li] = (
                    (v64 >> np.uint64(LIMB_BITS * li)) & np.uint64(0xFFFF)
                ).astype(np.uint32)
        return out

    regs0 = np.zeros((batch, n_regs, L), np.uint32)
    if input_cols:
        regs0[:, : len(input_cols)] = cols_to_limbs(input_cols)[
            :, : len(input_cols)
        ]
    mem0 = np.zeros((batch, mem_cap, L), np.uint32)
    if mem_cols:
        mem0[:, : len(mem_cols)] = cols_to_limbs(mem_cols)[
            :, : len(mem_cols)
        ]

    regs, mem, trap, escape = _run_vm(
        jnp.asarray(regs0), jnp.asarray(mem0), prog, n_regs, mem_cap,
        max_steps,
    )
    # ONE consolidated device->host transfer: separate np.asarray readbacks
    # cost one ~24 ms tunnel round trip EACH (escape + trap + regs + mem was
    # ~100 ms of pure RTT), and the memory panel only matters when the block
    # has array outputs.
    has_array_out = any(
        isinstance(o, ops.BrilligOutputArray) for o in brillig.outputs
    )
    fetch = [escape, trap, regs[:, : len(brillig.outputs)]]
    if has_array_out:
        fetch.append(mem)
    fetched = jax.device_get(fetch)
    escape_np, trap_np, regs_np = fetched[0], fetched[1], fetched[2]
    mem_np = fetched[3] if has_array_out else None
    if escape_np.any():
        raise HostBatchFallback(
            "device VM capacity escape (memory/call-stack/step bound)"
        )

    def limbs_to_obj(arr: np.ndarray) -> np.ndarray:
        if not arr[..., 4:].any():
            # < 2^64: compose in vectorized uint64, box once.
            v = arr[..., 0].astype(np.uint64)
            for li in range(1, 64 // LIMB_BITS):
                v |= arr[..., li].astype(np.uint64) << np.uint64(
                    LIMB_BITS * li
                )
            return v.astype(object)
        acc = np.zeros(arr.shape[:-1], dtype=object)
        for li in range(L):
            acc += arr[..., li].astype(object) << (LIMB_BITS * li)
        return acc
    out: Dict[int, np.ndarray] = {}
    pred_mask = None
    if pred is not None:
        pred_mask = np.array([1 if v else 0 for v in pred], dtype=object)
    for i, output in enumerate(brillig.outputs):
        if isinstance(output, ops.BrilligOutputSimple):
            vals = limbs_to_obj(regs_np[:, i])
            if pred_mask is not None:
                vals = vals * pred_mask
            out[int(output.witness)] = vals
        elif isinstance(output, ops.BrilligOutputArray):
            base = limbs_to_obj(regs_np[:, i])  # per-instance pointer
            base_i = np.array([int(v) for v in base], np.int64)
            if (base_i + len(output.witnesses) > mem_cap).any():
                raise HostBatchFallback("array output beyond the memory cap")
            vals_all = limbs_to_obj(mem_np)  # (B, M)
            for j, witness in enumerate(output.witnesses):
                vals = vals_all[np.arange(batch), base_i + j]
                if pred_mask is not None:
                    vals = vals * pred_mask
                out[int(witness)] = vals
        else:  # pragma: no cover
            raise HostBatchFallback(f"unknown output {output!r}")
    # Trapped instances: the reference fails the whole solve for that
    # instance; witnesses it would have written stay zero.
    if trap_np.any():
        zero = np.zeros(batch, dtype=object)
        for w in list(out):
            out[w] = np.where(trap_np, zero, out[w])
    if pred_mask is not None:
        trap_np = trap_np & np.array([bool(v) for v in pred], dtype=bool)
    return out, trap_np
