"""Fused arith-static level kernel: gather -> CIOS chain -> scatter in one
Pallas program.

Round-3 profile of the headline solve (BASELINE.md "Roofline (round-3
final)"): per 110 ms step only 41 ms ran Pallas kernels; the rest was XLA
witness gathers (19 ms), layout copies into the kernel's tile format (20 ms),
and the result scatter (16 ms).  All three exist only because the witness
panel lived batch-major ((B, num_w, L)) while the kernel wanted vreg tiles.

This module stores the panel *witness-major*:

    W_rows : (num_w_pad, L, S, 128) uint32,  batch B = S * 128

so one witness's batch panel is a contiguous (L, S, 128) block — exactly the
operand layout of the unrolled-limb CIOS kernel (pallas_mul_v2), and a
natural DMA unit (64 KB at B=1024).  The level kernel then:

1. DMAs each gate's operand rows HBM->VMEM (indices read from a per-gate
   descriptor table; double-buffered so gate g+1's loads overlap gate g's
   compute);
2. runs the same unrolled-limb CIOS chain as `mont_dot_pallas_v2`, with the
   per-gate coefficient limbs as *scalar* multiplicands;
3. DMAs the solved row VMEM->HBM straight into W_rows[out_idx] — the W
   buffer is aliased input/output, so a level is one in-place program with
   no gather / transpose / scatter XLA ops at all.

Levelization guarantees a level's reads never overlap its writes (the
planner solves each witness exactly once, before any use), which is what
makes the in-place alias safe.

Reference semantics: the arithmetic-gate solve of acvm/src/pwg/
arithmetic.rs:27-127 (single unknown, constant divisor folded into the
packed coefficients at plan time), batched over instances.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import FieldParams, BN254_FR, LIMB_BITS, NUM_LIMBS
from ..fields.pallas_mul_v2 import (
    _k_max,
    _p_limbs,
    _reduce_full,
    cios_multi,
    cios_multi_bound,
    cios_unrolled,
    cond_sub,
    normalize,
)

L = NUM_LIMBS
MASK = (1 << LIMB_BITS) - 1


# ---------------------------------------------------------------------------
# Layout converters
# ---------------------------------------------------------------------------


def to_rows(W: jnp.ndarray) -> jnp.ndarray:
    """(B, NW, L) batch-major -> (NW, L, S, 128) witness-major (B = S*128)."""
    B, NW, _ = W.shape
    assert B % 1024 == 0, "fused path needs B to be a multiple of 1024"
    S = B // 128
    return W.transpose(1, 2, 0).reshape(NW, L, S, 128)


def from_rows(W_rows: jnp.ndarray) -> jnp.ndarray:
    """(NW, L, S, 128) -> (B, NW, L)."""
    NW, _, S, _ = W_rows.shape
    return W_rows.reshape(NW, L, S * 128).transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# Descriptor packing (host)
# ---------------------------------------------------------------------------


def desc_width(t1: int, t2: int) -> int:
    """int32 words per gate: [lin_idx t1 | mul_idx 2*t2 | out_idx |
    lin_coeff t1*L | mul_coeff t2*L | qc L].  No lane padding: the table
    lives in SMEM (scalar memory, 1 MiB/core on v5e — the hardware rejected
    a lane-padded 2 MiB double-buffered block), where only total bytes
    matter."""
    return t1 + 2 * t2 + 1 + L * (t1 + t2 + 1)


# SMEM budget for the double-buffered descriptor block (bytes); the core has
# 1 MiB total, leave headroom for spill slots and the runtime's own scalars.
# The descriptor is stored TRANSPOSED — (DW, E) with the gate axis minor —
# because SMEM windows pad the minor dimension to 128 words; with gates
# minor the padding is free (chunks are >= 128 gates).
_DESC_SMEM_BUDGET = 640 * 1024


def desc_fits(t1: int, t2: int) -> bool:
    """Whether ANY chunk size fits the double-buffered descriptor block in
    SMEM.  The minor (gate) dimension pads to 128 words, so the footprint
    floors at dw * 128 * 4 bytes * 2 buffers regardless of chunk size; wide
    expressions (~60+ terms/gate) exceed the budget and must take the legacy
    XLA level path."""
    return desc_width(t1, t2) * 128 * 4 * 2 <= _DESC_SMEM_BUDGET


def pick_chunk(E: int, dw: int, ec_max: int = 2048) -> int:
    """Largest even power-of-two chunk <= ec_max that divides E and whose
    double-buffered SMEM footprint fits the budget."""
    ec = min(E, ec_max)
    while ec > 2 and (
        E % ec != 0 or dw * max(ec, 128) * 4 * 2 > _DESC_SMEM_BUDGET
    ):
        ec //= 2
    return ec


def pack_level_desc(
    buf: dict, scratch_row: int, pad_to: int | None = None
) -> np.ndarray:
    """Pack one arith_static level buffer (`_pack_level` output: ``num`` pack
    + ``u_idx``) into the (E, DW) descriptor table the kernel reads.

    ``pad_to`` pads the gate axis: padding gates read row 0, carry zero
    coefficients (so they compute 0) and scatter into ``scratch_row``."""
    num = buf["num"]
    u_idx = buf["u_idx"]
    E = u_idx.shape[0]
    t1 = num["lin_idx"].shape[1]
    t2 = num["mul_idx"].shape[1]
    dw = desc_width(t1, t2)
    Ep = pad_to if pad_to is not None else E
    assert Ep >= E
    desc = np.zeros((Ep, dw), dtype=np.int32)
    o = 0
    if t1:
        desc[:E, o : o + t1] = num["lin_idx"]
        o += t1
    if t2:
        desc[:E, o : o + 2 * t2] = num["mul_idx"].reshape(E, 2 * t2)
        o += 2 * t2
    desc[:E, o] = u_idx
    desc[E:, o] = scratch_row
    o += 1
    if t1:
        desc[:E, o : o + t1 * L] = num["lin_coeff"].reshape(E, t1 * L)
        o += t1 * L
    if t2:
        desc[:E, o : o + t2 * L] = num["mul_coeff"].reshape(E, t2 * L)
        o += t2 * L
    desc[:E, o : o + L] = num["qc"]
    return np.ascontiguousarray(desc.T)  # (DW, E): gate axis minor for SMEM


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _n_slots() -> int:
    """DMA ring depth (lookahead = n_slots - 1 gates).  Round-4 shipped a
    2-slot / 1-gate-lookahead pipeline that left ~35% of the compute bound
    on the table (BASELINE.md: 5 x 64 KB row DMAs per ~1.4 us of compute not
    fully hidden); round 5 defaults to a 4-slot ring.  ACVM_TPU_FUSED_SLOTS
    overrides for bisection."""
    import os

    return int(os.environ.get("ACVM_TPU_FUSED_SLOTS", "4"))


def _make_level_kernel(
    params: FieldParams, t1: int, t2: int, ec: int, s: int, dw: int,
    n_slots: int = 2,
):
    """Kernel over one chunk of ``ec`` gates; operand rows are (L, s, 128)."""
    pl_ = _p_limbs(params)
    n0 = params.n0_inv
    k_max = _k_max(params)
    n_opnd = t1 + 2 * t2
    # descriptor field offsets
    off_lin = 0
    off_mul = t1
    off_out = t1 + 2 * t2
    off_lc = off_out + 1
    off_mc = off_lc + t1 * L
    off_qc = off_mc + t2 * L

    def kernel(desc_ref, W_ref, Wout_ref, opnd, outbuf, in_sem, out_sem):
        def start_gathers(slot, g):
            for t in range(t1):
                idx = desc_ref[off_lin + t, g]
                pltpu.make_async_copy(
                    W_ref.at[idx], opnd.at[slot, t], in_sem.at[slot, t]
                ).start()
            for t in range(t2):
                i1 = desc_ref[off_mul + 2 * t, g]
                i2 = desc_ref[off_mul + 2 * t + 1, g]
                pltpu.make_async_copy(
                    W_ref.at[i1], opnd.at[slot, t1 + 2 * t],
                    in_sem.at[slot, t1 + 2 * t],
                ).start()
                pltpu.make_async_copy(
                    W_ref.at[i2], opnd.at[slot, t1 + 2 * t + 1],
                    in_sem.at[slot, t1 + 2 * t + 1],
                ).start()

        def wait_gathers(slot, g):
            for t in range(n_opnd):
                # dst-shaped wait (the copy object just needs shapes)
                pltpu.make_async_copy(
                    W_ref.at[0], opnd.at[slot, t], in_sem.at[slot, t]
                ).wait()

        multi_bound = cios_multi_bound(params, t1, t2)

        def compute_multi(slot, g):
            """All the gate's terms in ONE fused-reduction CIOS chain
            (cios_multi): the per-round m*p reduction, carries and the final
            normalize are shared across terms instead of paid per term —
            ~25-30% fewer vreg-ops per gate than per-term chains for the
            headline 2-3 term gates.  qc joins the lazy accumulator before
            the single normalize; the reduce chain covers the exact bound."""
            pairs = []
            for t in range(t1):
                a = [
                    (lambda j=j, t=t: desc_ref[off_lc + t * L + j, g]
                     .astype(jnp.uint32))
                    for j in range(L)
                ]
                b = [opnd[slot, t, j] for j in range(L)]
                pairs.append((a, b))
            for t in range(t2):
                v1 = [opnd[slot, t1 + 2 * t, j] for j in range(L)]
                v2 = [opnd[slot, t1 + 2 * t + 1, j] for j in range(L)]
                prod = normalize(cios_unrolled(v1, v2, pl_, n0))  # < 2p
                a = [
                    (lambda j=j, t=t: desc_ref[off_mc + t * L + j, g]
                     .astype(jnp.uint32))
                    for j in range(L)
                ]
                pairs.append((a, prod))
            lazy = cios_multi(pairs, pl_, n0)
            lazy = [lazy[j] + desc_ref[off_qc + j, g] for j in range(L)]
            r = _reduce_full(normalize(lazy), params, multi_bound)
            for j in range(L):
                outbuf[slot, j] = r[j]

        def compute_per_term(slot, g):
            # Per-term chains: the constant level (no pairs) and very wide
            # gates whose fused bound would exceed the 4p/2p/p reduce chain.
            acc = [
                jnp.full((s, 128), desc_ref[off_qc + j, g], jnp.uint32)
                for j in range(L)
            ]
            bound = 1

            def add_term(acc, bound, term):
                if bound + 1 > k_max:
                    acc = _reduce_full(normalize(acc), params, bound)
                    bound = 1
                return [x + y for x, y in zip(acc, term)], bound + 1

            for t in range(t1):
                a = [
                    (lambda j=j, t=t: desc_ref[off_lc + t * L + j, g]
                     .astype(jnp.uint32))
                    for j in range(L)
                ]
                b = [opnd[slot, t, j] for j in range(L)]
                term = cond_sub(normalize(cios_unrolled(a, b, pl_, n0)), pl_)
                acc, bound = add_term(acc, bound, term)
            for t in range(t2):
                v1 = [opnd[slot, t1 + 2 * t, j] for j in range(L)]
                v2 = [opnd[slot, t1 + 2 * t + 1, j] for j in range(L)]
                prod = normalize(cios_unrolled(v1, v2, pl_, n0))  # < 2p
                a = [
                    (lambda j=j, t=t: desc_ref[off_mc + t * L + j, g]
                     .astype(jnp.uint32))
                    for j in range(L)
                ]
                term = cond_sub(
                    normalize(cios_unrolled(a, prod, pl_, n0)), pl_
                )
                acc, bound = add_term(acc, bound, term)
            r = _reduce_full(normalize(acc), params, bound)
            for j in range(L):
                outbuf[slot, j] = r[j]

        if (t1 or t2) and multi_bound <= 8:
            compute = compute_multi
        else:
            compute = compute_per_term

        def start_scatter(slot, g):
            pltpu.make_async_copy(
                outbuf.at[slot], Wout_ref.at[desc_ref[off_out, g]],
                out_sem.at[slot],
            ).start()

        def wait_scatter(slot):
            pltpu.make_async_copy(
                outbuf.at[slot], Wout_ref.at[0], out_sem.at[slot]
            ).wait()

        # n_slots-deep ring pipeline, statically unrolled (slot = g mod N):
        # lookahead = N-1 gates of in-flight gathers, so each gate's 3-5 row
        # DMAs get (N-1) gates' worth of CIOS compute (~1.4 us each) to
        # complete.  The prefetch target slot (slot + N-1) mod N belongs to
        # gate g - 1, whose compute finished in the PREVIOUS unrolled step —
        # an in-flight compute is never raced by a DMA write.  (Round-4
        # lesson: a stride-2 prefetch into the SAME slot raced the in-flight
        # compute, caught only on real hardware — the interpreter runs DMAs
        # synchronously.  Invariant: lookahead <= N-1.)
        la = n_slots - 1
        for g_fill in range(la):
            start_gathers(g_fill % n_slots, g_fill)  # ec >= 128 > la always

        def body(k, _):
            g0 = n_slots * k
            for slot in range(n_slots):
                g = g0 + slot
                wait_gathers(slot, g)

                @pl.when(g + la < ec)
                def _():
                    start_gathers((slot + la) % n_slots, g + la)

                @pl.when(k > 0)
                def _():
                    wait_scatter(slot)  # outbuf[slot] free again

                compute(slot, g)
                start_scatter(slot, g)
            return 0

        jax.lax.fori_loop(0, ec // n_slots, body, 0)
        for slot in range(n_slots):
            wait_scatter(slot)

    return kernel


def fused_level_call(
    W_rows: jnp.ndarray,
    desc: jnp.ndarray,
    params: FieldParams = BN254_FR,
    t1: int = 0,
    t2: int = 0,
    ec: int = 2048,
) -> jnp.ndarray:
    """Solve one arith-static level in place on the witness-major panel.

    W_rows: (NW, L, S, 128); desc: (E_pad, DW) int32 (E_pad a multiple of
    ``ec``); returns the updated panel (aliased with the input — callers
    under jit should donate/chain the buffer).  Callable inside an outer
    jit; :func:`fused_static_level` is the standalone jitted wrapper."""
    # Off-TPU the level runs as a VECTORIZED jnp program with identical
    # descriptor semantics (fused_level_jnp): this is how the virtual-CPU
    # multi-chip dryrun and CPU tests validate the fused engine's sharding,
    # layout and bit-exactness without TPU hardware.  (Pallas interpret mode
    # was measured unusable here: it evaluates the kernel op-by-op per grid
    # step — a single 128-gate level at B=1024 did not finish in 9 minutes
    # on CPU.)  Mosaic-level behavior — the DMA ring — is validated on real
    # chips by the TPU tests and the bench's sequential cross-check.
    if jax.default_backend() != "tpu":
        return fused_level_jnp(W_rows, desc, params, t1, t2)
    NW, _, S, _ = W_rows.shape
    dw, E = desc.shape
    ec = pick_chunk(E, dw, ec)
    n_opnd = t1 + 2 * t2
    # Ring depth: requested slots, backed off while the slot buffers exceed
    # a conservative VMEM budget (~16 MB/core total; leave room for spills).
    n_slots = max(2, _n_slots())
    per_slot = (max(1, n_opnd) + 1) * L * S * 128 * 4
    while n_slots > 2 and n_slots * per_slot > 12 * 2**20:
        n_slots -= 1
    assert E % ec == 0 and ec % n_slots == 0
    grid = (E // ec,)
    kernel = _make_level_kernel(params, t1, t2, ec, S, dw, n_slots)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(W_rows.shape, jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((dw, ec), lambda c: (0, c),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_slots, max(1, n_opnd), L, S, 128), jnp.uint32),
            pltpu.VMEM((n_slots, L, S, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((n_slots, max(1, n_opnd))),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(desc, W_rows)


def fused_level_jnp(
    W_rows: jnp.ndarray,
    desc: jnp.ndarray,
    params: FieldParams = BN254_FR,
    t1: int = 0,
    t2: int = 0,
) -> jnp.ndarray:
    """Vectorized XLA twin of the Pallas level kernel — same descriptor
    format, same results, no Pallas.  Used off-TPU (CPU tests, the 8-device
    virtual-mesh dryrun) and safe under shard_map: levelization guarantees a
    level's reads never alias its writes, so gather-all / compute / scatter
    is equivalent to the kernel's in-order gate loop.  Padding gates carry
    zero coefficients and scatter zeros into the shared scratch row."""
    from ..fields.jnp_ops import LimbContext

    ctx = LimbContext(params)
    NW, L_, S, lanes = W_rows.shape
    dw, E = desc.shape
    off_lin = 0
    off_mul = t1
    off_out = t1 + 2 * t2
    off_lc = off_out + 1
    off_mc = off_lc + t1 * L
    off_qc = off_mc + t2 * L

    Wf = W_rows.reshape(NW, L_, S * lanes)

    def rows_of(idx):  # (E,) -> (E, B, L)
        return jnp.take(Wf, idx, axis=0).transpose(0, 2, 1)

    def coeff_of(off, t):  # (E, L) uint32
        return desc[off + t * L : off + (t + 1) * L, :].T.astype(jnp.uint32)

    acc = jnp.broadcast_to(
        coeff_of(off_qc, 0)[:, None, :], (E, 1, L)
    ).astype(jnp.uint32)
    for t in range(t1):
        val = rows_of(desc[off_lin + t])
        acc = ctx.add(acc, ctx.mont_mul(coeff_of(off_lc, t)[:, None], val))
    for t in range(t2):
        v1 = rows_of(desc[off_mul + 2 * t])
        v2 = rows_of(desc[off_mul + 2 * t + 1])
        prod = ctx.mont_mul(v1, v2)
        acc = ctx.add(acc, ctx.mont_mul(coeff_of(off_mc, t)[:, None], prod))
    if t1 == 0 and t2 == 0:
        acc = jnp.broadcast_to(acc, (E, S * lanes, L))
    out_rows = acc.transpose(0, 2, 1).reshape(E, L_, S, lanes)
    return W_rows.at[desc[off_out]].set(out_rows)


@partial(
    jax.jit,
    static_argnames=("params", "t1", "t2", "ec"),
    donate_argnums=(0,),
)
def fused_static_level(
    W_rows: jnp.ndarray,
    desc: jnp.ndarray,
    params: FieldParams = BN254_FR,
    t1: int = 0,
    t2: int = 0,
    ec: int = 2048,
) -> jnp.ndarray:
    return fused_level_call(W_rows, desc, params, t1, t2, ec)


# ---------------------------------------------------------------------------
# jnp reference (for tests)
# ---------------------------------------------------------------------------


def fused_static_level_ref(W_rows, desc, params, t1, t2):
    """Pure-jnp oracle with identical semantics (slow; tests only)."""
    from ..fields.jnp_ops import LimbContext

    ctx = LimbContext(params)
    W = from_rows(W_rows)  # (B, NW, L)
    desc = np.asarray(desc).T  # back to (E, DW) for host-side reads
    E = desc.shape[0]
    off_mul = t1
    off_out = t1 + 2 * t2
    off_lc = off_out + 1
    off_mc = off_lc + t1 * L
    off_qc = off_mc + t2 * L
    B = W.shape[0]
    for g in range(E):
        acc = jnp.broadcast_to(
            jnp.asarray(desc[g, off_qc : off_qc + L], jnp.uint32), (B, L)
        )
        for t in range(t1):
            val = W[:, int(desc[g, t])]
            coeff = jnp.asarray(
                desc[g, off_lc + t * L : off_lc + (t + 1) * L], jnp.uint32
            )
            acc = ctx.add(acc, ctx.mont_mul(coeff[None], val))
        for t in range(t2):
            v1 = W[:, int(desc[g, off_mul + 2 * t])]
            v2 = W[:, int(desc[g, off_mul + 2 * t + 1])]
            coeff = jnp.asarray(
                desc[g, off_mc + t * L : off_mc + (t + 1) * L], jnp.uint32
            )
            prod = ctx.mont_mul(v1, v2)
            acc = ctx.add(acc, ctx.mont_mul(coeff[None], prod))
        W = W.at[:, int(desc[g, off_out])].set(acc)
    return to_rows(W)
