"""Batched witness solver: executes a `Plan` over N circuit instances on TPU.

State per batch:

* ``W``   — (B, num_witnesses, NUM_LIMBS) uint32, standard-form limb values;
* ``ok``  — (B,) bool, per-instance satisfiability flag (the data-parallel
  analogue of the reference's UnsatisfiedConstrain / IndexOutOfBounds errors —
  a failing instance flips its flag instead of aborting the batch);
* memory blocks — (B, size, NUM_LIMBS) per ACIR memory block.

The plan's levels are fused into jitted *segments*; host stages (permutation
sorts, EC gadgets pending limb kernels, non-straight-line Brillig) run between
segments through the bit-exact sequential solvers.  Instances are independent,
so sharding the B axis over a `jax.sharding.Mesh` scales the whole solve
data-parallel across chips (`acvm_tpu.parallel`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..acir.witness import Witness, WitnessMap
from ..acir import opcodes as ops
from ..blackbox import BlackBoxFunctionSolver, GrumpkinSolver
from ..fields.field import FieldElement
from ..fields.jnp_ops import LimbContext
from ..fields.params import LIMB_BITS, NUM_LIMBS
from ..fields.limbs import int_to_limbs
from ..pwg.errors import OpcodeResolutionError
from . import intops
from .brillig_trace import trace_brillig
from .planner import (
    ArithCheckGate,
    ArithSolveGate,
    BrilligTraceStage,
    ExprPlan,
    HostStage,
    Level,
    LogicGate,
    MemoryInitStage,
    MemoryOpStage,
    Plan,
    QuotientGate,
    RangeCheck,
    ToLeRadixGate,
)

MASK16 = (1 << LIMB_BITS) - 1

# Per-instance first-failure sentinel: "no failure yet".  The batch path's
# analogue of the reference's located errors (acvm/src/pwg/mod.rs:282-299):
# every kernel that can flip an instance's ok flag also records the smallest
# failing opcode index, which BatchResult resolves to an OpcodeLocation +
# assert message.
FAIL_NONE = np.int32(2**31 - 1)


def note_failures(fail: jnp.ndarray, bad: jnp.ndarray, op_idx) -> jnp.ndarray:
    """Fold per-gate failure flags into the per-instance first-failure index.

    fail: (B,) int32; bad: (B, G) bool; op_idx: (G,) opcode indices."""
    cand = jnp.where(bad, jnp.asarray(op_idx, jnp.int32)[None], FAIL_NONE)
    return jnp.minimum(fail, cand.min(axis=1))


# ---------------------------------------------------------------------------
# Packing (host, numpy)
# ---------------------------------------------------------------------------


def _limbs_of(value: int) -> np.ndarray:
    return np.asarray(int_to_limbs(value), dtype=np.uint32)


@partial(jax.jit, static_argnames=("nw",))
def _build_panel(cols: jnp.ndarray, vals: jnp.ndarray, nw: int) -> jnp.ndarray:
    """(K,) column indices + (B, K, nl) limb values -> (B, nw, L) panel.
    ``vals`` may arrive uint16 (half-width upload); upcast on device."""
    B = vals.shape[0]
    vals = vals.astype(jnp.uint32)
    if vals.shape[2] < NUM_LIMBS:
        vals = jnp.pad(
            vals, ((0, 0), (0, 0), (0, NUM_LIMBS - vals.shape[2]))
        )
    W = jnp.zeros((B, nw, NUM_LIMBS), dtype=jnp.uint32)
    return W.at[:, cols].set(vals)


@partial(jax.jit, static_argnames=("nw",))
def _build_panel_rows(
    cols: jnp.ndarray, vals: jnp.ndarray, nw: int
) -> jnp.ndarray:
    """Witness-major variant: -> (nw, L, S, 128) with B = S*128.  Built
    directly in the fused-kernel layout so no full-panel transpose ever
    materializes (the naive to_rows doubled peak HBM).  ``vals`` may arrive
    uint16 (half-width upload); upcast on device."""
    B, K, nl = vals.shape
    vals = vals.astype(jnp.uint32)
    if nl < NUM_LIMBS:
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, NUM_LIMBS - nl)))
    S = B // 128
    vrows = vals.transpose(1, 2, 0).reshape(K, NUM_LIMBS, S, 128)
    W = jnp.zeros((nw, NUM_LIMBS, S, 128), dtype=jnp.uint32)
    return W.at[cols].set(vrows)


@partial(jax.jit, static_argnames=("runs", "nw", "rows"))
def _build_panel_narrow(
    vals: jnp.ndarray, runs: tuple, nw: int, rows: bool
) -> jnp.ndarray:
    """Fast path for the common shape: witness indices forming a few
    CONTIGUOUS runs of <=16-bit values (hash-gadget byte inputs interleave
    input/output ranges per gadget).  The panel materializes from one
    zero-fill + one contiguous slice write per run — the general scatter
    lowering cost ~0.25 s/call at B=8192 — and the upload ships the narrow
    dtype (uint8/16), not 16 limbs.  ``vals``: (B, K) unsigned, columns
    ordered run-major; ``runs``: tuple of (lo, length)."""
    B = vals.shape[0]
    v32 = vals.astype(jnp.uint32)
    off = 0
    if rows:
        S = B // 128
        W = jnp.zeros((nw, NUM_LIMBS, S, 128), dtype=jnp.uint32)
        for lo, k in runs:
            seg = v32[:, off : off + k]
            off += k
            W = W.at[lo : lo + k, 0:1].set(seg.T.reshape(k, 1, S, 128))
        return W
    W = jnp.zeros((B, nw, NUM_LIMBS), dtype=jnp.uint32)
    for lo, k in runs:
        seg = v32[:, off : off + k]
        off += k
        W = W.at[:, lo : lo + k, 0:1].set(seg[:, :, None])
    return W


def _limb_cols_to_object(sel: np.ndarray) -> np.ndarray:
    """(C, L, B) uint32 limb columns -> (B, C) object Python ints.

    Host stages do arbitrary-precision math on object arrays, but per-limb
    object composition costs 16 Python-object ops per element (~100 ms for
    one witness column at B=8192).  Columns whose top limbs are all zero
    (< 2^64 — the overwhelmingly common byte/int hint inputs) compose in
    vectorized uint64 and box exactly once."""
    C, L_, B = sel.shape
    ints = np.zeros((B, C), dtype=object)
    if C == 0:
        return ints
    wide = sel[:, 4:, :].any(axis=(1, 2))  # (C,)
    narrow = np.nonzero(~wide)[0]
    if narrow.size:
        v = sel[narrow, 0].astype(np.uint64)
        for li in range(1, 4):
            v |= sel[narrow, li].astype(np.uint64) << np.uint64(LIMB_BITS * li)
        ints[:, narrow] = v.T.astype(object)
    for c in np.nonzero(wide)[0]:
        acc = np.zeros(B, dtype=object)
        for li in range(L_):
            acc += sel[c, li].astype(object) << (LIMB_BITS * li)
        ints[:, c] = acc
    return ints


def _object_cols_to_limbs(out_vals: np.ndarray) -> np.ndarray:
    """(B, C) object ints (non-negative, reduced) -> (B, C, L) uint32 limbs,
    with the same per-column uint64 fast path as :func:`_limb_cols_to_object`
    (a value >= 2^64 raises OverflowError out of the vectorized cast and the
    column falls back to object shifts)."""
    B, C = out_vals.shape
    limbs = np.zeros((B, C, NUM_LIMBS), dtype=np.uint32)
    for c in range(C):
        col = out_vals[:, c]
        try:
            v64 = col.astype(np.uint64)
        except (OverflowError, TypeError):
            for li in range(NUM_LIMBS):
                limbs[:, c, li] = (
                    (col >> (LIMB_BITS * li)) & MASK16
                ).astype(np.uint32)
            continue
        for li in range(64 // LIMB_BITS):
            limbs[:, c, li] = (
                (v64 >> np.uint64(LIMB_BITS * li)) & np.uint64(MASK16)
            ).astype(np.uint32)
    return limbs


def _to_host_np(x) -> np.ndarray:
    """Host numpy copy of a device array.  On a multi-process mesh the batch
    shards live on different hosts, so non-fully-addressable arrays are
    gathered first (every process then sees the full batch — what the
    conformance-checking callers need; production pipelines keep results
    sharded and slice with ``parallel.distributed.process_batch_slice``)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def pack_exprs(exprs: List[ExprPlan]) -> Dict[str, np.ndarray]:
    E = len(exprs)
    n = max((len(e.lin_idx) for e in exprs), default=0)
    m = max((len(e.mul_idx) for e in exprs), default=0)
    lin_idx = np.zeros((E, n), dtype=np.int32)
    lin_coeff = np.zeros((E, n, NUM_LIMBS), dtype=np.uint32)
    mul_idx = np.zeros((E, m, 2), dtype=np.int32)
    mul_coeff = np.zeros((E, m, NUM_LIMBS), dtype=np.uint32)
    qc = np.zeros((E, NUM_LIMBS), dtype=np.uint32)
    for i, e in enumerate(exprs):
        for j, (w, c) in enumerate(zip(e.lin_idx, e.lin_coeff_r)):
            lin_idx[i, j] = w
            lin_coeff[i, j] = _limbs_of(c)
        for k, ((wl, wr), c) in enumerate(zip(e.mul_idx, e.mul_coeff_r2)):
            mul_idx[i, k] = (wl, wr)
            mul_coeff[i, k] = _limbs_of(c)
        qc[i] = _limbs_of(e.qc)
    return dict(
        lin_idx=lin_idx, lin_coeff=lin_coeff,
        mul_idx=mul_idx, mul_coeff=mul_coeff, qc=qc,
    )


def _range_zero_mask(num_bits: int) -> np.ndarray:
    """Bits that must be zero for value < 2^num_bits, as 16-bit limb masks."""
    mask = np.zeros(NUM_LIMBS, dtype=np.uint32)
    for limb in range(NUM_LIMBS):
        lo = limb * LIMB_BITS
        allowed = max(0, min(LIMB_BITS, num_bits - lo))
        mask[limb] = (MASK16 ^ ((1 << allowed) - 1)) & MASK16
    return mask


def _allow_mask(num_bits: int) -> np.ndarray:
    return (~_range_zero_mask(num_bits)) & MASK16


# ---------------------------------------------------------------------------
# Device kernels (operate on jnp arrays; called inside jit)
# ---------------------------------------------------------------------------


def eval_exprs(
    ctx: LimbContext, W: jnp.ndarray, pack, scale=None
) -> jnp.ndarray:
    """Evaluate E packed expressions for every instance: (B, E, NUM_LIMBS).

    On TPU with a big enough batch the whole per-gate chain — gathered-operand
    Montgomery multiplies, the modular-add fold, the q_c add and the optional
    final ``scale`` multiply — runs as ONE fused Pallas launch
    (:func:`acvm_tpu.fields.pallas_mul.mont_dot_pallas`) with the accumulator
    resident in VMEM; only the witness gathers (and the witness*witness
    pre-multiply for quadratic terms) stay in XLA.  Otherwise the jnp path
    below evaluates the same chain op by op.

    ``scale`` (E, L limbs, Montgomery form) multiplies the accumulated value,
    fusing e.g. the arithmetic gate's -1/den_const into the same kernel.
    """
    B = W.shape[0]
    E = pack["qc"].shape[0]
    n = pack["lin_idx"].shape[1]
    m = pack["mul_idx"].shape[1]

    vals = v1 = v2 = prods = None
    if n:
        vals = jnp.take(W, pack["lin_idx"].reshape(-1), axis=1).reshape(
            B, E, n, NUM_LIMBS
        )
    if m:
        v1 = jnp.take(W, pack["mul_idx"][:, :, 0].reshape(-1), axis=1).reshape(
            B, E, m, NUM_LIMBS
        )
        v2 = jnp.take(W, pack["mul_idx"][:, :, 1].reshape(-1), axis=1).reshape(
            B, E, m, NUM_LIMBS
        )

    import os

    from ..fields.mxu_ops import mxu_ok

    mxu_route = (n or m) and scale is None and mxu_ok(ctx.params, B, E, n + m)
    v1_route = os.environ.get("ACVM_TPU_DOT_KERNEL") == "v1"

    if (n or m) and not mxu_route and not v1_route and ctx._pallas_ok(
        (B * E, NUM_LIMBS)
    ):
        # Fully fused unrolled-limb kernel: the witness*witness pre-multiply
        # for quadratic terms, every coefficient Montgomery multiply, the
        # modular fold, q_c and the optional scale run in ONE pallas_call.
        from ..fields.pallas_mul_v2 import mont_dot_pallas_v2

        return mont_dot_pallas_v2(
            vals,
            jnp.asarray(pack["lin_coeff"]) if n else None,
            v1,
            v2,
            jnp.asarray(pack["mul_coeff"]) if m else None,
            jnp.asarray(pack["qc"]),
            jnp.asarray(scale) if scale is not None else None,
            ctx.params,
        )

    if m:
        prods = ctx.mont_mul(v1, v2)  # w1*w2*R^-1

    if mxu_route:
        # MXU route: the whole linear combination as one exact bf16 limb
        # einsum + a single constant-matrix Montgomery reduction per gate
        # (fields/mxu_ops.py).  The witness*witness pre-multiply for quadratic
        # terms stays on the CIOS path above.
        from ..fields.mxu_ops import mont_dot_mxu

        panels = [x for x in (vals, prods) if x is not None]
        coeffs = [
            jnp.asarray(c)
            for c, x in ((pack["lin_coeff"], vals), (pack["mul_coeff"], prods))
            if x is not None
        ]
        panel = panels[0] if len(panels) == 1 else jnp.concatenate(panels, axis=2)
        coeff = coeffs[0] if len(coeffs) == 1 else jnp.concatenate(coeffs, axis=1)
        qc_r = ctx.to_mont(jnp.asarray(pack["qc"]))
        return mont_dot_mxu(panel, coeff, qc_r, ctx.params)

    if (n or m) and ctx._pallas_ok((B * E, NUM_LIMBS)):
        from ..fields.pallas_mul import mont_dot_pallas

        panels = [x for x in (vals, prods) if x is not None]
        coeffs = [
            jnp.asarray(c)
            for c, x in ((pack["lin_coeff"], vals), (pack["mul_coeff"], prods))
            if x is not None
        ]
        panel = panels[0] if len(panels) == 1 else jnp.concatenate(panels, axis=2)
        coeff = coeffs[0] if len(coeffs) == 1 else jnp.concatenate(coeffs, axis=1)
        return mont_dot_pallas(
            panel, coeff, jnp.asarray(pack["qc"]), scale, params=ctx.params
        )

    acc = jnp.broadcast_to(pack["qc"][None], (B, E, NUM_LIMBS))
    if n:
        terms = ctx.mont_mul(pack["lin_coeff"][None], vals)  # (B, E, n, L)
        for j in range(n):
            acc = ctx.add(acc, terms[:, :, j])
    if m:
        terms = ctx.mont_mul(pack["mul_coeff"][None], prods)
        for k in range(m):
            acc = ctx.add(acc, terms[:, :, k])
    if scale is not None:
        acc = ctx.mont_mul(jnp.asarray(scale)[None], acc)
    return acc


def run_arith_solve_static(ctx, W, ok, buf):
    # -num / den_const, with the division folded into the packed coefficients
    # at pack time (see _pack_level): one fused eval, no scale chain.
    val = eval_exprs(ctx, W, buf["num"])
    return W.at[:, buf["u_idx"]].set(val), ok


def run_arith_solve_dyn(ctx, W, ok, fail, buf):
    num = eval_exprs(ctx, W, buf["num"])
    den = eval_exprs(ctx, W, buf["den"])
    den_zero = ctx.is_zero(den)
    num_zero = ctx.is_zero(num)
    # One Fermat chain amortized over the level's gate axis (Montgomery's
    # trick) instead of a 254-squaring chain per gate.
    inv_m = ctx.mont_batch_inv(ctx.to_mont(den), axis=1)  # den^-1 * R
    val = ctx.mont_mul(ctx.neg(num), inv_m)  # -num/den
    val = jnp.where(den_zero[..., None], 0, val)
    # den == 0 & num != 0 -> unsatisfied (arithmetic.rs:46-54).
    bad = den_zero & ~num_zero
    ok = ok & ~jnp.any(bad, axis=1)
    fail = note_failures(fail, bad, buf["op_idx"])
    return W.at[:, buf["u_idx"]].set(val), ok, fail


def run_arith_check(ctx, W, ok, fail, buf):
    val = eval_exprs(ctx, W, buf["expr"])
    bad = ~ctx.is_zero(val)
    fail = note_failures(fail, bad, buf["op_idx"])
    return W, ok & ~jnp.any(bad, axis=1), fail


def run_range(ctx, W, ok, fail, buf):
    vals = jnp.take(W, buf["w_idx"], axis=1)  # (B, G, L)
    bad = jnp.any((vals & buf["zero_mask"][None]) != 0, axis=-1)  # (B, G)
    fail = note_failures(fail, bad, buf["op_idx"])
    return W, ok & ~jnp.any(bad, axis=1), fail


def run_logic(ctx, W, ok, buf, is_xor):
    a = jnp.take(W, buf["lhs"], axis=1)
    b = jnp.take(W, buf["rhs"], axis=1)
    mask = buf["allow_mask"][None]
    res = ((a ^ b) if is_xor else (a & b)) & mask
    return W.at[:, buf["out"]].set(res), ok


def run_quotient(ctx, W, ok, buf):
    a = eval_exprs(ctx, W, buf["a"])
    b = eval_exprs(ctx, W, buf["b"])
    pred = eval_exprs(ctx, W, buf["pred"])
    active = ~ctx.is_zero(pred)  # (B, G)
    q, r = intops.long_divmod(a, b, num_bits=256)
    q = jnp.where(active[..., None], q, 0)
    r = jnp.where(active[..., None], r, 0)
    W = W.at[:, buf["q_idx"]].set(q)
    W = W.at[:, buf["r_idx"]].set(r)
    return W, ok


def run_to_le_radix(ctx, W, ok, fail, buf):
    vals = eval_exprs(ctx, W, buf["value"])  # (B, G, L)
    # Capacity check: digits beyond the provided witnesses must be zero
    # (directives/mod.rs:67-71).
    bad = jnp.any((vals & buf["overflow_mask"][None]) != 0, axis=-1)  # (B, G)
    fail = note_failures(fail, bad, buf["op_idx"])
    ok = ok & ~jnp.any(bad, axis=1)
    dvals = jnp.take(vals, buf["d_gate"], axis=1)  # (B, D, L)
    lo = jnp.take_along_axis(
        dvals, buf["d_limb"][None, :, None], axis=-1
    )[..., 0]
    hi = jnp.take_along_axis(
        dvals, buf["d_limb_hi"][None, :, None], axis=-1
    )[..., 0]
    shift_up = (LIMB_BITS - buf["d_bitoff"][None]) % 32
    word = (lo >> buf["d_bitoff"][None]) | (hi << shift_up)
    digits = word & buf["d_mask"][None]
    out = jnp.zeros(digits.shape + (NUM_LIMBS,), dtype=jnp.uint32)
    out = out.at[..., 0].set(digits)
    return W.at[:, buf["out_idx"]].set(out), ok, fail


def run_hashes(ctx, W, ok, fail, buf):
    """Batched 256-bit hash gadgets; one call per (kind, message length) group."""
    from . import gadgets

    B = W.shape[0]
    G, M = buf["src_w"].shape
    vals = jnp.take(W, buf["src_w"].reshape(-1), axis=1).reshape(B, G, M, NUM_LIMBS)
    limbs = jnp.take_along_axis(vals, buf["src_limb"][None, :, :, None], axis=-1)[
        ..., 0
    ]
    message = (limbs >> buf["src_shift"][None]) & jnp.uint32(0xFF)  # (B, G, M)
    if buf["kind"] == "hash_to_field":
        # blake2s then reduce-mod-p (blackbox_solver/src/lib.rs:85-99):
        # interpret the 32-byte digest big-endian, then a 4p/2p/p
        # conditional-subtract chain brings the <2^256 value below p.
        from ..fields.jnp_ops import _cond_sub
        from ..fields.limbs import int_to_limbs as _itl

        digest = gadgets.blake2s_digest(message.reshape(B * G, M)).reshape(
            B, G, 32
        )
        limbs = [
            digest[..., 31 - 2 * j] | (digest[..., 30 - 2 * j] << 8)
            for j in range(NUM_LIMBS)
        ]
        val = jnp.stack(limbs, axis=-1)  # (B, G, L), value < 2^256
        p = ctx.params.modulus
        for mult in (4, 2, 1):
            if mult * p < (1 << (LIMB_BITS * NUM_LIMBS)):
                val = _cond_sub(
                    val, jnp.asarray(_itl(mult * p), dtype=jnp.uint32)
                )
        return W.at[:, buf["out_idx"]].set(val.reshape(B, G, NUM_LIMBS)), ok, fail
    if buf["kind"] == "keccak_var":
        size_vals = jnp.take(W, buf["size_w"], axis=1)  # (B, G, L)
        length = size_vals[..., 0] | (size_vals[..., 1] << LIMB_BITS)
        # Reference errors when the size exceeds the message or overflows
        # (blackbox/hash.rs:70-82); here the instance flag flips.
        bad = jnp.any(size_vals[..., 2:] != 0, axis=-1) | (length > M)
        ok = ok & jnp.all(~bad, axis=1)
        fail = note_failures(fail, bad, buf["op_idx"])
        length = jnp.minimum(length, M)
        digest = gadgets.keccak256_var_digest(
            message.reshape(B * G, M), length.reshape(B * G)
        ).reshape(B, G, 32)
    else:
        digest_fn = {
            "sha256": gadgets.sha256_digest,
            "blake2s": gadgets.blake2s_digest,
            "keccak256": gadgets.keccak256_digest,
        }[buf["kind"]]
        digest = digest_fn(message.reshape(B * G, M)).reshape(B, G, 32)
    out = jnp.zeros((B, G, 32, NUM_LIMBS), dtype=jnp.uint32)
    out = out.at[..., 0].set(digest)
    return W.at[:, buf["out_idx"]].set(out.reshape(B, G * 32, NUM_LIMBS)), ok, fail


def run_ec_fixed_base(ctx, W, ok, fail, buf):
    """Batched windowed fixed-base Grumpkin scalar multiplication."""
    from . import ec

    B = W.shape[0]
    low = jnp.take(W, buf["low_idx"], axis=1)  # (B, G, L)
    high = jnp.take(W, buf["high_idx"], axis=1)
    G = low.shape[1]
    # u128-limb validation (scalar_mul.rs:25-52): top limbs must be zero and
    # the combined scalar must be below the grumpkin group order.
    fits = jnp.all(low[..., 8:] == 0, axis=-1) & jnp.all(high[..., 8:] == 0, axis=-1)
    scalar = jnp.concatenate([low[..., :8], high[..., :8]], axis=-1)
    from ..fields.jnp_ops import _geq

    in_range = ~_geq(scalar, buf["order_limbs"])
    valid = fits & in_range  # (B, G)
    ok = ok & jnp.all(valid, axis=1)
    fail = note_failures(fail, ~valid, buf["op_idx"])

    flat = scalar.reshape(B * G, NUM_LIMBS)
    point = ec.fixed_base_mul(ctx, buf["table"], flat)
    ax, ay = ec.pt_to_affine(ctx, point)
    ax = jnp.where(valid.reshape(B * G, 1), ax, 0).reshape(B, G, NUM_LIMBS)
    ay = jnp.where(valid.reshape(B * G, 1), ay, 0).reshape(B, G, NUM_LIMBS)
    W = W.at[:, buf["out_x"]].set(ax)
    W = W.at[:, buf["out_y"]].set(ay)
    return W, ok, fail


def run_ec_pedersen(ctx, W, ok, gate_buf):
    """One Pedersen commitment gate: windowed MSM over fixed generators, all
    generators' window entries summed in one tree reduction."""
    from . import ec

    scalars = jnp.take(W, gate_buf["input_idx"], axis=1)  # (B, n, L)
    tables = jnp.asarray(np.stack(gate_buf["tables"]))  # (n, W, 16, 3, L)
    acc = ec.msm_fixed_tables(ctx, tables, scalars)
    ax, ay = ec.pt_to_affine(ctx, acc)
    W = W.at[:, gate_buf["out_x"]].set(ax)
    W = W.at[:, gate_buf["out_y"]].set(ay)
    return W, ok


def run_schnorr(ctx, W, ok, buf):
    """Grouped Schnorr verifications with identical message length."""
    from . import ec

    B = W.shape[0]
    G = buf["pub_x"].shape[0]
    pub_x = jnp.take(W, buf["pub_x"], axis=1).reshape(B * G, NUM_LIMBS)
    pub_y = jnp.take(W, buf["pub_y"], axis=1).reshape(B * G, NUM_LIMBS)
    # to_u8_vec semantics: last BE byte of each witness == low byte of limb 0.
    sig = (
        jnp.take(W, buf["sig_idx"].reshape(-1), axis=1)[..., 0] & jnp.uint32(0xFF)
    ).reshape(B * G, 64)
    if buf["msg_idx"].size:
        msg = (
            jnp.take(W, buf["msg_idx"].reshape(-1), axis=1)[..., 0]
            & jnp.uint32(0xFF)
        ).reshape(B * G, -1)
    else:
        msg = jnp.zeros((B * G, 0), dtype=jnp.uint32)
    valid = ec.schnorr_verify_batched(
        ctx, pub_x, pub_y, sig, msg, buf["pedersen_tables"], buf["gen_table"]
    ).reshape(B, G)
    out = jnp.zeros((B, G, NUM_LIMBS), dtype=jnp.uint32)
    out = out.at[..., 0].set(valid.astype(jnp.uint32))
    return W.at[:, buf["out_idx"]].set(out), ok


def run_ecdsa(ctx, W, ok, fail, buf):
    """Grouped ECDSA verifications on one curve (device limb kernels)."""
    from . import ecdsa as ecdsa_dev

    B = W.shape[0]
    G = buf["pub_x"].shape[0]

    def bytes_of(idx):
        # to_u8_vec semantics: last BE byte of each witness == low byte limb 0.
        return (
            jnp.take(W, idx.reshape(-1), axis=1)[..., 0] & jnp.uint32(0xFF)
        ).reshape(B * G, idx.shape[1])

    valid, err = ecdsa_dev.ecdsa_verify_batched(
        buf["curve"],
        bytes_of(buf["pub_x"]),
        bytes_of(buf["pub_y"]),
        bytes_of(buf["sig"]),
        bytes_of(buf["msg"]),
    )
    valid = valid.reshape(B, G)
    # The host path raises BlackBoxFunctionFailed on these (reference panics);
    # the batched analogue flips the instance flag.
    err = err.reshape(B, G)
    ok = ok & jnp.all(~err, axis=1)
    fail = note_failures(fail, err, buf["op_idx"])
    out = jnp.zeros((B, G, NUM_LIMBS), dtype=jnp.uint32)
    out = out.at[..., 0].set(valid.astype(jnp.uint32))
    return W.at[:, buf["out_idx"]].set(out), ok, fail


def run_memory_init(ctx, W, ok, mem, buf):
    block = mem[buf["block_key"]]
    vals = jnp.take(W, buf["init_idx"], axis=1)  # (B, len, L)
    block = block.at[:, : vals.shape[1]].set(vals)
    mem = dict(mem)
    mem[buf["block_key"]] = block
    return W, ok, mem


def _expr_to_u32_index(ctx, val):
    """Convert an evaluated field value (B, 1, L) to a u32 index; values that
    do not fit are failures (the reference panics on try_to_u64 failure)."""
    idx = val[..., 0, 0] | (val[..., 0, 1] << LIMB_BITS)
    too_big = jnp.any(val[..., 0, 2:] != 0, axis=-1)
    return idx, too_big


def run_memory_op(ctx, W, ok, fail, mem, buf):
    """One memory opcode over the batch (memory_op.rs:47-123 semantics).

    Static selector (``op_sel`` is None): the stage is a read or a write for
    every instance.  Runtime selector: each instance evaluates the selector
    expression and acts as a read (0) or write (non-zero), with both
    behaviors masked per instance.  A read into an already-known witness
    (``read_known``) is the reference's insert_value conflict check."""
    block = mem[buf["block_key"]]
    size = block.shape[1]
    idx_val = eval_exprs(ctx, W, buf["index"])  # (B, 1, L)
    idx, too_big = _expr_to_u32_index(ctx, idx_val)
    pred = eval_exprs(ctx, W, buf["pred"])
    active = ~ctx.is_zero(pred)[:, 0]  # (B,)
    in_bounds = idx < size
    bad = too_big | (~in_bounds & active)  # (B,)
    idx_c = jnp.minimum(idx, size - 1)
    batch = jnp.arange(W.shape[0])
    read_w = buf["read_into"]

    if buf.get("op_sel") is not None:
        sel = eval_exprs(ctx, W, buf["op_sel"])
        is_read = ctx.is_zero(sel)[:, 0]  # (B,)
    else:
        is_read = jnp.full(active.shape, buf["is_read"])

    # -- read behavior -------------------------------------------------------
    if read_w is None:
        # The value expression partial-evaluates (compound, or an
        # already-assigned witness): read-active instances hit the
        # reference's "must read into a specified witness" panic
        # (memory_op.rs:94-96).
        bad = bad | is_read
    else:
        read = block[batch, idx_c]  # (B, L)
        read = jnp.where((active & in_bounds)[:, None], read, 0)
        old = jnp.take(W, jnp.asarray([read_w]), axis=1)[:, 0]
        W = W.at[:, read_w].set(jnp.where(is_read[:, None], read, old))

    # -- write behavior ------------------------------------------------------
    if buf["value"] is not None:
        wval = eval_exprs(ctx, W, buf["value"])[:, 0]  # (B, L)
    else:
        # Stored value is the witness this very op assigns on reads: a
        # write-active instance cannot evaluate it (OpcodeNotSolvable).
        wval = jnp.zeros((W.shape[0], NUM_LIMBS), jnp.uint32)
        bad = bad | (~is_read & active)
    do_write = (~is_read) & active & in_bounds & ~too_big
    if buf.get("op_sel") is not None or not buf["is_read"]:
        old_mem = block[batch, idx_c]
        newv = jnp.where(do_write[:, None], wval, old_mem)
        block = block.at[batch, idx_c].set(newv)
        mem = dict(mem)
        mem[buf["block_key"]] = block

    ok = ok & ~bad
    fail = note_failures(fail, bad[:, None], [buf["op_idx"]])
    return W, ok, fail, mem


def run_brillig(ctx, W, ok, stage: BrilligTraceStage, packs):
    B = W.shape[0]
    input_regs = []
    for (kind, _), pack in zip(stage.inputs, packs["inputs"]):
        if kind == "single":
            input_regs.append(eval_exprs(ctx, W, pack)[:, 0])
        else:
            # Array inputs load a memory pointer; traceable bytecode has no
            # Load/Store so arrays only matter for foreign calls (host path).
            raise NotImplementedError(
                "array inputs require Load/Store and take the host VM path"
            )
    regs = trace_brillig(ctx, B, stage.bytecode, input_regs)
    if stage.predicate is not None:
        pred = eval_exprs(ctx, W, packs["pred"])
        active = ~ctx.is_zero(pred)[:, 0]
    else:
        active = None
    for reg_index, witness in stage.output_simple:
        val = regs.get_arr(reg_index)
        if active is not None:
            val = jnp.where(active[:, None], val, 0)
        W = W.at[:, witness].set(val)
    return W, ok


# ---------------------------------------------------------------------------
# Solver
# ---------------------------------------------------------------------------


@dataclass
class _Segment:
    levels: List[dict]  # packed device buffers per level
    host_stages: List[HostStage]  # run after the device levels


class BatchSolver:
    def __init__(
        self,
        plan: Plan,
        backend: Optional[BlackBoxFunctionSolver] = None,
        foreign_call_handler: Optional[Callable] = None,
        mesh=None,
        max_levels_per_segment: int = 64,
    ):
        self.plan = plan
        self.ctx = LimbContext(plan.params)
        self.backend = backend or GrumpkinSolver()
        self.foreign_call_handler = foreign_call_handler
        self.mesh = mesh  # optional jax.sharding.Mesh: shard the batch axis
        # Deep circuits produce many levels; bounding levels-per-jit keeps each
        # compiled graph a manageable size (several jits instead of one huge one).
        self.max_levels_per_segment = max_levels_per_segment
        # Any static-arith gate fuses (tiny levels pad to the 128-gate
        # minimum bucket); circuits without them stay on the legacy layout.
        self._has_fused_levels = any(
            g.neg_inv_den_r is not None
            for level in plan.levels
            for g in level.arith_solve
        )
        self.segments = self._build_segments()
        self._segment_fns: Dict[int, Callable] = {}
        from ..utils.logging import get_logger

        self._log = get_logger("batch_solver")
        self._log.info(
            "plan: %d opcodes, %d witnesses, %d levels in %d segments "
            "(%d host stages)%s",
            len(plan.circuit.opcodes),
            plan.num_witnesses,
            len(plan.levels),
            len(self.segments),
            sum(len(s.host_stages) for s in self.segments),
            f", mesh={tuple(mesh.shape.items())}" if mesh is not None else "",
        )

    # -- packing ------------------------------------------------------------
    def _pack_level(self, level: Level) -> dict:
        packed: dict = {"kinds": []}

        static_gates = [g for g in level.arith_solve if g.neg_inv_den_r is not None]
        dyn_gates = [g for g in level.arith_solve if g.neg_inv_den_r is None]
        if static_gates:
            packed["kinds"].append("arith_static")
            # Fold the static -1/den scale into the packed coefficients (host
            # ints), so the device evaluates plain `qc' + sum c'_i v_i` with no
            # per-gate scale multiply chain in the hot kernel.
            p = self.plan.params.modulus
            r_inv = pow(self.plan.params.r % p, p - 2, p)
            folded = []
            for g in static_gates:
                s = g.neg_inv_den_r * r_inv % p  # -1/den (standard form)
                e = g.num
                folded.append(
                    ExprPlan(
                        lin_idx=e.lin_idx,
                        lin_coeff_r=[c * s % p for c in e.lin_coeff_r],
                        mul_idx=e.mul_idx,
                        mul_coeff_r2=[c * s % p for c in e.mul_coeff_r2],
                        qc=e.qc * s % p,
                    )
                )
            packed["arith_static"] = dict(
                num=pack_exprs(folded),
                u_idx=np.asarray([g.unknown for g in static_gates], np.int32),
            )
        if dyn_gates:
            packed["kinds"].append("arith_dyn")
            d = max(len(g.den_dyn_idx) for g in dyn_gates)
            dyn_idx = np.zeros((len(dyn_gates), d), np.int32)
            dyn_coeff = np.zeros((len(dyn_gates), d, NUM_LIMBS), np.uint32)
            for i, g in enumerate(dyn_gates):
                for j, (w, c) in enumerate(zip(g.den_dyn_idx, g.den_dyn_coeff_r)):
                    dyn_idx[i, j] = w
                    dyn_coeff[i, j] = _limbs_of(c)
            packed["arith_dyn"] = dict(
                num=pack_exprs([g.num for g in dyn_gates]),
                u_idx=np.asarray([g.unknown for g in dyn_gates], np.int32),
                op_idx=np.asarray(
                    [g.opcode_index for g in dyn_gates], np.int32
                ),
                # The denominator is itself an expression panel: qc=den_const,
                # linear terms = the mul-term partners.
                den=dict(
                    lin_idx=dyn_idx,
                    lin_coeff=dyn_coeff,
                    mul_idx=np.zeros((len(dyn_gates), 0, 2), np.int32),
                    mul_coeff=np.zeros(
                        (len(dyn_gates), 0, NUM_LIMBS), np.uint32
                    ),
                    qc=np.stack([_limbs_of(g.den_const) for g in dyn_gates]),
                ),
            )
        if level.arith_check:
            packed["kinds"].append("arith_check")
            packed["arith_check"] = dict(
                expr=pack_exprs([g.expr for g in level.arith_check]),
                op_idx=np.asarray(
                    [g.opcode_index for g in level.arith_check], np.int32
                ),
            )
        if level.range_checks:
            packed["kinds"].append("range")
            packed["range"] = dict(
                w_idx=np.asarray([g.witness for g in level.range_checks], np.int32),
                zero_mask=np.stack(
                    [_range_zero_mask(g.num_bits) for g in level.range_checks]
                ),
                op_idx=np.asarray(
                    [g.opcode_index for g in level.range_checks], np.int32
                ),
            )
        for is_xor, name in ((False, "and"), (True, "xor")):
            gates = [g for g in level.logic if g.is_xor == is_xor]
            if gates:
                packed["kinds"].append(name)
                packed[name] = dict(
                    lhs=np.asarray([g.lhs for g in gates], np.int32),
                    rhs=np.asarray([g.rhs for g in gates], np.int32),
                    out=np.asarray([g.output for g in gates], np.int32),
                    allow_mask=np.stack([_allow_mask(g.num_bits) for g in gates]),
                )
        if level.quotient:
            packed["kinds"].append("quotient")
            one = ExprPlan([], [], [], [], 1)
            packed["quotient"] = dict(
                a=pack_exprs([g.a for g in level.quotient]),
                b=pack_exprs([g.b for g in level.quotient]),
                pred=pack_exprs(
                    [g.predicate if g.predicate else one for g in level.quotient]
                ),
                q_idx=np.asarray([g.q for g in level.quotient], np.int32),
                r_idx=np.asarray([g.r for g in level.quotient], np.int32),
            )
        if level.to_le_radix:
            packed["kinds"].append("to_le_radix")
            gates = level.to_le_radix
            d_gate, d_limb, d_bitoff, out_idx, d_mask = [], [], [], [], []
            overflow = []
            for gi, g in enumerate(gates):
                bits_per = g.radix.bit_length() - 1
                for di, w in enumerate(g.outputs):
                    shift = di * bits_per
                    d_gate.append(gi)
                    d_limb.append(min(shift // LIMB_BITS, NUM_LIMBS - 1))
                    d_bitoff.append(shift % LIMB_BITS)
                    out_idx.append(w)
                    d_mask.append(g.radix - 1)
                overflow.append(_range_zero_mask(bits_per * len(g.outputs)))
            d_limb = np.asarray(d_limb, np.int32)
            packed["to_le_radix"] = dict(
                value=pack_exprs([g.a for g in gates]),
                op_idx=np.asarray([g.opcode_index for g in gates], np.int32),
                d_gate=np.asarray(d_gate, np.int32),
                d_limb=d_limb,
                d_limb_hi=np.minimum(d_limb + 1, NUM_LIMBS - 1),
                d_bitoff=np.asarray(d_bitoff, np.uint32),
                d_mask=np.asarray(d_mask, np.uint32),
                out_idx=np.asarray(out_idx, np.int32),
                overflow_mask=np.stack(overflow),
            )
        if level.hashes:
            # Group by (kind, message byte length) — each group is one kernel.
            groups: Dict[Tuple[str, int], list] = {}
            for gate in level.hashes:
                groups.setdefault((gate.kind, len(gate.byte_src)), []).append(gate)
            hash_packs = []
            for (kind, M), gates in groups.items():
                G = len(gates)
                n_out = len(gates[0].outputs)  # 32 bytes, or 1 field (h2f)
                src_w = np.zeros((G, M), np.int32)
                src_limb = np.zeros((G, M), np.int32)
                src_shift = np.zeros((G, M), np.uint32)
                out_idx = np.zeros((G, n_out), np.int32)
                size_w = np.zeros((G,), np.int32)
                for gi, gate in enumerate(gates):
                    for j, (w, limb, shift) in enumerate(gate.byte_src):
                        src_w[gi, j] = w
                        src_limb[gi, j] = limb
                        src_shift[gi, j] = shift
                    out_idx[gi] = gate.outputs
                    if gate.size_witness is not None:
                        size_w[gi] = gate.size_witness
                hash_packs.append(
                    dict(
                        kind=kind,
                        src_w=src_w,
                        src_limb=src_limb,
                        src_shift=src_shift,
                        out_idx=out_idx.reshape(-1),
                        size_w=size_w,
                        op_idx=np.asarray(
                            [g.opcode_index for g in gates], np.int32
                        ),
                    )
                )
            packed["kinds"].append("hashes")
            packed["hashes"] = hash_packs
        if level.ec_fixed_base:
            from . import ec
            from ..blackbox.ec import grumpkin as _gk

            gates = level.ec_fixed_base
            packed["kinds"].append("ec_fixed_base")
            packed["ec_fixed_base"] = dict(
                low_idx=np.asarray([g.low for g in gates], np.int32),
                op_idx=np.asarray([g.opcode_index for g in gates], np.int32),
                high_idx=np.asarray([g.high for g in gates], np.int32),
                out_x=np.asarray([g.out_x for g in gates], np.int32),
                out_y=np.asarray([g.out_y for g in gates], np.int32),
                order_limbs=np.asarray(
                    int_to_limbs(_gk.params.n), dtype=np.uint32
                ),
                table=np.asarray(ec._window_table_np(_gk.generator())),
            )
        if level.ec_pedersen:
            from . import ec
            from ..blackbox.grumpkin import derive_generator

            packed["kinds"].append("ec_pedersen")
            pedersen_packs = []
            for gate in level.ec_pedersen:
                tables = [
                    np.asarray(
                        ec._window_table_np(
                            derive_generator(gate.domain_separator, i)
                        )
                    )
                    for i in range(len(gate.inputs))
                ]
                pedersen_packs.append(
                    dict(
                        input_idx=np.asarray(gate.inputs, np.int32),
                        tables=tables,
                        out_x=gate.out_x,
                        out_y=gate.out_y,
                    )
                )
            packed["ec_pedersen"] = pedersen_packs
        if level.schnorr:
            from . import ec
            from ..blackbox.ec import grumpkin as _gk
            from ..blackbox.grumpkin import derive_generator

            groups: Dict[int, list] = {}
            for gate in level.schnorr:
                groups.setdefault(len(gate.message), []).append(gate)
            packed["kinds"].append("schnorr")
            schnorr_packs = []
            for msg_len, gates in groups.items():
                schnorr_packs.append(
                    dict(
                        pub_x=np.asarray([g.pub_x for g in gates], np.int32),
                        pub_y=np.asarray([g.pub_y for g in gates], np.int32),
                        sig_idx=np.asarray(
                            [g.signature for g in gates], np.int32
                        ),
                        msg_idx=np.asarray([g.message for g in gates], np.int32),
                        out_idx=np.asarray([g.output for g in gates], np.int32),
                        pedersen_tables=[
                            np.asarray(ec._window_table_np(derive_generator(0, i)))
                            for i in range(3)
                        ],
                        gen_table=np.asarray(
                            ec._window_table_np(_gk.generator())
                        ),
                    )
                )
            packed["schnorr"] = schnorr_packs
        if level.ecdsa:
            groups: Dict[str, list] = {}
            for gate in level.ecdsa:
                groups.setdefault(gate.curve, []).append(gate)
            packed["kinds"].append("ecdsa")
            packed["ecdsa"] = [
                dict(
                    curve=curve,
                    op_idx=np.asarray(
                        [g.opcode_index for g in gates], np.int32
                    ),
                    pub_x=np.asarray([g.pub_x for g in gates], np.int32),
                    pub_y=np.asarray([g.pub_y for g in gates], np.int32),
                    sig=np.asarray([g.signature for g in gates], np.int32),
                    msg=np.asarray([g.hashed_msg for g in gates], np.int32),
                    out_idx=np.asarray([g.output for g in gates], np.int32),
                )
                for curve, gates in groups.items()
            ]
        if level.zero_out:
            packed["kinds"].append("zero_out")
            packed["zero_out"] = dict(
                idx=np.asarray(level.zero_out, np.int32)
            )
        if level.memory:
            packed["kinds"].append("memory")
            one = ExprPlan([], [], [], [], 1)
            stages = []
            for st in level.memory:
                if isinstance(st, MemoryInitStage):
                    stages.append(
                        dict(
                            kind="init",
                            block_key=str(st.block_id),
                            init_idx=np.asarray(st.init, np.int32),
                        )
                    )
                else:
                    stages.append(
                        dict(
                            kind="op",
                            block_key=str(st.block_id),
                            op_idx=int(st.opcode_index),
                            is_read=st.is_read,
                            index=pack_exprs([st.index]),
                            pred=pack_exprs([st.predicate or one]),
                            read_into=st.read_into,
                            value=pack_exprs([st.write_value])
                            if st.write_value
                            else None,
                            op_sel=pack_exprs([st.op_sel])
                            if st.op_sel is not None
                            else None,
                        )
                    )
            packed["memory"] = stages
        if level.brillig:
            packed["kinds"].append("brillig")
            stage_packs = []
            for st in level.brillig:
                packs = dict(
                    inputs=[
                        pack_exprs([e])
                        if kind == "single"
                        else [pack_exprs([x]) for x in e]
                        for kind, e in st.inputs
                    ],
                    pred=pack_exprs([st.predicate]) if st.predicate else None,
                )
                stage_packs.append((st, packs))
            packed["brillig"] = stage_packs
        return packed

    def _build_segments(self) -> List[_Segment]:
        segments: List[_Segment] = []
        current = _Segment(levels=[], host_stages=[])
        for level in self.plan.levels:
            current.levels.append(self._pack_level(level))
            if level.host:
                current.host_stages = list(level.host)
                segments.append(current)
                current = _Segment(levels=[], host_stages=[])
            elif len(current.levels) >= self.max_levels_per_segment:
                segments.append(current)
                current = _Segment(levels=[], host_stages=[])
        if current.levels or current.host_stages:
            segments.append(current)
        return segments

    # -- device execution ---------------------------------------------------
    def _run_level(self, W, ok, fail, mem, packed):
        ctx = self.ctx
        for kind in packed["kinds"]:
            if kind == "arith_static":
                W, ok = run_arith_solve_static(ctx, W, ok, packed[kind])
            elif kind == "arith_dyn":
                W, ok, fail = run_arith_solve_dyn(ctx, W, ok, fail, packed[kind])
            elif kind == "arith_check":
                W, ok, fail = run_arith_check(ctx, W, ok, fail, packed[kind])
            elif kind == "range":
                W, ok, fail = run_range(ctx, W, ok, fail, packed[kind])
            elif kind in ("and", "xor"):
                W, ok = run_logic(ctx, W, ok, packed[kind], kind == "xor")
            elif kind == "quotient":
                W, ok = run_quotient(ctx, W, ok, packed[kind])
            elif kind == "to_le_radix":
                W, ok, fail = run_to_le_radix(ctx, W, ok, fail, packed[kind])
            elif kind == "hashes":
                for hash_pack in packed["hashes"]:
                    W, ok, fail = run_hashes(ctx, W, ok, fail, hash_pack)
            elif kind == "ec_fixed_base":
                W, ok, fail = run_ec_fixed_base(ctx, W, ok, fail, packed[kind])
            elif kind == "ec_pedersen":
                for gate_buf in packed["ec_pedersen"]:
                    W, ok = run_ec_pedersen(ctx, W, ok, gate_buf)
            elif kind == "schnorr":
                for schnorr_buf in packed["schnorr"]:
                    W, ok = run_schnorr(ctx, W, ok, schnorr_buf)
            elif kind == "ecdsa":
                for ecdsa_buf in packed["ecdsa"]:
                    W, ok, fail = run_ecdsa(ctx, W, ok, fail, ecdsa_buf)
            elif kind == "zero_out":
                idx = packed["zero_out"]["idx"]
                W = W.at[:, idx].set(0)
            elif kind == "memory":
                for st in packed["memory"]:
                    if st["kind"] == "init":
                        W, ok, mem = run_memory_init(ctx, W, ok, mem, st)
                    else:
                        W, ok, fail, mem = run_memory_op(
                            ctx, W, ok, fail, mem, st
                        )
            elif kind == "brillig":
                for stage, packs in packed["brillig"]:
                    W, ok = run_brillig(ctx, W, ok, stage, packs)
            else:
                raise AssertionError(kind)
        return W, ok, fail, mem

    def _pad_static_level(self, buf: dict, to: int) -> dict:
        """Pad an arith_static pack's gate axis to ``to``: zero coefficients
        make padding gates compute 0, and their scatter lands in the scratch
        witness column (index plan.num_witnesses) that initial_state allocates
        past the real witnesses."""
        E = buf["u_idx"].shape[0]
        if E == to:
            return buf
        pad = to - E

        def pad0(a):
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, widths)

        out = jax.tree_util.tree_map(pad0, buf)
        out["u_idx"] = np.concatenate(
            [buf["u_idx"], np.full((pad,), self.plan.num_witnesses, np.int32)]
        )
        return out

    def _scan_groups(self, levels: List[dict]) -> List[object]:
        """Group consecutive pure-arith_static levels whose term shapes match
        into ONE ``lax.scan`` body over stacked descriptors: deep circuits are
        dominated by such levels, and scanning keeps the compiled graph one
        level deep instead of unrolling hundreds of copies (compile time in
        this environment is the scarce resource).  Gate counts are padded up
        to a power-of-two bucket so nearby levels share a shape (< 2x padded
        compute worst case, and padding gates cost no HBM writes beyond the
        scratch column).

        Each scan group (and each standalone arith_static level) also carries
        a packed descriptor table for the fused gather->CIOS->scatter kernel
        (`fused_level.py`); `_segment_fn` picks that route when the batch
        shape allows it."""
        from .fused_level import pack_level_desc

        scratch = self.plan.num_witnesses

        def key(packed):
            if packed["kinds"] != ["arith_static"]:
                return None
            buf = packed["arith_static"]
            E = buf["u_idx"].shape[0]
            # Minimum bucket 128: every arith_static level fuses (a level
            # that fell back to the legacy path mid-segment forced an
            # 8 GB rows->batch-major conversion around it), tiny levels pad
            # up (padding gates write the scratch row), and the kernel's
            # fori trip count stays large enough to dodge the pathological
            # tiny-loop Mosaic compile times.  Above 1024 gates buckets are
            # 1024-granular, not power-of-two: the headline circuit's
            # 8-15k-gate levels padded 33% with pow2 buckets, 6% with this.
            if E <= 1024:
                bucket = max(128, 1 << max(0, (E - 1).bit_length()))
            else:
                bucket = -(-E // 1024) * 1024
            return (bucket, buf["num"]["lin_idx"].shape[1:],
                    buf["num"]["mul_idx"].shape[1:])

        def fused_desc(buf, bucket):
            from .fused_level import desc_fits

            t1 = buf["num"]["lin_idx"].shape[1]
            t2 = buf["num"]["mul_idx"].shape[1]
            if not desc_fits(t1, t2):
                # Very wide expressions (60+ terms/gate): even the minimum
                # chunk's double-buffered descriptor block exceeds the SMEM
                # budget — route the level to the legacy XLA path instead of
                # failing at Mosaic compile.
                return None, None
            return pack_level_desc(buf, scratch, pad_to=bucket), (t1, t2)

        groups: List[object] = []
        run: List[dict] = []
        run_key = None

        def flush():
            nonlocal run, run_key
            if len(run) >= 2:
                bucket = run_key[0]
                bufs = [self._pad_static_level(p["arith_static"], bucket)
                        for p in run]
                desc0, tshape = fused_desc(run[0]["arith_static"], bucket)
                if desc0 is None:
                    groups.append(("scan", bufs, None, None))
                else:
                    descs = [desc0] + [
                        fused_desc(p["arith_static"], bucket)[0]
                        for p in run[1:]
                    ]
                    groups.append(("scan", bufs, np.stack(descs), tshape))
            elif run:
                p = run[0]
                bucket = run_key[0]
                desc, tshape = fused_desc(p["arith_static"], bucket)
                groups.append(("level", p, desc, tshape))
            run, run_key = [], None

        for packed in levels:
            k = key(packed)
            if k is not None and k == run_key:
                run.append(packed)
                continue
            flush()
            if k is None:
                groups.append(("level", packed, None, None))
            else:
                run, run_key = [packed], k
        flush()
        return groups

    def _fused_eligible(self, B: int) -> bool:
        """The fused gather->CIOS->scatter level kernel (fused_level.py):
        TPU backend, batch a multiple of 1024 (8 sublanes x 128 lanes of
        uint32 per limb vreg).  Under a mesh the witness-major panel shards
        on its S axis (rows_sharding) and each device runs the kernel on its
        local slice via shard_map — arith gates are batch-independent, so
        there is no cross-shard traffic; the per-shard batch must itself be a
        multiple of 1024.  Multi-process jobs stay on the legacy engine (host
        stages there rebuild panels from gathered host copies, which assumes
        the batch-major layout).  ACVM_TPU_NO_FUSED=1 disables."""
        import os

        if os.environ.get("ACVM_TPU_NO_FUSED"):
            return False
        if not self._has_fused_levels:
            # No fused-solvable levels: the rows layout would only add
            # panel-conversion copies around the other kernels.
            return False
        if self.mesh is not None:
            if jax.process_count() > 1:
                return False
            if B % (1024 * self.mesh.size) != 0:
                return False
        elif B % 1024 != 0:
            return False
        try:
            if jax.default_backend() == "tpu":
                return True
        except Exception:
            return False
        # Off-TPU the fused path substitutes the vectorized jnp twin of the
        # level kernel (fused_level_jnp — identical descriptor semantics):
        # the virtual-CPU multi-chip dryrun and CPU tests use this to
        # validate the fused engine's sharding and layouts without hardware.
        return bool(os.environ.get("ACVM_TPU_FUSED_INTERPRET"))

    def _segment_fn(self, seg_index: int):
        fn = self._segment_fns.get(seg_index)
        if fn is None:
            segment = self.segments[seg_index]
            groups = self._scan_groups(segment.levels)
            ctx = self.ctx

            @jax.jit
            def run(W, ok, fail, mem):
                from .fused_level import (
                    fused_level_call,
                    from_rows,
                    to_rows,
                )

                # Canonical layout is whatever the caller handed us: 4-D =
                # witness-major rows (the fused-path layout, built directly by
                # initial_state so NO full-panel transpose ever runs — a
                # to_rows inside this jit doubled peak HBM and OOMed B=2048),
                # 3-D = legacy batch-major.  Groups convert locally only when
                # they must.
                rows_in = W.ndim == 4
                if rows_in:
                    B = int(W.shape[2]) * int(W.shape[3])
                    W_rows, W = W, None
                else:
                    B = int(W.shape[0])
                    W_rows = None
                fused_ok = self._fused_eligible(B)

                def enter_rows(W, W_rows):
                    return (None, to_rows(W)) if W_rows is None else (W, W_rows)

                def leave_rows(W, W_rows):
                    return (from_rows(W_rows), None) if W is None else (W, W_rows)

                def run_fused(W_rows, descs, t1, t2, scan):
                    """One fused level (or a scan over stacked levels); under
                    a mesh the panel is sharded on its S axis and each device
                    runs the kernel on its local slice (shard_map; descriptor
                    tables replicated).  Gates are batch-independent, so the
                    sharded program has NO collectives — the per-chip
                    semantics stay those of acvm/src/pwg/arithmetic.rs."""

                    def local(Wr, d):
                        if scan:
                            def body(Wc, dd):
                                return (
                                    fused_level_call(
                                        Wc, dd, ctx.params, t1, t2
                                    ),
                                    None,
                                )

                            Wr, _ = jax.lax.scan(body, Wr, d)
                            return Wr
                        return fused_level_call(Wr, d, ctx.params, t1, t2)

                    if self.mesh is None:
                        return local(W_rows, descs)
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P

                    axis = self.mesh.axis_names[0]
                    spec = P(None, None, axis, None)
                    return shard_map(
                        local,
                        mesh=self.mesh,
                        in_specs=(spec, P()),
                        out_specs=spec,
                        check_vma=False,
                    )(W_rows, descs)

                for group in groups:
                    kind, item = group[0], group[1]
                    desc, tshape = group[2], group[3]
                    if kind == "scan" and desc is not None and fused_ok:
                        W, W_rows = enter_rows(W, W_rows)
                        t1, t2 = tshape
                        W_rows = run_fused(
                            W_rows, jnp.asarray(desc), t1, t2, scan=True
                        )
                    elif kind == "level" and desc is not None and fused_ok:
                        W, W_rows = enter_rows(W, W_rows)
                        t1, t2 = tshape
                        W_rows = run_fused(
                            W_rows, jnp.asarray(desc), t1, t2, scan=False
                        )
                    elif kind == "scan":
                        W, W_rows = leave_rows(W, W_rows)
                        stacked = jax.tree_util.tree_map(
                            lambda *xs: np.stack(xs), *item
                        )

                        def sbody(carry, xs):
                            Wc, okc = carry
                            Wc, okc = run_arith_solve_static(ctx, Wc, okc, xs)
                            return (Wc, okc), None

                        (W, ok), _ = jax.lax.scan(sbody, (W, ok), stacked)
                    else:
                        W, W_rows = leave_rows(W, W_rows)
                        W, ok, fail, mem = self._run_level(W, ok, fail, mem, item)
                # Return in the caller's layout.
                if rows_in:
                    W, W_rows = enter_rows(W, W_rows)
                    return W_rows, ok, fail, mem
                W, W_rows = leave_rows(W, W_rows)
                return W, ok, fail, mem

            fn = run
            self._segment_fns[seg_index] = fn
        return fn

    def _segment_fn_donated(self, seg_index: int):
        """The segment function with the witness panel donated: solve()
        discards the input state, and without donation the in-place fused
        kernels force XLA to hold TWO HBM-sized panels (a 2048-instance
        2^16-gate chunk OOMed at compile)."""
        key = ("donated", seg_index)
        fn = self._segment_fns.get(key)
        if fn is None:
            fn = jax.jit(self._segment_fn(seg_index), donate_argnums=(0,))
            self._segment_fns[key] = fn
        return fn

    # -- host stages ---------------------------------------------------------
    def _run_host_stages(self, W, ok, fail, stages: List[HostStage]):
        from ..pwg import blackbox as bb_dispatch
        from ..pwg.brillig_solver import BrilligSolver
        from ..pwg.directives import solve_directives

        import os

        from . import host_batch

        rows_layout = W.ndim == 4  # witness-major fused-path panel
        ok_np = _to_host_np(ok).copy()
        fail_np = _to_host_np(fail).copy()
        p = self.plan.params.modulus

        # Columns worth materializing as Python ints: only the witnesses the
        # stage's opcodes actually read.  (known_before — every witness known
        # at earlier levels — can be nearly the whole panel; pulling it to the
        # host made one PermutationSort in a big circuit cost B × num_witnesses
        # Python conversions.)
        needed = set()
        writes = set()
        for stage in stages:
            needed.update(stage.reads if stage.reads else stage.known_before)
            writes.update(stage.writes)
        cols = sorted(needed)
        if rows_layout:
            # Read only the needed witness rows off the device — never the
            # full panel (8 GB at B=2048 on the 2^16-gate circuit).
            B = int(W.shape[2]) * int(W.shape[3])
            sel = np.asarray(
                jnp.take(W, jnp.asarray(cols, jnp.int32), axis=0)
            ).reshape(len(cols), NUM_LIMBS, B)
            ints = _limb_cols_to_object(sel)
            W_np = None
        else:
            W_np = _to_host_np(W)
            B = W_np.shape[0]
            sel = np.ascontiguousarray(W_np[:, cols, :].transpose(1, 2, 0))
            ints = _limb_cols_to_object(sel)
        # Column store shared by every stage: batched stages read/write (B,)
        # object arrays; later stages see earlier stages' outputs.
        col_arrays: Dict[int, np.ndarray] = {
            w: ints[:, i] for i, w in enumerate(cols)
        }

        def get_col(w: int) -> np.ndarray:
            return col_arrays[int(w)]

        write_cols = sorted(writes)
        wpos = {w: i for i, w in enumerate(write_cols)}
        out_vals = np.zeros((B, len(write_cols)), dtype=object)

        def store_writes(values: Dict[int, np.ndarray]):
            for w, arr in values.items():
                col_arrays[w] = arr
                out_vals[:, wpos[w]] = arr

        no_batch = bool(os.environ.get("ACVM_TPU_NO_HOST_BATCH"))

        def run_stage_per_instance(stage, op_index, opcode):
            """Bit-exact per-instance fallback for one host stage."""
            # Reads only: pre-inserting a write column would turn the solver's
            # own output insert into a spurious UnsatisfiedConstrain conflict.
            stage_cols = sorted(
                set(stage.reads if stage.reads else stage.known_before)
                - set(stage.writes)
            )
            for b in range(B):
                wm = WitnessMap()
                for w in stage_cols:
                    if w in col_arrays:
                        wm.insert(
                            Witness(w), FieldElement(int(col_arrays[w][b]))
                        )
                try:
                    if isinstance(opcode, ops.OpcodeBlackBoxFuncCall):
                        bb_dispatch.solve(self.backend, wm, opcode.call)
                    elif isinstance(opcode, ops.OpcodeDirective):
                        solve_directives(wm, opcode.directive)
                    elif isinstance(opcode, ops.OpcodeBrillig):
                        # Per-instance oracle replay list: results from one
                        # instance must not leak into the next (the reference
                        # consumes opcodes per execution, pwg/mod.rs:139-152).
                        replay = list(opcode.brillig.foreign_call_results)
                        wait = BrilligSolver.solve(
                            wm, opcode.brillig, self.backend, op_index, replay
                        )
                        while wait is not None:
                            if self.foreign_call_handler is None:
                                raise OpcodeResolutionError(
                                    "foreign call requires a handler in "
                                    "batched mode"
                                )
                            from ..api import _decode_foreign_call_result

                            inputs = [
                                [v.to_field() for v in group]
                                for group in wait.inputs
                            ]
                            result = self.foreign_call_handler(
                                wait.function, inputs
                            )
                            replay.append(
                                _decode_foreign_call_result(result)
                            )
                            wait = BrilligSolver.solve(
                                wm, opcode.brillig, self.backend, op_index,
                                replay,
                            )
                    else:
                        raise AssertionError(opcode)
                except OpcodeResolutionError:
                    ok_np[b] = False
                    fail_np[b] = min(fail_np[b], op_index)
                for w in stage.writes:
                    value = wm.get(Witness(w))
                    v = int(value) if value is not None else 0
                    out_vals[b, wpos[w]] = v
                    if w not in col_arrays:
                        col_arrays[w] = np.zeros(B, dtype=object)
                    col_arrays[w][b] = v

        for stage in stages:
            for op_index in stage.opcode_indices:
                opcode = self.plan.circuit.opcodes[op_index]
                # Vectorized fast paths across the whole instance axis
                # (host_batch.py); everything else runs per instance.
                if not no_batch:
                    try:
                        if isinstance(
                            opcode, ops.OpcodeBrillig
                        ) and host_batch.brillig_batchable(opcode.brillig):
                            store_writes(
                                host_batch.run_brillig_batch(
                                    opcode.brillig, get_col, B, p
                                )
                            )
                            continue
                        if isinstance(opcode, ops.OpcodeBrillig):
                            from . import brillig_vm_device

                            if brillig_vm_device.device_vm_eligible(
                                opcode.brillig
                            ):
                                # Tier-2 device VM: divergent (Jump/Load/
                                # Store) bytecode runs as a batched SIMD
                                # interpreter; traps flip instance flags.
                                values, trap = (
                                    brillig_vm_device.run_brillig_vm_batch(
                                        opcode.brillig, get_col, B, p
                                    )
                                )
                                store_writes(values)
                                if trap.any():
                                    ok_np &= ~trap
                                    fail_np[trap] = np.minimum(
                                        fail_np[trap], np.int32(op_index)
                                    )
                                continue
                        if isinstance(opcode, ops.OpcodeDirective) and isinstance(
                            opcode.directive, ops.DirPermutationSort
                        ):
                            store_writes(
                                host_batch.run_permutation_sort_batch(
                                    opcode.directive, get_col, B, p
                                )
                            )
                            continue
                        if isinstance(opcode, ops.OpcodeDirective) and isinstance(
                            opcode.directive, ops.DirToLeRadix
                        ):
                            values, bad = host_batch.run_to_le_radix_batch(
                                opcode.directive, get_col, B, p
                            )
                            store_writes(values)
                            if bad.any():
                                ok_np &= ~bad
                                fail_np[bad] = np.minimum(
                                    fail_np[bad], np.int32(op_index)
                                )
                            continue
                    except host_batch.HostBatchFallback:
                        pass
                run_stage_per_instance(stage, op_index, opcode)

        # Push writes back as limb columns.
        limbs = None
        if write_cols:
            limbs = _object_cols_to_limbs(out_vals)
        if isinstance(W, jax.Array) and not W.is_fully_addressable:
            # Multi-process mesh: a per-column device scatter would mix
            # process-local update operands with a global array, so rebuild
            # the panel from the gathered host copy and re-shard the batch
            # axis over the mesh.  (Sharded solves never use the rows layout.)
            if limbs is not None:
                W_np[:, write_cols] = limbs
            from ..parallel import shard_batch

            return shard_batch((W_np, ok_np, fail_np), self.mesh)
        if limbs is not None:
            idx = np.asarray(write_cols, np.int32)
            if rows_layout:
                S = int(W.shape[2])
                rows = np.ascontiguousarray(
                    limbs.transpose(1, 2, 0)
                ).reshape(len(write_cols), NUM_LIMBS, S, 128)
                W = jnp.asarray(W).at[idx].set(jnp.asarray(rows))
            else:
                W = jnp.asarray(W).at[:, idx].set(jnp.asarray(limbs))
        return W, jnp.asarray(ok_np), jnp.asarray(fail_np)

    # -- public API ----------------------------------------------------------
    def initial_state(self, input_values: Sequence[Dict[int, int]]):
        """Build (W, ok, fail, mem) from per-instance {witness_index: int}
        dicts.  ``fail`` starts at the FAIL_NONE sentinel and tracks the first
        failing opcode index per instance.

        Packing is vectorized: when every instance assigns the same witness
        set (the batch norm), values are reduced mod p as one object-array op
        and serialized through ``int.to_bytes`` + ``np.frombuffer`` into the
        16-bit-limb panel — ~15x faster than per-element Python limb splits,
        which dominated gadget-circuit solves (512+ input witnesses each)."""
        B, kwargs = self._pack_host(input_values)
        return self._finish_initial_state(B, **kwargs)

    def _pack_host(self, input_values):
        """The pure-host half of :meth:`initial_state`: normalize the inputs
        into dense numpy buffers WITHOUT touching the device.  Returns
        (B, kwargs-for-_finish_initial_state).  Streamed solves run this on a
        prefetch thread so chunk k+1's packing overlaps chunk k's device
        solve."""
        p = self.plan.params.modulus
        if isinstance(input_values, tuple) and len(input_values) == 2:
            # Packed-matrix form: (witness_indices, (B, K) uint8/16 matrix) —
            # the highest-throughput ingest: one array (host numpy or
            # device-resident jax), no per-column handling at all.  Column k
            # of the matrix assigns witness_indices[k].
            cols_list, vals2d = input_values
            # Mirror the dict-columnar checks: _build_panel_narrow writes each
            # value whole into ONE 16-bit limb slot, so wider dtypes (or
            # duplicate columns, whose scatter order would be undefined) must
            # be rejected, not silently corrupted.
            if np.dtype(vals2d.dtype) not in (
                np.dtype(np.uint8), np.dtype(np.uint16)
            ):
                raise ValueError(
                    "packed-matrix inputs must be uint8/uint16 (values are "
                    f"written to a single 16-bit limb); got {vals2d.dtype}"
                )
            cols_arr = np.fromiter(
                (int(w) for w in cols_list), np.int64, len(cols_list)
            )
            if len(np.unique(cols_arr)) != len(cols_arr):
                raise ValueError(
                    "packed-matrix inputs contain duplicate witness indices"
                )
            order = np.argsort(cols_arr)
            if not (order == np.arange(len(order))).all():
                vals2d = vals2d[:, order]
                cols_arr = cols_arr[order]
            breaks = np.nonzero(np.diff(cols_arr) != 1)[0] + 1
            starts = np.concatenate([[0], breaks, [len(cols_arr)]])
            runs = tuple(
                (int(cols_arr[st]), int(starts[i + 1] - st))
                for i, st in enumerate(starts[:-1])
            )
            return int(vals2d.shape[0]), dict(narrow=(vals2d, runs))
        if isinstance(input_values, dict):
            # Columnar form: {witness_index: (B,) array-like}.  The zero-copy
            # ingest path for batch producers that already hold per-witness
            # arrays (no per-instance Python dicts, no per-element limb
            # splits).  Numeric arrays must hold values < 2^64 (reduced);
            # object arrays take the arbitrary-precision path.
            # Device-resident columnar inputs (values already jax arrays —
            # e.g. produced by an upstream on-device pipeline) skip the
            # host->device upload entirely; on the tunneled runtime here that
            # upload runs at ~34 MB/s and dominated gadget solves.
            dev_items = sorted(
                (int(w), a)
                for w, a in input_values.items()
                if isinstance(a, jax.Array)
            )
            if dev_items and len(dev_items) == len(input_values):
                if all(
                    a.dtype in (jnp.uint8, jnp.uint16) for _, a in dev_items
                ):
                    cols_arr = np.fromiter(
                        (w for w, _ in dev_items), np.int64, len(dev_items)
                    )
                    breaks = np.nonzero(np.diff(cols_arr) != 1)[0] + 1
                    starts = np.concatenate([[0], breaks, [len(cols_arr)]])
                    runs = tuple(
                        (int(cols_arr[st]), int(starts[i + 1] - st))
                        for i, st in enumerate(starts[:-1])
                    )
                    if len(runs) <= 64:
                        vals2d = jnp.stack([a for _, a in dev_items], axis=1)
                        B = int(vals2d.shape[0])
                        return B, dict(narrow=(vals2d, runs))
                # General device values: (B, K) per-column limbs via device
                # shifts (uint32 columns; wider values need the host path).
                input_values = {
                    w: np.asarray(a) for w, a in input_values.items()
                }
            items = sorted(
                (int(w), np.asarray(a)) for w, a in input_values.items()
            )
            B = len(items[0][1]) if items else 0
            # Fast path: contiguous witness range of narrow unsigned values
            # (hash-gadget byte inputs) — one stacked (B, K) array, shipped
            # in its native dtype, panel built by a contiguous slice write.
            if items and all(
                a.dtype.kind == "u" and a.dtype.itemsize <= 2
                for _, a in items
            ):
                cols_arr = np.fromiter(
                    (w for w, _ in items), np.int64, len(items)
                )
                breaks = np.nonzero(np.diff(cols_arr) != 1)[0] + 1
                starts = np.concatenate([[0], breaks, [len(cols_arr)]])
                runs = tuple(
                    (int(cols_arr[s]), int(starts[i + 1] - s))
                    for i, s in enumerate(starts[:-1])
                )
                if len(runs) <= 64:
                    vals2d = np.stack([a for _, a in items], axis=1)
                    return B, dict(narrow=(vals2d, runs))
            nbytes = NUM_LIMBS * LIMB_BITS // 8
            # Minimal limb count: 16-bit limbs from the widest column dtype.
            nl = 1
            for _, arr in items:
                if arr.dtype == object:
                    nl = NUM_LIMBS
                else:
                    nl = max(nl, (arr.dtype.itemsize * 8 + LIMB_BITS - 1)
                             // LIMB_BITS)
            cols_idx = np.asarray([w for w, _ in items], np.int32)
            # uint16 limbs: half the upload bytes (device build upcasts).
            vals = np.zeros((B, len(items), nl), dtype=np.uint16)
            for k, (w, arr) in enumerate(items):
                if arr.shape != (B,):
                    raise ValueError(
                        f"columnar input {w}: shape {arr.shape} != ({B},)"
                    )
                if arr.dtype == object:
                    buf = b"".join(
                        (int(v) % p).to_bytes(nbytes, "little") for v in arr
                    )
                    vals[:, k, :] = np.frombuffer(buf, dtype="<u2").reshape(
                        B, NUM_LIMBS
                    )
                else:
                    v64 = arr.astype(np.uint64)
                    for li in range(min(nl, 64 // LIMB_BITS)):
                        vals[:, k, li] = (
                            (v64 >> np.uint64(LIMB_BITS * li))
                            & np.uint64(MASK16)
                        ).astype(np.uint32)
            return B, dict(cols=cols_idx, vals=vals)
        B = len(input_values)
        keys0 = tuple(sorted(input_values[0])) if B else ()
        uniform = all(tuple(sorted(d)) == keys0 for d in input_values)
        if B and keys0 and uniform:
            cols = np.fromiter((int(k) for k in keys0), np.int32, len(keys0))
            vals_o = np.array(
                [[d[k] for k in keys0] for d in input_values], dtype=object
            )
            vals_o = vals_o % p  # elementwise on Python ints (handles negatives)
            nbytes = NUM_LIMBS * LIMB_BITS // 8
            buf = b"".join(
                int(v).to_bytes(nbytes, "little") for v in vals_o.reshape(-1)
            )
            # Keep the native uint16 limb width: the upload ships half the
            # bytes of a uint32 buffer (the device panel build upcasts).
            vals = np.frombuffer(buf, dtype="<u2").reshape(
                B, len(keys0), NUM_LIMBS
            )
            # Trim all-zero top limbs (byte/word inputs upload 16x less).
            nl = NUM_LIMBS
            while nl > 1 and not vals[:, :, nl - 1].any():
                nl -= 1
            return B, dict(cols=cols, vals=np.ascontiguousarray(
                vals[:, :, :nl]
            ))
        # Non-uniform fallback: dense host panel.  One scratch column past the
        # real witnesses receives the scatter writes of shape-padding gates
        # (see _pad_static_level).
        W = np.zeros((B, self.plan.num_witnesses + 1, NUM_LIMBS), dtype=np.uint32)
        for b, assignment in enumerate(input_values):
            for w, v in assignment.items():
                W[b, int(w)] = _limbs_of(int(v) % p)
        return B, dict(W=W)

    def _finish_initial_state(
        self, B: int, W=None, cols=None, vals=None, narrow=None
    ):
        """Assemble the device state.  When given sparse (cols, vals) input
        columns, the witness panel is built ON DEVICE (zeros + one scatter,
        one jitted program): uploading the dense zero-padded panel cost
        ~0.9 s/solve at B=1024 on the tunneled link — 100x the actual device
        work for gadget circuits.  Fused-eligible batches build the panel
        directly in the witness-major rows layout (see fused_level.py)."""
        nw = self.plan.num_witnesses + 1
        rows_mode = self._fused_eligible(B)
        if narrow is not None:
            vals2d, runs = narrow
            Wd = _build_panel_narrow(
                jnp.asarray(vals2d), runs, nw, rows_mode
            )
        elif W is not None:
            if rows_mode:
                S = B // 128
                Wd = jnp.asarray(
                    np.ascontiguousarray(W.transpose(1, 2, 0)).reshape(
                        nw, NUM_LIMBS, S, 128
                    )
                )
            else:
                Wd = jnp.asarray(W)
        elif cols is not None and cols.size:
            build = _build_panel_rows if rows_mode else _build_panel
            Wd = build(jnp.asarray(cols), jnp.asarray(vals), nw)
        elif rows_mode:
            Wd = jnp.zeros(
                (nw, NUM_LIMBS, B // 128, 128), dtype=jnp.uint32
            )
        else:
            Wd = jnp.zeros((B, nw, NUM_LIMBS), dtype=jnp.uint32)
        ok = jnp.ones((B,), dtype=bool)
        fail = jnp.full((B,), FAIL_NONE, dtype=jnp.int32)
        mem = {
            str(block_id): jnp.zeros((B, size, NUM_LIMBS), dtype=jnp.uint32)
            for block_id, size in self.plan.memory_block_sizes.items()
        }
        state = (Wd, ok, fail, mem)
        if self.mesh is not None:
            from ..parallel import shard_state

            state = shard_state(state, self.mesh)
        return state

    def max_batch_per_pass(self) -> int:
        """Largest instance count whose witness panel fits the per-pass HBM
        budget (ACVM_TPU_HBM_BUDGET_GB, default 10 — leaves room for kernel
        scratch, descriptors and donation slack on a 16 GB chip).  The
        north-star 10k-instance batches exceed any single panel for 2^16-gate
        circuits; :meth:`solve` streams them through passes of this size."""
        import os

        env = os.environ.get("ACVM_TPU_MAX_BATCH_PER_PASS")
        if env:
            return int(env)
        budget = float(os.environ.get("ACVM_TPU_HBM_BUDGET_GB", "10"))
        bytes_per_instance = (
            (self.plan.num_witnesses + 1) * NUM_LIMBS * 4
            + sum(
                size * NUM_LIMBS * 4
                for size in self.plan.memory_block_sizes.values()
            )
        )
        limit = int(budget * (1 << 30) / max(1, bytes_per_instance))
        # Round to the fused kernel's batch granule when possible.
        if limit >= 2048:
            limit -= limit % 1024
        return max(1, limit)

    @staticmethod
    def _batch_len(input_values) -> int:
        if isinstance(input_values, tuple) and len(input_values) == 2:
            return int(input_values[1].shape[0])
        if isinstance(input_values, dict):
            if not input_values:
                return 0
            return len(next(iter(input_values.values())))
        return len(input_values)

    @staticmethod
    def _slice_inputs(input_values, lo: int, hi: int):
        if isinstance(input_values, tuple) and len(input_values) == 2:
            return (input_values[0], input_values[1][lo:hi])
        if isinstance(input_values, dict):
            return {w: a[lo:hi] for w, a in input_values.items()}
        return input_values[lo:hi]

    def solve_chunks(self, input_values, chunk: Optional[int] = None,
                     stats=None):
        """Stream a large batch through HBM-sized passes: yields one
        :class:`BatchResult` per chunk.  Consumers that need full witness
        panels read each chunk before the next is produced (two panels never
        coexist on device).  Instances are independent, so chunking is
        bit-equivalent to one giant pass — the 10k-instance north star on a
        single chip (multi-chip setups shard the batch axis over the mesh
        instead; see `parallel`)."""
        B = self._batch_len(input_values)
        chunk = chunk or self.max_batch_per_pass()
        for lo in range(0, B, chunk):
            yield self.solve(
                self._slice_inputs(input_values, lo, min(lo + chunk, B)),
                stats=stats,
            )

    def solve(self, input_values, stats=None):
        """Solve a batch.  ``input_values`` is either a sequence of
        per-instance ``{witness_index: int}`` dicts, or the columnar form
        ``{witness_index: (B,) array}`` (see :meth:`initial_state`).

        Batches larger than :meth:`max_batch_per_pass` are solved in
        streamed passes; the returned result then carries per-instance
        ok/fail for the whole batch but no witness panel (use
        :meth:`solve_chunks` to consume per-chunk panels)."""
        from ..utils.profiling import Timer

        B = self._batch_len(input_values)
        limit = self.max_batch_per_pass()
        if B > limit:
            return self._solve_streamed(input_values, B, limit, stats)

        if stats is not None:
            stats.batch = B
            stats.total_ops = self.plan.total_ops()
        with Timer() as t_pack:
            W, ok, fail, mem = self.initial_state(input_values)
        if stats is not None:
            stats.pack_seconds += t_pack.elapsed
        W, ok, fail = self._dispatch_segments((W, ok, fail, mem), stats)
        # ok/fail are tiny (B,) arrays: materialize them now so the solve is
        # synced (and errors surface here); the big W panel stays on device
        # until a caller actually reads witnesses (lazy BatchResult.W).
        return BatchResult(self, W, _to_host_np(ok), _to_host_np(fail))

    def _dispatch_segments(self, state, stats=None):
        """Run every segment over a device state, returning (W, ok, fail).
        Dispatch is ASYNC: nothing blocks on the device unless per-segment
        timing was requested (stats) or a host stage must read witnesses —
        callers sync via their own readback (ok flags / witness reads)."""
        from ..utils.profiling import Timer

        W, ok, fail, mem = state
        for i, segment in enumerate(self.segments):
            if segment.levels:
                with Timer() as t_seg:
                    W, ok, fail, mem = self._segment_fn_donated(i)(
                        W, ok, fail, mem
                    )
                    if stats is not None:
                        W.block_until_ready()
                if stats is not None:
                    stats.segment_seconds.append(t_seg.elapsed)
                    self._log.debug(
                        "segment %d: %d levels in %.3fs", i,
                        len(segment.levels), t_seg.elapsed,
                    )
            if segment.host_stages:
                with Timer() as t_host:
                    W, ok, fail = self._run_host_stages(
                        W, ok, fail, segment.host_stages
                    )
                self._log.debug(
                    "segment %d: %d host stages in %.3fs", i,
                    len(segment.host_stages), t_host.elapsed,
                )
                if stats is not None:
                    stats.host_stage_seconds.append(t_host.elapsed)
        return W, ok, fail

    def _solve_streamed(self, input_values, B: int, limit: int, stats):
        """Aggregate streaming solve for B > max_batch_per_pass (the
        BASELINE.json north-star 10k-instance shape): chunk k+1's HOST packing
        runs on a prefetch thread while chunk k solves on device, and chunk
        k's ok/fail readback happens only after chunk k+1's device work is
        enqueued — the device never idles on host packing or flag readbacks.
        One witness panel is live at a time (each chunk's panel is donated
        through its segment chain and dropped before the next chunk's device
        build runs), so chunks use the full HBM budget."""
        from concurrent.futures import ThreadPoolExecutor

        from ..utils.profiling import Timer

        if stats is not None:
            stats.total_ops = self.plan.total_ops()
        oks, fails = [], []
        inflight = None  # (ok, fail) of the chunk currently on device
        with ThreadPoolExecutor(max_workers=1) as pool:
            bounds = [(lo, min(lo + limit, B)) for lo in range(0, B, limit)]
            n = len(bounds)
            pack_futs: dict = {}

            def ensure_pack(k: int) -> None:
                if k < n and k not in pack_futs:
                    pack_futs[k] = pool.submit(
                        self._pack_host,
                        self._slice_inputs(input_values, *bounds[k]),
                    )

            def stage(k: int):
                """Wait for chunk k's host pack, kick off chunk k+1's pack,
                and START the host->device upload of chunk k's input arrays
                (jax.device_put is async, so when this runs right after
                chunk k-1's segments are enqueued, the transfer rides behind
                that compute instead of serializing in front of chunk k's —
                the upload was the dominant per-chunk dead time)."""
                Bk, kwargs = pack_futs.pop(k).result()
                ensure_pack(k + 1)
                if self.mesh is None:
                    # Only arrays _finish_initial_state consumes as-is may
                    # pre-upload (the dense-W path transposes on the host).
                    if isinstance(kwargs.get("vals"), np.ndarray):
                        kwargs = dict(
                            kwargs, vals=jax.device_put(kwargs["vals"])
                        )
                    if "narrow" in kwargs:
                        v2d, runs = kwargs["narrow"]
                        if isinstance(v2d, np.ndarray):
                            kwargs = dict(
                                kwargs,
                                narrow=(jax.device_put(v2d), runs),
                            )
                return Bk, kwargs

            ensure_pack(0)
            with Timer() as t_pack0:
                staged = stage(0)
            if stats is not None:
                stats.pack_seconds += t_pack0.elapsed
            for k, (lo, hi) in enumerate(bounds):
                Bk, kwargs = staged
                state = self._finish_initial_state(Bk, **kwargs)
                W, ok, fail = self._dispatch_segments(state, stats)
                del state, W  # panel freed once the last segment consumes it
                if k + 1 < n:
                    with Timer() as t_pack:
                        staged = stage(k + 1)
                    if stats is not None:
                        stats.pack_seconds += t_pack.elapsed
                if inflight is not None:
                    # Drain the PREVIOUS chunk's flags now that this chunk's
                    # device work is enqueued behind it.
                    oks.append(_to_host_np(inflight[0]))
                    fails.append(_to_host_np(inflight[1]))
                inflight = (ok, fail)
            oks.append(_to_host_np(inflight[0]))
            fails.append(_to_host_np(inflight[1]))
        if stats is not None:
            stats.batch = B
        return BatchResult(
            self, None, np.concatenate(oks), np.concatenate(fails)
        )


class BatchResult:
    """Solve result.  The witness panel stays on device until first use:
    ``.W`` / ``.ok`` / ``.fail`` materialize host copies lazily, so callers
    that only check flags (or read a few witnesses) never pay a full-panel
    device->host transfer — on gadget circuits that readback dominated the
    whole solve (hundreds of MB through the device link)."""

    def __init__(
        self,
        solver: BatchSolver,
        W,
        ok,
        fail=None,
    ):
        self.solver = solver
        self._W = W
        self._ok = ok
        # First failing opcode index per instance (FAIL_NONE when satisfied).
        self._fail = fail

    def release(self) -> None:
        """Free the witness panel (device or host).  Streamed consumers call
        this between chunks so two HBM-sized panels never coexist."""
        self._W = None

    @property
    def W(self) -> np.ndarray:
        """Host copy in the batch-major (B, num_w, L) layout (rows-layout
        panels are converted on the host)."""
        if self._W is None:
            raise RuntimeError(
                "witness panel not retained (chunked solve aggregates only "
                "ok/fail; use solve_chunks to consume per-chunk panels)"
            )
        if not isinstance(self._W, np.ndarray):
            self._W = _to_host_np(self._W)
        if self._W.ndim == 4:
            NW, L_, S, lanes = self._W.shape
            self._W = np.ascontiguousarray(
                self._W.reshape(NW, L_, S * lanes).transpose(2, 0, 1)
            )
        return self._W

    @property
    def ok(self) -> np.ndarray:
        if not isinstance(self._ok, np.ndarray):
            self._ok = _to_host_np(self._ok)
        return self._ok

    @property
    def fail(self) -> np.ndarray:
        if self._fail is None:
            self._fail = np.where(self.ok, FAIL_NONE, 0).astype(np.int32)
        elif not isinstance(self._fail, np.ndarray):
            self._fail = _to_host_np(self._fail)
        return self._fail

    def error_location(self, instance: int):
        """OpcodeLocation of the first failing opcode for one instance, or
        None if it solved — mirrors the reference's located errors
        (acvm/src/pwg/mod.rs:282-299)."""
        from ..acir.circuit import OpcodeLocation

        index = int(self.fail[instance])
        if index == int(FAIL_NONE):
            return None
        return OpcodeLocation.acir(index)

    def error_message(self, instance: int) -> Optional[str]:
        """Circuit-embedded assert message for the failing opcode, if any."""
        location = self.error_location(instance)
        if location is None:
            return None
        return self.solver.plan.circuit.get_assert_message(location)

    def witness_ints(self, witness_index: int) -> List[int]:
        # Rows-layout device panel: read ONE witness row (64 KB at B=1024)
        # instead of materializing the whole panel on the host.
        if (
            self._W is not None
            and not isinstance(self._W, np.ndarray)
            and self._W.ndim == 4
        ):
            row = np.asarray(self._W[witness_index])  # (L, S, 128)
            col = row.reshape(NUM_LIMBS, -1).astype(object)  # (L, B)
            acc = np.zeros((col.shape[1],), dtype=object)
            for li in range(NUM_LIMBS):
                acc += col[li] << (LIMB_BITS * li)
            return [int(v) for v in acc]
        col = self.W[:, witness_index].astype(object)
        acc = np.zeros((self.W.shape[0],), dtype=object)
        for li in range(NUM_LIMBS):
            acc += col[:, li] << (LIMB_BITS * li)
        return [int(v) for v in acc]

    def witness_maps(self) -> List[WitnessMap]:
        """Full per-instance witness maps (for conformance checks)."""
        out = []
        B = self.W.shape[0]
        num_real = self.solver.plan.num_witnesses  # exclude the scratch column
        acc = np.zeros((B, num_real), dtype=object)
        for li in range(NUM_LIMBS):
            acc += self.W[:, :num_real, li].astype(object) << (LIMB_BITS * li)
        for b in range(B):
            wm = WitnessMap()
            for w in range(num_real):
                wm.insert(Witness(w), FieldElement(int(acc[b, w])))
            out.append(wm)
        return out
