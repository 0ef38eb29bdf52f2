"""Batched Grumpkin elliptic-curve kernels on limb arrays.

Device-side replacement for the reference's barretenberg EC gadgets
(``barretenberg_blackbox_solver/src/wasm/{scalar_mul,pedersen}.rs``): Jacobian
points over the BN254-Fr limb field (`acvm_tpu.fields.jnp_ops`), branchless
complete addition via selects, and windowed fixed-base multiplication driven by
``lax.scan`` over host-precomputed tables.  All coordinates are in Montgomery
form; the point at infinity is encoded as Z == 0.

A point batch is a (X, Y, Z) triple of (..., NUM_LIMBS) uint32 arrays.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..blackbox.ec import grumpkin
from ..fields.jnp_ops import LimbContext
from ..fields.limbs import int_to_limbs, ints_to_limbs
from ..fields.params import BN254_FR, LIMB_BITS, NUM_LIMBS

WINDOW_BITS = 4
NUM_WINDOWS = 64  # 256 bits / 4


def _mont(ctx: LimbContext, value: int) -> np.ndarray:
    return np.asarray(
        int_to_limbs((value * ctx.params.r) % ctx.params.modulus), dtype=np.uint32
    )


def pt_infinity(ctx: LimbContext, shape) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    zeros = jnp.zeros(tuple(shape) + (NUM_LIMBS,), dtype=jnp.uint32)
    return zeros, zeros, zeros


def pt_is_inf(p) -> jnp.ndarray:
    return jnp.all(p[2] == 0, axis=-1)


def pt_double(ctx: LimbContext, p, a_mont=None):
    """Jacobian doubling: dbl-2009-l for a = 0 (grumpkin/secp256k1), or
    dbl-2007-bl with the ``a * Z^4`` term for general short-Weierstrass curves
    (secp256r1's a = -3).  ``a_mont`` is the curve coefficient in Montgomery
    limb form."""
    if a_mont is not None:
        x, y, z = p
        XX = ctx.mont_mul(x, x)
        YY = ctx.mont_mul(y, y)
        YYYY = ctx.mont_mul(YY, YY)
        ZZ = ctx.mont_mul(z, z)
        t = ctx.add(x, YY)
        t = ctx.mont_mul(t, t)
        S = ctx.sub(ctx.sub(t, XX), YYYY)
        S = ctx.add(S, S)
        M = ctx.add(ctx.add(XX, XX), XX)
        M = ctx.add(M, ctx.mont_mul(a_mont, ctx.mont_mul(ZZ, ZZ)))
        x3 = ctx.sub(ctx.mont_mul(M, M), ctx.add(S, S))
        Y8 = ctx.add(YYYY, YYYY)
        Y8 = ctx.add(Y8, Y8)
        Y8 = ctx.add(Y8, Y8)
        y3 = ctx.sub(ctx.mont_mul(M, ctx.sub(S, x3)), Y8)
        zy = ctx.add(y, z)
        zy = ctx.mont_mul(zy, zy)
        z3 = ctx.sub(ctx.sub(zy, YY), ZZ)
        return x3, y3, z3
    x, y, z = p
    A = ctx.mont_mul(x, x)
    B = ctx.mont_mul(y, y)
    C = ctx.mont_mul(B, B)
    t = ctx.add(x, B)
    t = ctx.mont_mul(t, t)
    D = ctx.sub(ctx.sub(t, A), C)
    D = ctx.add(D, D)
    E = ctx.add(ctx.add(A, A), A)
    F = ctx.mont_mul(E, E)
    x3 = ctx.sub(F, ctx.add(D, D))
    C8 = ctx.add(C, C)
    C8 = ctx.add(C8, C8)
    C8 = ctx.add(C8, C8)
    y3 = ctx.sub(ctx.mont_mul(E, ctx.sub(D, x3)), C8)
    z3 = ctx.mont_mul(y, z)
    z3 = ctx.add(z3, z3)
    return x3, y3, z3


def pt_add(ctx: LimbContext, p, q, a_mont=None):
    """Branchless complete addition (add-2007-bl with select fallbacks)."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    Z1Z1 = ctx.mont_mul(z1, z1)
    Z2Z2 = ctx.mont_mul(z2, z2)
    U1 = ctx.mont_mul(x1, Z2Z2)
    U2 = ctx.mont_mul(x2, Z1Z1)
    S1 = ctx.mont_mul(ctx.mont_mul(y1, z2), Z2Z2)
    S2 = ctx.mont_mul(ctx.mont_mul(y2, z1), Z1Z1)
    H = ctx.sub(U2, U1)
    Rr = ctx.sub(S2, S1)

    I = ctx.add(H, H)
    I = ctx.mont_mul(I, I)
    J = ctx.mont_mul(H, I)
    r2 = ctx.add(Rr, Rr)
    V = ctx.mont_mul(U1, I)
    x3 = ctx.sub(ctx.sub(ctx.mont_mul(r2, r2), J), ctx.add(V, V))
    S1J = ctx.mont_mul(S1, J)
    y3 = ctx.sub(ctx.mont_mul(r2, ctx.sub(V, x3)), ctx.add(S1J, S1J))
    zz = ctx.add(z1, z2)
    zz = ctx.mont_mul(zz, zz)
    z3 = ctx.mont_mul(ctx.sub(ctx.sub(zz, Z1Z1), Z2Z2), H)

    dx, dy, dz = pt_double(ctx, p, a_mont)

    h_zero = ctx.is_zero(H)[..., None]
    r_zero = ctx.is_zero(Rr)[..., None]
    p_inf = pt_is_inf(p)[..., None]
    q_inf = pt_is_inf(q)[..., None]

    # same x: either doubling (same y) or infinity (negatives)
    x3 = jnp.where(h_zero & r_zero, dx, x3)
    y3 = jnp.where(h_zero & r_zero, dy, y3)
    z3 = jnp.where(h_zero & r_zero, dz, z3)
    z3 = jnp.where(h_zero & ~r_zero, 0, z3)
    # identities
    x3 = jnp.where(q_inf, x1, jnp.where(p_inf, x2, x3))
    y3 = jnp.where(q_inf, y1, jnp.where(p_inf, y2, y3))
    z3 = jnp.where(q_inf, z1, jnp.where(p_inf, z2, z3))
    return x3, y3, z3


def pt_to_affine(ctx: LimbContext, p):
    """Returns standard-form affine (x, y); infinity maps to (0, 0)."""
    x, y, z = p
    zinv = ctx.mont_inv_grouped(z)  # zero stays zero at infinity
    zinv2 = ctx.mont_mul(zinv, zinv)
    zinv3 = ctx.mont_mul(zinv2, zinv)
    ax = ctx.from_mont(ctx.mont_mul(x, zinv2))
    ay = ctx.from_mont(ctx.mont_mul(y, zinv3))
    inf = pt_is_inf(p)[..., None]
    return jnp.where(inf, 0, ax), jnp.where(inf, 0, ay)


# ---------------------------------------------------------------------------
# Windowed fixed-base multiplication
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _window_table_np(base_point: Tuple[int, int], windows: int = NUM_WINDOWS) -> np.ndarray:
    """(windows, 2^WINDOW_BITS, 3, NUM_LIMBS) Montgomery-form jacobian
    multiples: table[w][d] = d * 2^(4w) * base.  d = 0 is the infinity entry
    (all zeros).  A truncated table (windows < NUM_WINDOWS) supports scalars
    < 2^(4*windows) only — tests and the multichip dryrun use short tables to
    keep host precompute and CPU-mesh compile cost down."""
    ctx = LimbContext(BN254_FR)
    from .. import native

    table = np.zeros(
        (windows, 1 << WINDOW_BITS, 3, NUM_LIMBS), dtype=np.uint32
    )
    use_native = native.available()
    window_base = base_point
    for w in range(windows):
        acc = None
        for d in range(1, 1 << WINDOW_BITS):
            if use_native:
                acc = native.grumpkin_add(acc, window_base)
            else:
                acc = grumpkin.add(acc, window_base)
            if acc is not None:
                table[w, d, 0] = _mont(ctx, acc[0])
                table[w, d, 1] = _mont(ctx, acc[1])
                table[w, d, 2] = _mont(ctx, 1)
        # next window base: 2^4 * current
        for _ in range(WINDOW_BITS):
            if use_native:
                window_base = native.grumpkin_add(window_base, window_base)
            else:
                window_base = grumpkin.add(window_base, window_base)
    return table


def window_table(base_point: Tuple[int, int], windows: int = NUM_WINDOWS) -> jnp.ndarray:
    return jnp.asarray(_window_table_np(tuple(base_point), windows))


def _window_digits(scalar_limbs: jnp.ndarray) -> jnp.ndarray:
    """(.., NUM_LIMBS) standard-form scalar -> (.., NUM_WINDOWS) 4-bit digits."""
    # Each 16-bit limb holds 4 windows.
    parts = [
        (scalar_limbs >> (WINDOW_BITS * k)) & ((1 << WINDOW_BITS) - 1)
        for k in range(LIMB_BITS // WINDOW_BITS)
    ]
    stacked = jnp.stack(parts, axis=-1)  # (.., L, 4)
    return stacked.reshape(scalar_limbs.shape[:-1] + (NUM_WINDOWS,))


def _tree_reduce_points(ctx, X, Y, Z, a_mont=None):
    """Pairwise tree reduction of a (B, N, L) jacobian point panel over its
    N axis -> (B, L) point.

    Shape-invariant formulation: each round adds even/odd pairs over a FIXED
    (B, N/2, L) panel inside ``lax.fori_loop``, writing the results back to
    the front and parking infinity (Z = 0) in the tail — active entries stay
    contiguous and halve per round, and inf+inf pairs are no-ops of the
    complete-add law.  This keeps exactly ONE pt_add in the compiled graph:
    the naive shrinking-shape tree inlined log2(N) differently-shaped
    pt_adds and took ~7 minutes of XLA compile per call site on the remote
    compile service (round-5 measurement: 429 s for a 3-round tree), while
    each round still runs as one wide vector op over B * N/2 points — the
    TPU-friendly alternative to a 64-step sequential window scan.  EC
    addition is associative, so the result is the same group element
    bit-for-bit after affine normalization."""
    n = X.shape[-2]
    if n == 1:
        return X[..., 0, :], Y[..., 0, :], Z[..., 0, :]
    import os

    if (
        a_mont is None
        and X.ndim == 3
        and X.shape[0] % 1024 == 0
        and not ctx.wide
        and not os.environ.get("ACVM_TPU_NO_PALLAS")
        and jax.default_backend() == "tpu"
    ):
        # Fused-kernel tree (ec_pallas): the whole complete-add formula in
        # one Pallas program per round, shrinking panels (no parked-infinity
        # lanes).  a = 0 curves only; the jnp tree below stays the fallback
        # for small batches, wide fields, CPU, and a != 0.
        from .ec_pallas import tree_reduce_fused

        return tree_reduce_fused(ctx, X, Y, Z)
    if n % 2:
        pad = [(0, 0)] * (X.ndim - 2) + [(0, 1), (0, 0)]
        X, Y, Z = jnp.pad(X, pad), jnp.pad(Y, pad), jnp.pad(Z, pad)
        n += 1
    rounds = (n - 1).bit_length()  # ceil(log2(n))

    def body(_, state):
        X, Y, Z = state
        even = (X[..., 0::2, :], Y[..., 0::2, :], Z[..., 0::2, :])
        odd = (X[..., 1::2, :], Y[..., 1::2, :], Z[..., 1::2, :])
        Xa, Ya, Za = pt_add(ctx, even, odd, a_mont)
        zpad = jnp.zeros_like(Xa)
        return (
            jnp.concatenate([Xa, zpad], axis=-2),
            jnp.concatenate([Ya, zpad], axis=-2),
            jnp.concatenate([Za, zpad], axis=-2),
        )

    X, Y, Z = jax.lax.fori_loop(0, rounds, body, (X, Y, Z))
    return X[..., 0, :], Y[..., 0, :], Z[..., 0, :]


def _gather_window_entries(table: jnp.ndarray, digits: jnp.ndarray):
    """table (W, 16, 3, L) + digits (..., W) -> entry panel (..., W, 3, L)."""
    num_windows = table.shape[0]
    flat = table.reshape(num_windows * (1 << WINDOW_BITS), 3, NUM_LIMBS)
    idx = (
        jnp.arange(num_windows, dtype=digits.dtype) * (1 << WINDOW_BITS)
        + digits
    )
    entries = jnp.take(flat, idx.reshape(-1), axis=0)
    return entries.reshape(digits.shape + (3, NUM_LIMBS))


def fixed_base_mul(
    ctx: LimbContext, table: jnp.ndarray, scalar_limbs: jnp.ndarray, a_mont=None
):
    """scalar * base via the precomputed window table.

    scalar_limbs: (B, NUM_LIMBS) standard form (the scalar's integer bits).
    Returns a Montgomery jacobian point batch.  The per-window table entries
    are gathered in one shot and summed by pairwise tree reduction — the
    round-4 sequential 64-step scan of complete adds left the VPU idle
    (871 Pedersen solves/s); the tree runs log2(W) wide rounds instead.
    """
    digits = _window_digits(scalar_limbs)  # (B, 64)
    # A truncated table (fewer than NUM_WINDOWS windows) restricts the scalar
    # range to 2^(4*windows); callers guarantee the bound.  Tests use short
    # tables to keep compile times down on weak hosts.
    num_windows = table.shape[0]
    digits = digits[..., :num_windows]
    entries = _gather_window_entries(table, digits)  # (B, W, 3, L)
    return _tree_reduce_points(
        ctx,
        entries[..., 0, :],
        entries[..., 1, :],
        entries[..., 2, :],
        a_mont,
    )


def msm_fixed_tables(
    ctx: LimbContext,
    tables: jnp.ndarray,
    scalars: jnp.ndarray,
    a_mont=None,
):
    """Multi-scalar multiplication over fixed bases: sum_i scalars[:, i] *
    base_i, with base_i's window table tables[i] (n, W, 16, 3, L).

    All n * W window entries join ONE tree reduction — a Pedersen commitment
    over n generators is log2(n * W) wide vector rounds total (reference
    semantics: barretenberg pedersen_plookup_commit, wasm/pedersen.rs:13-36).
    scalars: (B, n, L) standard form.  Returns a jacobian point batch.
    """
    n_gen, num_windows = tables.shape[0], tables.shape[1]
    digits = _window_digits(scalars)[..., :num_windows]  # (B, n, W)
    flat_tables = tables.reshape(
        n_gen * num_windows * (1 << WINDOW_BITS), 3, NUM_LIMBS
    )
    base = (
        jnp.arange(n_gen * num_windows, dtype=digits.dtype)
        * (1 << WINDOW_BITS)
    ).reshape(n_gen, num_windows)
    idx = base[None] + digits  # (B, n, W)
    B = scalars.shape[0]
    entries = jnp.take(flat_tables, idx.reshape(B, -1).reshape(-1), axis=0)
    entries = entries.reshape(B, n_gen * num_windows, 3, NUM_LIMBS)
    return _tree_reduce_points(
        ctx,
        entries[..., 0, :],
        entries[..., 1, :],
        entries[..., 2, :],
        a_mont,
    )


def scalar_mul(ctx: LimbContext, point, scalar_limbs: jnp.ndarray, a_mont=None):
    """Generic double-and-add for variable bases (MSB-first scan)."""
    import os

    if (
        a_mont is None
        and scalar_limbs.ndim == 2
        and scalar_limbs.shape[0] % 1024 == 0
        and not ctx.wide
        and not os.environ.get("ACVM_TPU_NO_PALLAS")
        and jax.default_backend() == "tpu"
    ):
        # Fused-kernel ladder (ec_pallas): one Pallas complete-add per
        # double / conditional-add step instead of ~32 dispatch-bound
        # multiplies per scalar bit.
        from .ec_pallas import scalar_mul_fused

        return scalar_mul_fused(ctx, point, scalar_limbs)
    acc = pt_infinity(ctx, scalar_limbs.shape[:-1])
    bit_indices = jnp.arange(NUM_LIMBS * LIMB_BITS - 1, -1, -1)

    def body(acc, i):
        acc = pt_double(ctx, acc, a_mont)
        limb = jnp.take(scalar_limbs, i // LIMB_BITS, axis=-1)
        bit = (limb >> (i % LIMB_BITS)) & 1
        added = pt_add(ctx, acc, point, a_mont)
        sel = (bit == 1)[..., None]
        acc = tuple(
            jnp.where(sel, a, b) for a, b in zip(added, acc)
        )
        return acc, None

    acc, _ = jax.lax.scan(body, acc, bit_indices)
    return acc


# ---------------------------------------------------------------------------
# Sharded MSM: generator/window partial sums over a mesh axis
# ---------------------------------------------------------------------------


def pedersen_msm_sharded(ctx, tables, scalars, mesh, axis_name: str = "model"):
    """Multi-scalar multiplication with the generator axis sharded over a mesh
    axis: each device computes the windowed partial sum for its slice of
    generators, partial points are all-gathered over ICI, and the (tiny)
    point reduction runs replicated.

    This is the "EC window/bucket sums reduced via collectives" pattern from
    BASELINE.json config 4: jacobian points cannot be psum'd (point addition
    is not componentwise), so the collective is an all_gather of 3x16-limb
    partials followed by a log-depth local reduction.

    tables:  (n_gen, NUM_WINDOWS, 2^W, 3, NUM_LIMBS) stacked window tables.
    scalars: (B, n_gen, NUM_LIMBS) standard-form scalars.
    Returns affine (x, y) standard-form arrays of shape (B, NUM_LIMBS).
    """
    import jax
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n_gen = tables.shape[0]
    axis_size = mesh.shape[axis_name]
    assert n_gen % axis_size == 0, (n_gen, axis_size)

    def local_msm(tables_local, scalars_local):
        # tables_local: (n_gen/m, ...), scalars_local: (B, n_gen/m, L).
        # One tree-reduced MSM over the local generators (log-depth pt_add
        # rounds: the body compiles a handful of times no matter how many
        # generators/devices participate — round-2's unrolled version inlined
        # 8 EC additions and blew the CPU-mesh compile budget).
        acc = msm_fixed_tables(ctx, tables_local, scalars_local)
        # Gather everyone's partial jacobian point: (m, B, 3, L) stacked.
        stacked = jnp.stack(acc, axis=-2)  # (B, 3, L)
        gathered = jax.lax.all_gather(stacked, axis_name)  # (m, B, 3, L)

        def red_body(acc, part):  # part: (B, 3, L)
            q = (part[:, 0, :], part[:, 1, :], part[:, 2, :])
            return pt_add(ctx, acc, q), None

        total = pt_infinity(ctx, scalars_local.shape[:1])
        total, _ = jax.lax.scan(red_body, total, gathered)
        return jnp.stack(total, axis=-2)  # (B, 3, L), replicated

    result = shard_map(
        local_msm,
        mesh=mesh,
        in_specs=(P(axis_name), P(None, axis_name)),
        out_specs=P(None),
        check_vma=False,
    )(tables, scalars)

    point = (result[:, 0, :], result[:, 1, :], result[:, 2, :])
    return pt_to_affine(ctx, point)


# ---------------------------------------------------------------------------
# Schnorr verification pipeline (device)
# ---------------------------------------------------------------------------


def bytes_be_to_limbs(bytes_be: jnp.ndarray) -> jnp.ndarray:
    """(B, 32) big-endian bytes -> (B, NUM_LIMBS) little-endian 16-bit limbs."""
    lo = bytes_be[:, 31::-2]  # bytes 31,29,...,1 -> limbs 0..15 low half
    hi = bytes_be[:, 30::-2]
    return (lo | (hi << 8)).astype(jnp.uint32)


def limbs_to_bytes_be(limbs: jnp.ndarray) -> jnp.ndarray:
    """(B, NUM_LIMBS) limbs -> (B, 32) big-endian bytes."""
    hi = (limbs >> 8) & 0xFF  # high byte of each limb
    lo = limbs & 0xFF
    # limb 15 -> bytes 0,1 ... limb 0 -> bytes 30,31
    interleaved = jnp.stack([hi[:, ::-1], lo[:, ::-1]], axis=-1)
    return interleaved.reshape(limbs.shape[0], 32)


def mod_order(limbs: jnp.ndarray, order: int) -> jnp.ndarray:
    """Reduce a full 256-bit value modulo the grumpkin group order via
    conditional subtraction (2^256 < 8*order, so shifts 2,1,0 suffice)."""
    from . import intops

    r = limbs
    for k in (2, 1, 0):
        nk = jnp.asarray(int_to_limbs((order << k) % (1 << 256)), dtype=jnp.uint32)
        if (order << k) >> 256:
            # shifted modulus overflows 256 bits; r < 2^256 is always smaller
            continue
        ge = intops.int_geq(r, nk)
        r = jnp.where(ge[..., None], intops.int_sub(r, nk), r)
    return r


def schnorr_verify_batched(
    ctx: LimbContext,
    pub_x: jnp.ndarray,  # (B, L) standard form
    pub_y: jnp.ndarray,
    sig_bytes: jnp.ndarray,  # (B, 64) uint32 bytes, s || e big-endian
    msg_bytes: jnp.ndarray,  # (B, M) uint32 bytes
    pedersen_tables,  # 3 window tables for generators 0..2 (domain 0)
    generator_table,  # window table for the group generator
) -> jnp.ndarray:
    """Batched analogue of blackbox/grumpkin.py::schnorr_verify -> (B,) bool."""
    from .gadgets import blake2s_digest
    from . import intops

    n_order = grumpkin.params.n

    s = mod_order(bytes_be_to_limbs(sig_bytes[:, :32]), n_order)
    e = mod_order(bytes_be_to_limbs(sig_bytes[:, 32:]), n_order)

    # public key on curve: y^2 == x^3 - 17
    xm = ctx.to_mont(pub_x)
    ym = ctx.to_mont(pub_y)
    y2 = ctx.mont_mul(ym, ym)
    x3 = ctx.mont_mul(ctx.mont_mul(xm, xm), xm)
    seventeen = jnp.asarray(
        int_to_limbs((17 * ctx.params.r) % ctx.params.modulus), dtype=jnp.uint32
    )
    on_curve = ctx.eq(y2, ctx.sub(x3, seventeen))

    s_nonzero = ~intops.is_zero(s)

    # R = s*G + e*P
    sG = fixed_base_mul(ctx, generator_table, s)
    P = (xm, ym, jnp.broadcast_to(jnp.asarray(int_to_limbs(ctx.params.r), jnp.uint32), xm.shape).astype(jnp.uint32))
    eP = scalar_mul(ctx, P, e)
    R = pt_add(ctx, sG, eP)
    r_not_inf = ~pt_is_inf(R)
    rx, _ = pt_to_affine(ctx, R)

    # challenge: blake2s(pedersen_compress(Rx, Px, Py).x_be || msg) mod n
    scalars = jnp.stack([rx, pub_x, pub_y], axis=1)  # (B, 3, L)
    acc = msm_fixed_tables(
        ctx, jnp.stack([jnp.asarray(t) for t in pedersen_tables]), scalars
    )
    cx, _ = pt_to_affine(ctx, acc)

    digest = blake2s_digest(
        jnp.concatenate([limbs_to_bytes_be(cx), msg_bytes.astype(jnp.uint32)], axis=1)
    )
    challenge = mod_order(bytes_be_to_limbs(digest), n_order)

    return on_curve & s_nonzero & r_not_inf & ctx.eq(challenge, e)
