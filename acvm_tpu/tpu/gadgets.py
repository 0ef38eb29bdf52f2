"""Batched hash gadget kernels: SHA-256, BLAKE2s, Keccak-256 on u32 lanes.

These replace the reference's RustCrypto digest calls
(``acvm/src/pwg/blackbox/hash.rs`` + ``blackbox_solver/src/lib.rs:47-99``) on
the batched path: message bytes are gathered from the witness tensor with a
static byte-layout plan (the ``fetch_nearest_bytes`` truncation is resolved at
plan time), the whole digest runs as unrolled vector ops over the instance
batch, and the 32 digest bytes scatter back into the witness tensor.

Everything is uint32; 64-bit Keccak lanes are (lo, hi) u32 pairs since TPUs
have no native 64-bit integer path.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
_M32 = jnp.uint32(0xFFFFFFFF)


def _rotr32(x, n):
    n %= 32
    if n == 0:
        return x
    return ((x >> n) | (x << (32 - n))) & _M32


def _rotl32(x, n):
    return _rotr32(x, 32 - (n % 32))


# ---------------------------------------------------------------------------
# SHA-256
# ---------------------------------------------------------------------------

_SHA_INIT = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19], dtype=np.uint32,
)
_SHA_K = np.array(
    [0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
     0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
     0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
     0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
     0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
     0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
     0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
     0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
     0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
     0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
     0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2], dtype=np.uint32,
)


def _sha256_pad_static(msg_len: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """Static padding plan: returns (tail bytes, bit-length bytes, num blocks)."""
    bit_len = msg_len * 8
    pad_len = (55 - msg_len) % 64
    tail = np.concatenate(
        [np.array([0x80], dtype=np.uint8), np.zeros(pad_len, dtype=np.uint8)]
    )
    length_bytes = np.frombuffer(
        int(bit_len).to_bytes(8, "big"), dtype=np.uint8
    ).copy()
    total = msg_len + len(tail) + 8
    assert total % 64 == 0
    return tail, length_bytes, total // 64


def sha256_digest(message: jnp.ndarray) -> jnp.ndarray:
    """SHA-256 of a (B, M) uint32 byte matrix -> (B, 32) uint32 bytes."""
    B, M = message.shape
    tail, length_bytes, num_blocks = _sha256_pad_static(M)
    suffix = jnp.broadcast_to(
        jnp.asarray(
            np.concatenate([tail, length_bytes]).astype(np.uint32)
        )[None],
        (B, len(tail) + 8),
    )
    padded = jnp.concatenate([message.astype(U32), suffix], axis=1)
    # bytes -> big-endian u32 words: (B, num_blocks, 16)
    words = padded.reshape(B, num_blocks, 16, 4)
    w_be = (
        (words[..., 0] << 24)
        | (words[..., 1] << 16)
        | (words[..., 2] << 8)
        | words[..., 3]
    )

    state = [jnp.broadcast_to(jnp.uint32(v), (B,)) for v in _SHA_INIT]
    for blk in range(num_blocks):
        w = [w_be[:, blk, t] for t in range(16)]
        for t in range(16, 64):
            s0 = _rotr32(w[t - 15], 7) ^ _rotr32(w[t - 15], 18) ^ (w[t - 15] >> 3)
            s1 = _rotr32(w[t - 2], 17) ^ _rotr32(w[t - 2], 19) ^ (w[t - 2] >> 10)
            w.append((w[t - 16] + s0 + w[t - 7] + s1) & _M32)
        a, b, c, d, e, f, g, h = state
        for t in range(64):
            S1 = _rotr32(e, 6) ^ _rotr32(e, 11) ^ _rotr32(e, 25)
            ch = (e & f) ^ (~e & g)
            temp1 = (h + S1 + ch + jnp.uint32(_SHA_K[t]) + w[t]) & _M32
            S0 = _rotr32(a, 2) ^ _rotr32(a, 13) ^ _rotr32(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            temp2 = (S0 + maj) & _M32
            h, g, f = g, f, e
            e = (d + temp1) & _M32
            d, c, b = c, b, a
            a = (temp1 + temp2) & _M32
        state = [
            (s + v) & _M32
            for s, v in zip(state, (a, b, c, d, e, f, g, h))
        ]

    out = []
    for s in state:
        out.extend([(s >> 24) & 0xFF, (s >> 16) & 0xFF, (s >> 8) & 0xFF, s & 0xFF])
    return jnp.stack(out, axis=1)


# ---------------------------------------------------------------------------
# BLAKE2s (256-bit, no key)
# ---------------------------------------------------------------------------

_B2S_IV = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19], dtype=np.uint32,
)
_B2S_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]


def _b2s_g(v, a, b, c, d, x, y):
    v[a] = (v[a] + v[b] + x) & _M32
    v[d] = _rotr32(v[d] ^ v[a], 16)
    v[c] = (v[c] + v[d]) & _M32
    v[b] = _rotr32(v[b] ^ v[c], 12)
    v[a] = (v[a] + v[b] + y) & _M32
    v[d] = _rotr32(v[d] ^ v[a], 8)
    v[c] = (v[c] + v[d]) & _M32
    v[b] = _rotr32(v[b] ^ v[c], 7)


def blake2s_digest(message: jnp.ndarray) -> jnp.ndarray:
    """BLAKE2s-256 of a (B, M) uint32 byte matrix -> (B, 32) uint32 bytes."""
    B, M = message.shape
    h = [jnp.broadcast_to(jnp.uint32(v), (B,)) for v in _B2S_IV]
    h[0] = h[0] ^ jnp.uint32(0x01010020)  # depth=1, fanout=1, digest 32 bytes

    num_blocks = max(1, (M + 63) // 64)
    padded_len = num_blocks * 64
    pad = jnp.zeros((B, padded_len - M), dtype=U32)
    padded = jnp.concatenate([message.astype(U32), pad], axis=1)
    words = padded.reshape(B, num_blocks, 16, 4)
    m_le = (
        words[..., 0]
        | (words[..., 1] << 8)
        | (words[..., 2] << 16)
        | (words[..., 3] << 24)
    )

    for blk in range(num_blocks):
        is_last = blk == num_blocks - 1
        t = min((blk + 1) * 64, M)
        m = [m_le[:, blk, i] for i in range(16)]
        v = list(h) + [jnp.broadcast_to(jnp.uint32(x), (B,)) for x in _B2S_IV]
        v[12] = v[12] ^ jnp.uint32(t & 0xFFFFFFFF)
        v[13] = v[13] ^ jnp.uint32(t >> 32)
        if is_last:
            v[14] = v[14] ^ _M32
        for r in range(10):
            s = _B2S_SIGMA[r]
            _b2s_g(v, 0, 4, 8, 12, m[s[0]], m[s[1]])
            _b2s_g(v, 1, 5, 9, 13, m[s[2]], m[s[3]])
            _b2s_g(v, 2, 6, 10, 14, m[s[4]], m[s[5]])
            _b2s_g(v, 3, 7, 11, 15, m[s[6]], m[s[7]])
            _b2s_g(v, 0, 5, 10, 15, m[s[8]], m[s[9]])
            _b2s_g(v, 1, 6, 11, 12, m[s[10]], m[s[11]])
            _b2s_g(v, 2, 7, 8, 13, m[s[12]], m[s[13]])
            _b2s_g(v, 3, 4, 9, 14, m[s[14]], m[s[15]])
        h = [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]

    out = []
    for s in h:
        out.extend([s & 0xFF, (s >> 8) & 0xFF, (s >> 16) & 0xFF, (s >> 24) & 0xFF])
    return jnp.stack(out, axis=1)


# ---------------------------------------------------------------------------
# Keccak-256 (64-bit lanes as (lo, hi) u32 pairs)
# ---------------------------------------------------------------------------

_KECCAK_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_KECCAK_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rotl64(lane, n):
    lo, hi = lane
    n %= 64
    if n == 0:
        return lo, hi
    if n == 32:
        return hi, lo
    if n < 32:
        new_lo = ((lo << n) & _M32) | (hi >> (32 - n))
        new_hi = ((hi << n) & _M32) | (lo >> (32 - n))
        return new_lo, new_hi
    n -= 32
    new_lo = ((hi << n) & _M32) | (lo >> (32 - n))
    new_hi = ((lo << n) & _M32) | (hi >> (32 - n))
    return new_lo, new_hi


def _xor64(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def keccak_f1600_batched(state):
    """One permutation over a list of 25 (lo, hi) u32-pair lanes."""
    a = list(state)
    for rc in _KECCAK_RC:
        c = [
            _xor64(
                _xor64(_xor64(a[x], a[x + 5]), _xor64(a[x + 10], a[x + 15])),
                a[x + 20],
            )
            for x in range(5)
        ]
        d = [_xor64(c[(x - 1) % 5], _rotl64(c[(x + 1) % 5], 1)) for x in range(5)]
        a = [_xor64(a[i], d[i % 5]) for i in range(25)]
        b = [None] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl64(
                    a[x + 5 * y], _KECCAK_ROT[x][y]
                )
        a = [
            (
                b[i][0] ^ ((~b[(i + 1) % 5 + 5 * (i // 5)][0]) & b[(i + 2) % 5 + 5 * (i // 5)][0]),
                b[i][1] ^ ((~b[(i + 1) % 5 + 5 * (i // 5)][1]) & b[(i + 2) % 5 + 5 * (i // 5)][1]),
            )
            for i in range(25)
        ]
        a[0] = (a[0][0] ^ jnp.uint32(rc & 0xFFFFFFFF), a[0][1] ^ jnp.uint32(rc >> 32))
    return a


def keccak256_digest(message: jnp.ndarray) -> jnp.ndarray:
    """Keccak-256 of a (B, M) uint32 byte matrix -> (B, 32) uint32 bytes."""
    B, M = message.shape
    rate = 136
    pad_len = rate - (M % rate)
    pad = np.zeros(pad_len, dtype=np.uint8)
    pad[0] |= 0x01
    pad[-1] |= 0x80
    padded = jnp.concatenate(
        [
            message.astype(U32),
            jnp.broadcast_to(jnp.asarray(pad.astype(np.uint32))[None], (B, pad_len)),
        ],
        axis=1,
    )
    num_blocks = padded.shape[1] // rate

    zero = jnp.zeros((B,), dtype=U32)
    state = [(zero, zero) for _ in range(25)]
    for blk in range(num_blocks):
        block = padded[:, blk * rate : (blk + 1) * rate]
        for lane in range(rate // 8):
            lane_bytes = block[:, lane * 8 : lane * 8 + 8]
            lo = (
                lane_bytes[:, 0]
                | (lane_bytes[:, 1] << 8)
                | (lane_bytes[:, 2] << 16)
                | (lane_bytes[:, 3] << 24)
            )
            hi = (
                lane_bytes[:, 4]
                | (lane_bytes[:, 5] << 8)
                | (lane_bytes[:, 6] << 16)
                | (lane_bytes[:, 7] << 24)
            )
            state[lane] = _xor64(state[lane], (lo, hi))
        state = keccak_f1600_batched(state)

    out = []
    for lane in range(4):
        lo, hi = state[lane]
        for w in (lo, hi):
            out.extend(
                [w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF, (w >> 24) & 0xFF]
            )
    return jnp.stack(out, axis=1)


def keccak256_var_digest(message: jnp.ndarray, length: jnp.ndarray):
    """Keccak-256 over per-instance message prefixes.

    message: (B, M) uint32 bytes (the maximum-length message);
    length:  (B,) uint32 — how many leading bytes each instance hashes
             (callers validate length <= M).
    Returns (B, 32) uint32 digest bytes.

    Dynamic padding is branchless: bytes at index >= length are zeroed, the
    0x01 domain byte XORs in at index == length, the 0x80 terminator at the
    end of each instance's final rate block, and the permutation for block k
    only commits where k < num_blocks(length).
    """
    B, M = message.shape
    rate = 136
    max_blocks = M // rate + 1
    total = max_blocks * rate

    padded = jnp.zeros((B, total), dtype=U32)
    if M:
        idx = jnp.arange(M, dtype=jnp.uint32)[None]
        keep = idx < length[:, None]
        padded = padded.at[:, :M].set(jnp.where(keep, message.astype(U32), 0))

    positions = jnp.arange(total, dtype=jnp.uint32)[None]
    padded = padded ^ jnp.where(positions == length[:, None], jnp.uint32(0x01), 0)
    num_blocks = length // rate + 1  # (B,)
    last_byte = num_blocks * rate - 1
    padded = padded ^ jnp.where(positions == last_byte[:, None], jnp.uint32(0x80), 0)

    zero = jnp.zeros((B,), dtype=U32)
    state = [(zero, zero) for _ in range(25)]
    for blk in range(max_blocks):
        active = (blk < num_blocks).astype(U32)  # (B,)
        block = padded[:, blk * rate : (blk + 1) * rate]
        absorbed = list(state)
        for lane in range(rate // 8):
            lane_bytes = block[:, lane * 8 : lane * 8 + 8]
            lo = (
                lane_bytes[:, 0]
                | (lane_bytes[:, 1] << 8)
                | (lane_bytes[:, 2] << 16)
                | (lane_bytes[:, 3] << 24)
            )
            hi = (
                lane_bytes[:, 4]
                | (lane_bytes[:, 5] << 8)
                | (lane_bytes[:, 6] << 16)
                | (lane_bytes[:, 7] << 24)
            )
            absorbed[lane] = _xor64(absorbed[lane], (lo * active, hi * active))
        permuted = keccak_f1600_batched(absorbed)
        state = [
            (
                jnp.where(active == 1, p[0], s[0]),
                jnp.where(active == 1, p[1], s[1]),
            )
            for p, s in zip(permuted, state)
        ]

    out = []
    for lane in range(4):
        lo, hi = state[lane]
        for w in (lo, hi):
            out.extend(
                [w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF, (w >> 24) & 0xFF]
            )
    return jnp.stack(out, axis=1)
