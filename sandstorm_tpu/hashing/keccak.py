"""Vectorized Keccak-256 for device-side Merkle leaf/node hashing.

The reference's EthVerifierClaim hashes every committed row with (masked)
Keccak-256 over Montgomery-form felts (crypto/src/hash/keccak.rs) on the
CPU.  Here Keccak-f[1600] runs over pairs of uint32 lanes (lo, hi per
64-bit lane) with all ops elementwise over the leading batch dims, so whole
commitments hash in a few fused XLA ops; the 24 rounds run under one
lax.scan over the round constants to keep the traced graph small.

This is original Keccak (pad 0x01), matching Ethereum's keccak256 — KAT'd
against the host implementation in crypto/hashes.py.

Messages are [..., W] u32 arrays holding the byte stream as little-endian
words (byte k of the stream lives in word k//4, byte k%4), which is exactly
how Keccak absorbs bytes into its little-endian 64-bit lanes.
"""

import jax
import jax.numpy as jnp

from ..fields.u32 import U32

_RC = (
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
)

# rotation offset for lane (x, y), flat index x + 5*y
_ROT = (
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14,
)

RATE_WORDS = 34  # 136-byte rate of Keccak-256, in u32 words


def _rotl64(lo, hi, r):
    r &= 63
    if r == 0:
        return lo, hi
    if r >= 32:
        lo, hi = hi, lo
        r -= 32
        if r == 0:
            return lo, hi
    return ((lo << r) | (hi >> (32 - r)), (hi << r) | (lo >> (32 - r)))


def _xor5(a, b, c, d, e):
    return a ^ b ^ c ^ d ^ e


def _round(lanes, rc_lo, rc_hi):
    """One Keccak-f round. lanes: [25, 2, ...] (lo=index 0, hi=index 1)."""
    lo = [lanes[i, 0] for i in range(25)]
    hi = [lanes[i, 1] for i in range(25)]

    # theta
    c_lo = [_xor5(*(lo[x + 5 * y] for y in range(5))) for x in range(5)]
    c_hi = [_xor5(*(hi[x + 5 * y] for y in range(5))) for x in range(5)]
    for x in range(5):
        r_lo, r_hi = _rotl64(c_lo[(x + 1) % 5], c_hi[(x + 1) % 5], 1)
        d_lo = c_lo[(x + 4) % 5] ^ r_lo
        d_hi = c_hi[(x + 4) % 5] ^ r_hi
        for y in range(5):
            lo[x + 5 * y] = lo[x + 5 * y] ^ d_lo
            hi[x + 5 * y] = hi[x + 5 * y] ^ d_hi

    # rho + pi
    b_lo = [None] * 25
    b_hi = [None] * 25
    for x in range(5):
        for y in range(5):
            src = x + 5 * y
            dst = y + 5 * ((2 * x + 3 * y) % 5)
            b_lo[dst], b_hi[dst] = _rotl64(lo[src], hi[src], _ROT[src])

    # chi
    for y in range(5):
        for x in range(5):
            i = x + 5 * y
            lo[i] = b_lo[i] ^ (~b_lo[(x + 1) % 5 + 5 * y]
                               & b_lo[(x + 2) % 5 + 5 * y])
            hi[i] = b_hi[i] ^ (~b_hi[(x + 1) % 5 + 5 * y]
                               & b_hi[(x + 2) % 5 + 5 * y])

    # iota
    lo[0] = lo[0] ^ rc_lo
    hi[0] = hi[0] ^ rc_hi
    return jnp.stack([jnp.stack([lo[i], hi[i]], axis=0) for i in range(25)],
                     axis=0)


def keccak_f(lanes):
    """Keccak-f[1600] permutation on [25, 2, ...] u32 lane pairs."""
    rc = jnp.asarray(
        [[c & 0xFFFFFFFF, c >> 32] for c in _RC], dtype=U32)  # [24, 2]

    def body(st, rci):
        return _round(st, rci[0], rci[1]), None

    lanes, _ = jax.lax.scan(body, lanes, rc)
    return lanes


def keccak256_words(msg_words, msg_len_bytes: int = None):
    """Keccak-256 of [..., W] u32 LE byte-stream words -> [..., 8] digests.

    msg_len_bytes defaults to 4*W (whole words; the usual case — felt rows
    are multiples of 4 bytes).  Padding (0x01 .. 0x80) is applied here.
    """
    msg_words = msg_words.astype(U32)
    nwords = msg_words.shape[-1]
    if msg_len_bytes is None:
        msg_len_bytes = 4 * nwords
    assert msg_len_bytes == 4 * nwords, \
        "device keccak absorbs whole-word messages"
    batch = msg_words.shape[:-1]

    # build padded word blocks on the host side of the trace (static layout)
    nblocks = msg_len_bytes // (4 * RATE_WORDS) + 1
    total_words = nblocks * RATE_WORDS
    zeros = jnp.zeros(batch, dtype=U32)

    def word(i):
        w = msg_words[..., i] if i < nwords else zeros
        if i == nwords:  # pad byte 0x01 right after the message
            w = w ^ U32(0x01)
        if i == total_words - 1:  # 0x80 in the final byte of the block
            w = w ^ U32(0x80000000)
        return w

    lanes = jnp.zeros((25, 2) + batch, dtype=U32)
    for blk in range(nblocks):
        absorbed = []
        for lane in range(RATE_WORDS // 2):
            wlo = word(blk * RATE_WORDS + 2 * lane)
            whi = word(blk * RATE_WORDS + 2 * lane + 1)
            absorbed.append(jnp.stack([wlo, whi], axis=0))
        add = jnp.stack(absorbed + [jnp.zeros((2,) + batch, dtype=U32)] * 8,
                        axis=0)  # [25, 2, ...]
        lanes = keccak_f(lanes ^ add)

    # squeeze 32 bytes = first 4 lanes = 8 u32 words
    out = [lanes[i // 2, i % 2] for i in range(8)]
    return jnp.stack(out, axis=-1)


def keccak_hash_rows(word_arrays):
    """Hash each row given per-column byte-stream word arrays: [N, 8]."""
    return keccak256_words(jnp.concatenate(word_arrays, axis=-1))


def keccak_hash_node_pairs(level):
    """[2k, 8] digests -> [k, 8] parent digests (keccak of left||right)."""
    k = level.shape[0] // 2
    return keccak256_words(level.reshape(k, 16))


# jit-wrap the public entry points
keccak256_words = jax.jit(keccak256_words, static_argnums=(1,))
keccak_hash_rows = jax.jit(keccak_hash_rows)
keccak_hash_node_pairs = jax.jit(keccak_hash_node_pairs)
