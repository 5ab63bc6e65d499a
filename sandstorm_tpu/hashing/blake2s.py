"""Vectorized Blake2s-256 for device-side Merkle leaf/node hashing.

The reference hashes every LDE row with Blake2s (crypto/src/hash/blake2s.rs,
crypto/src/merkle/utils.rs hash_rows) on the CPU via RustCrypto.  Here the
compression function is expressed over uint32 lanes and vmapped across rows
by construction (all ops are elementwise over the leading batch dims), so a
whole commitment's leaves hash in a handful of fused XLA ops on the VPU.

Messages are passed as little-endian u32 word arrays with a static byte
length (the row width is static per matrix), which avoids any device-side
byte shuffling: field-element canonical LE limbs are already the message.

Matches RFC 7693 blake2s with digest_size=32, no key (verified against
hashlib.blake2s in tests).
"""

import functools

import jax.numpy as jnp

from ..fields.u32 import U32

IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)

SIGMA = (
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    (14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    (11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    (7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    (9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    (2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    (12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    (13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    (6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    (10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
)


def _rotr(x, r):
    return (x >> r) | (x << (32 - r))


def _g(v, a, b, c, d, x, y):
    v[a] = v[a] + v[b] + x
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = v[a] + v[b] + y
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 7)


def _compress(h, m, t: int, last: bool):
    """One Blake2s compression: h = list of 8 arrays, m = list of 16 arrays.

    The 10 rounds run under ONE lax.scan over the SIGMA schedule (per-round
    message words are a gather) — a fully unrolled 10-round graph takes
    XLA:CPU many minutes to compile; the scan body is 10x smaller and the
    semantics identical.
    """
    import jax
    v = list(h) + [jnp.broadcast_to(U32(iv), h[0].shape) for iv in IV]
    v[12] = v[12] ^ U32(t & 0xFFFFFFFF)
    v[13] = v[13] ^ U32((t >> 32) & 0xFFFFFFFF)
    if last:
        v[14] = v[14] ^ U32(0xFFFFFFFF)
    m_arr = jnp.stack(m, axis=0)                        # [16, ...]
    sigma = jnp.asarray(SIGMA, dtype=jnp.int32)         # [10, 16]

    def round_body(vs, s):
        ms = jnp.take(m_arr, s, axis=0)                 # [16, ...]
        v = [vs[i] for i in range(16)]
        _g(v, 0, 4, 8, 12, ms[0], ms[1])
        _g(v, 1, 5, 9, 13, ms[2], ms[3])
        _g(v, 2, 6, 10, 14, ms[4], ms[5])
        _g(v, 3, 7, 11, 15, ms[6], ms[7])
        _g(v, 0, 5, 10, 15, ms[8], ms[9])
        _g(v, 1, 6, 11, 12, ms[10], ms[11])
        _g(v, 2, 7, 8, 13, ms[12], ms[13])
        _g(v, 3, 4, 9, 14, ms[14], ms[15])
        return jnp.stack(v, axis=0), None

    # under shard_map the message is varying over the mesh axis while the
    # IV-derived carry is not; adding a message-derived zero makes the scan
    # carry's varying-axes set match its output (axis-name agnostic)
    v_init = jnp.stack(v, axis=0) + m_arr[0] * U32(0)
    v_arr, _ = jax.lax.scan(round_body, v_init, sigma)
    return [h[i] ^ v_arr[i] ^ v_arr[i + 8] for i in range(8)]


def blake2s_words(msg_words, msg_len_bytes: int = None):
    """Blake2s-256 of a [..., W] u32 LE word array; returns [..., 8] digests.

    msg_len_bytes defaults to 4*W (whole words).  The message is implicitly
    zero-padded to the block boundary, per the spec.
    """
    msg_words = msg_words.astype(U32)
    nwords = msg_words.shape[-1]
    if msg_len_bytes is None:
        msg_len_bytes = 4 * nwords
    assert msg_len_bytes <= 4 * nwords

    batch_shape = msg_words.shape[:-1]
    h = [jnp.broadcast_to(U32(iv), batch_shape) for iv in IV]
    # parameter block: digest_length=32, fanout=1, depth=1
    h[0] = h[0] ^ U32(0x01010020)

    nblocks = max((msg_len_bytes + 63) // 64, 1)
    zeros = jnp.zeros(batch_shape, dtype=U32)
    for blk in range(nblocks):
        m = []
        for w in range(16):
            idx = blk * 16 + w
            m.append(msg_words[..., idx] if idx < nwords else zeros)
        last = blk == nblocks - 1
        t = msg_len_bytes if last else (blk + 1) * 64
        h = _compress(h, m, t, last)
    return jnp.stack(h, axis=-1)


def hash_rows(word_arrays):
    """Hash each row of a matrix given per-column word arrays.

    word_arrays: list of [N, W_i] u32 arrays (canonical LE words per column).
    Returns [N, 8] digests.  Mirrors the reference's row hashing of
    column-major matrices (crypto/src/merkle/utils.rs:19-46).
    """
    msg = jnp.concatenate(word_arrays, axis=-1)
    return blake2s_words(msg)


def hash_node_pairs(level):
    """[2k, 8] digests -> [k, 8] parent digests (hash of left||right)."""
    k = level.shape[0] // 2
    pairs = level.reshape(k, 16)
    return blake2s_words(pairs)


def blake2s_host(data: bytes) -> bytes:
    """Host-side mirror (for transcripts and verification)."""
    import hashlib
    return hashlib.blake2s(data, digest_size=32).digest()


# jit-wrap the public entry points
import jax as _jax  # noqa: E402

blake2s_words = _jax.jit(blake2s_words, static_argnums=(1,))
hash_rows = _jax.jit(hash_rows)
hash_node_pairs = _jax.jit(hash_node_pairs)
