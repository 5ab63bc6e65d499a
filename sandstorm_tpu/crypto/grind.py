"""Batched proof-of-work grinding on device.

The reference grinds its PoW nonce with a rayon parallel search over the
hash (crypto/src/public_coin/solidity.rs:137-151, find_any).  The pure
python loop in coins.py manages ~1.8k hashes/s — a 16-bit grind averages
~37 s.  Here candidate nonces are hashed in device batches with the
vectorized Keccak/Blake2s kernels (hashing/keccak.py, hashing/blake2s.py):
one dispatch covers 2^16 nonces, so the default 16-bit grind is one or two
round trips.

Protocol (both coins, coins.py:86-101): a valid nonce satisfies
    leading_zero_bits(H(prefix32 || nonce_be8)) >= bits
with the digest read big-endian.  bits <= 32 always holds in practice
(the CLI default is 16), so the check reduces to one byteswapped u32
compare on the digest's first word.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

BATCH = 1 << 16


def _bswap32(x):
    return ((x >> 24) | ((x >> 8) & 0xFF00)
            | ((x & 0xFF00) << 8) | (x << 24))


@functools.lru_cache(maxsize=4)
def _grind_kernel(hash_name: str, bits: int):
    if hash_name == "keccak":
        from ..hashing.keccak import keccak256_words as hash_words
    else:
        from ..hashing.blake2s import blake2s_words as hash_words

    @jax.jit
    def step(prefix_words, nonce0):
        """prefix_words: [8] u32; nonce0: scalar u64 start.
        Returns (hit_index_or_BATCH, nonce_lo_words) for BATCH nonces."""
        nonces = nonce0 + jnp.arange(BATCH, dtype=jnp.uint64)
        hi = (nonces >> np.uint64(32)).astype(jnp.uint32)
        lo = (nonces & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        msg = jnp.concatenate([
            jnp.broadcast_to(prefix_words, (BATCH, 8)),
            _bswap32(hi)[:, None], _bswap32(lo)[:, None]], axis=1)
        digests = hash_words(msg)  # [BATCH, 8] LE words of the byte stream
        lead = _bswap32(digests[:, 0])  # big-endian first 4 digest bytes
        ok = lead < np.uint32(1 << (32 - bits)) if bits < 32 else lead == 0
        idx = jnp.argmax(ok)  # first True, or 0 if none
        return jnp.where(ok[idx], idx.astype(jnp.uint32), np.uint32(BATCH))

    return step


def grind(hash_name: str, prefix: bytes, bits: int, start: int = 1,
          max_batches: int = 1 << 14) -> int:
    """Find the smallest nonce >= start passing the PoW check."""
    assert len(prefix) == 32 and 0 < bits <= 32
    prefix_words = jnp.asarray(
        np.frombuffer(prefix, dtype="<u4").copy())
    step = _grind_kernel(hash_name, bits)
    nonce0 = start
    for _ in range(max_batches):
        idx = int(step(prefix_words, jnp.uint64(nonce0)))
        if idx < BATCH:
            return nonce0 + idx
        nonce0 += BATCH
    raise RuntimeError("proof-of-work grind exhausted max_batches")
