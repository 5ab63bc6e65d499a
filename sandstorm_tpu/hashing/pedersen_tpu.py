"""Device (TPU) batched Pedersen hashing for the FriendlyMerkleTree's
algebraic layers.

The reference computes these hashes on CPU (starknet-crypto + rayon,
/root/reference crypto/src/hash/pedersen.rs) and documents the cost: the
algebraic layers are ">100x slower for the prover" than Blake2s
(crypto/src/merkle/mod.rs:42).  Our native C++ batch (native/pedersen.cpp)
reaches ~42k hashes/s on this host's single core, which still leaves the
three ~2^19-hash tree commits as ~37s of the recursive-example prove.

This module moves the subset-sum to the TPU:

- the SAME 8-bit fixed-window tables as the native path (64 windows of
  256 affine points, Montgomery form; window w<31 of each scalar rides the
  low-248-bit chain, w=31 the 4 high bits — builtins/src/pedersen/mod.rs
  split), uploaded once per process;
- accumulation in JACOBIAN coordinates — the native path does affine adds
  with one batched inversion per window step; on device, inversions are
  log-depth scans, so instead the whole 64-window walk is inversion-free
  (7M+4S mixed adds, madd-2007-bl) and ONE batch inversion at the very end
  converts to the affine x-coordinate digest;
- one jitted lax.scan over the 64 windows (tables ride as scan inputs, so
  the graph is O(1) in the window count and each montmul is the Pallas
  digit-major kernel).

A window value of 0 contributes the identity: the add is computed
unconditionally and discarded with a select (branchless, like the AIR's
own bit-conditional adds).  The accumulator itself is never the identity
(it starts at the shift point, and a vanishing partial subset-sum would be
an EC dlog break); the degenerate doubling case (partial sum equal to a
table point) is cryptographically negligible and would equally break the
reference's affine-slope path.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.u32 import U32


@functools.lru_cache(maxsize=1)
def _tables_np():
    """([64, 256, 2, 16] u32 Montgomery digit tables, [2, 16] shift)."""
    from ..native import _window_tables
    table, shift = _window_tables()  # [2, 32, 256, 8] u64 mont, [8] u64
    t = np.ascontiguousarray(table).view("<u2")
    t = t.reshape(2, 32, 256, 2, 16).astype(np.uint32)
    t = t.reshape(64, 256, 2, 16)
    s = np.ascontiguousarray(shift).view("<u2").reshape(2, 16) \
        .astype(np.uint32)
    return t, s


_DEV = {}


def _tables_dev():
    if "t" not in _DEV:
        t, s = _tables_np()
        _DEV["t"] = jnp.asarray(t)
        _DEV["s"] = jnp.asarray(s)
    return _DEV["t"], _DEV["s"]


@functools.partial(jax.jit, static_argnums=(0,))
def _hash_pairs_core(F, a_dig, b_dig, tables, shift):
    """Batched pedersen(a, b): canonical [M, 16] digit scalars -> canonical
    [M, 16] digit x-coordinates.

    tables: [64, 256, 2, 16] Montgomery affine window points (entry 0
    is unused / identity); shift: [2, 16] Montgomery shift point.
    """
    M = a_dig.shape[0]

    def window_values(s):
        # byte j of the canonical int = digit[j//2] >> (8*(j%2)): [M, 32]
        return jnp.stack([s & U32(0xFF), s >> 8], axis=-1).reshape(M, 32)

    v = jnp.concatenate(
        [window_values(a_dig), window_values(b_dig)], axis=1).T  # [64, M]

    X = jnp.broadcast_to(shift[0], (M, 16))
    Y = jnp.broadcast_to(shift[1], (M, 16))
    Z = F.ones((M,))

    def body(carry, xs):
        X, Y, Z = carry
        tbl, vw = xs
        t = jnp.take(tbl, vw, axis=0)  # [M, 2, 16]
        x2, y2 = t[:, 0], t[:, 1]
        # mixed Jacobian+affine add (madd-2007-bl), curve a=1 irrelevant
        # to the add formulas (only doubling uses a)
        Z1Z1 = F.sqr(Z)
        U2 = F.mul(x2, Z1Z1)
        S2 = F.mul(y2, F.mul(Z, Z1Z1))
        H = F.sub(U2, X)
        HH = F.sqr(H)
        I2 = F.add(HH, HH)
        I = F.add(I2, I2)
        J = F.mul(H, I)
        r = F.sub(S2, Y)
        r = F.add(r, r)
        V = F.mul(X, I)
        X3 = F.sub(F.sub(F.sqr(r), J), F.add(V, V))
        YJ = F.mul(Y, J)
        Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.add(YJ, YJ))
        Z3 = F.sub(F.sub(F.sqr(F.add(Z, H)), Z1Z1), HH)
        skip = (vw == 0)[:, None]
        X = jnp.where(skip, X, X3)
        Y = jnp.where(skip, Y, Y3)
        Z = jnp.where(skip, Z, Z3)
        return (X, Y, Z), None

    (X, Y, Z), _ = jax.lax.scan(body, (X, Y, Z), (tables, v))
    z_inv = F.batch_inv(Z, 0)
    x_aff = F.mul(X, F.sqr(z_inv))      # Montgomery affine x
    return F.from_mont(x_aff)           # canonical digits


def hash_pairs_digits(F, a_dig, b_dig):
    """pedersen(a, b) over canonical [M, 16] u32 digit arrays (device)."""
    t, s = _tables_dev()
    return _hash_pairs_core(F, a_dig, b_dig, t, s)


def digest_words_to_digits(words):
    """[..., 8] LE u32 digest words -> [..., 16] canonical digits of the
    felt read from the 32-byte digest string BIG-endian (the friendly
    tree's Blake-to-felt boundary, mixed.rs:148-156)."""
    w = words.astype(U32)
    # reverse the byte string: reverse words, byteswap each
    wr = w[..., ::-1]
    bs = (((wr & U32(0xFF)) << 24) | ((wr & U32(0xFF00)) << 8)
          | ((wr >> 8) & U32(0xFF00)) | (wr >> 24))
    lo = bs & U32(0xFFFF)
    hi = bs >> 16
    return jnp.stack([lo, hi], axis=-1).reshape(w.shape[:-1] + (16,))


def digits_to_limbs_np(dig_np):
    """numpy [..., 16] u32 canonical digits -> [..., 4] u64 LE limbs."""
    d = np.asarray(dig_np, dtype=np.uint64)
    out = np.zeros(d.shape[:-1] + (4,), dtype=np.uint64)
    for k in range(16):
        out[..., k // 4] |= d[..., k] << np.uint64(16 * (k % 4))
    return out
