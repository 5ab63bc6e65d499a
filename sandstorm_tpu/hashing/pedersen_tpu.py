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


def _use_wide_windows() -> bool:
    """16-bit windows (32 EC adds/hash instead of 64) by default on TPU:
    the [32, 65536] combined table is 256MB of HBM plus a one-time ~0.3s
    device build — on CPU backends that table build dominates any test's
    runtime, so tests keep the 8-bit path unless opted in."""
    import os
    ov = os.environ.get("SANDSTORM_TPU_PEDERSEN_W16")
    if ov is not None:
        return ov == "1"
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnums=(0,))
def _combine_window_chunk(F, lo, hi):
    """Affine sums lo[w, a] + hi[w, b] for every 16-bit value v = b*256+a.

    lo, hi: [W, 256, 2, 16] Montgomery affine 8-bit tables (entry 0 is the
    unused identity).  Returns [W, 65536, 2, 16] where entry v of window w
    is lo[w, v&255] (+) hi[w, v>>8]; v = 0 stays the (skipped) identity.
    One batched slope inversion covers the whole chunk.  Distinct nonzero
    entries can never coincide (a collision would be a discrete-log
    relation between the chain points), so the affine add is total.
    """
    W = lo.shape[0]
    a_idx = jnp.arange(65536, dtype=jnp.int32) & 0xFF
    b_idx = jnp.arange(65536, dtype=jnp.int32) >> 8
    x1 = lo[:, a_idx, 0]   # [W, 65536, 16]
    y1 = lo[:, a_idx, 1]
    x2 = hi[:, b_idx, 0]
    y2 = hi[:, b_idx, 1]
    a_zero = (a_idx == 0)[None, :, None]
    b_zero = (b_idx == 0)[None, :, None]
    degen = a_zero | b_zero
    one = F.ones(())
    den = jnp.where(degen, jnp.broadcast_to(one, x1.shape),
                    F.sub(x2, x1))
    inv = F.batch_inv(den.reshape(-1, 16), 0).reshape(den.shape)
    m = F.mul(F.sub(y2, y1), inv)
    x3 = F.sub(F.sub(F.sqr(m), x1), x2)
    y3 = F.sub(F.mul(m, F.sub(x1, x3)), y1)
    out_x = jnp.where(a_zero, x2, jnp.where(b_zero, x1, x3))
    out_y = jnp.where(a_zero, y2, jnp.where(b_zero, y1, y3))
    both = a_zero & b_zero
    out_x = jnp.where(both, jnp.zeros_like(out_x), out_x)
    out_y = jnp.where(both, jnp.zeros_like(out_y), out_y)
    return jnp.stack([out_x, out_y], axis=2)  # [W, 65536, 2, 16]


def _tables16_dev(F):
    """[32, 65536, 2, 16] device 16-bit window table, built on device from
    the 8-bit chains (window w combines 8-bit windows 2w and 2w+1)."""
    if "t16" not in _DEV:
        t8, _ = _tables_dev()
        chunks = []
        W = 4  # small chunks + a drain per chunk: queued executions
        # reserve their temp space at enqueue, and a mid-prove build in a
        # fragmented arena OOMs on large-transient chunks (prove() calls
        # prewarm_tables() up front to build in a clean arena)
        for s in range(0, 32, W):
            lo = t8[2 * s:2 * (s + W):2]
            hi = t8[2 * s + 1:2 * (s + W):2]
            chunks.append(_combine_window_chunk(F, lo, hi))
            jax.device_get(jnp.ravel(chunks[-1])[:1])
        # flatten the (coord, digit) dims: gathered rows become single
        # 128-byte contiguous units (the [65536, 2, 16] form gathered two
        # ragged 64B pieces per row)
        _DEV["t16"] = jnp.concatenate(chunks, axis=0).reshape(32, 65536, 32)
    return _DEV["t16"]


def prewarm_tables(F):
    """Build the device window tables up front (start of prove): the 16-bit
    combine runs large-transient chunks that can fail in a fragmented HBM
    arena mid-prove but succeed in a clean one."""
    if _use_wide_windows():
        _tables16_dev(F)
    else:
        _tables_dev()


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


@functools.partial(jax.jit, static_argnums=(0, 4))
def _hash_pairs_core16(F, a_dig, b_dig, tables16, interpret, shift):
    """16-bit-window variant of _hash_pairs_core: the canonical 16-bit
    digits ARE the window values, so the subset-sum walk is 32 mixed adds,
    each ONE fused Pallas dispatch (fields/fp252_pallas.py ec_madd kernel:
    the whole 7M+4S madd formula stays in VMEM; the per-op XLA form paid a
    dispatch plus two digit-layout transposes per montmul).

    tables16: [32, 65536, 32] flattened-coord windows (0-15 scalar a,
    16-31 scalar b).
    """
    from ..fields.fp252_pallas import ec_madd_digitmajor
    M = a_dig.shape[0]
    v = jnp.concatenate([a_dig.T, b_dig.T], axis=0).astype(jnp.int32)

    X = jnp.broadcast_to(shift[0], (M, 16)).T  # digit-major [16, M]
    Y = jnp.broadcast_to(shift[1], (M, 16)).T
    Z = F.ones((M,)).T

    def body(carry, xs):
        X, Y, Z = carry
        tbl, vw = xs
        t = jnp.take(tbl, vw, axis=0)  # [M, 32] contiguous rows
        x2, y2 = t[:, :16].T, t[:, 16:].T
        X, Y, Z = ec_madd_digitmajor(X, Y, Z, x2, y2, vw == 0,
                                     interpret=interpret)
        return (X, Y, Z), None

    (X, Y, Z), _ = jax.lax.scan(body, (X, Y, Z), (tables16, v))
    X, Z = X.T, Z.T
    z_inv = F.batch_inv(Z, 0)
    x_aff = F.mul(X, F.sqr(z_inv))
    return F.from_mont(x_aff)


def hash_pairs_digits(F, a_dig, b_dig):
    """pedersen(a, b) over canonical [M, 16] u32 digit arrays (device)."""
    if _use_wide_windows():
        from ..ntt.ntt_pallas import _interpret
        t16 = _tables16_dev(F)
        _, s = _tables_dev()
        return _hash_pairs_core16(F, a_dig, b_dig, t16, _interpret(), s)
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
