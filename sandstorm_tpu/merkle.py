"""Merkle commitments over matrix rows (device-hashed leaves + levels).

Capability parity with the reference's MerkleTree/MatrixMerkleTree traits
(/root/reference crypto/src/merkle/mod.rs:64-166): build from a column-major
matrix, produce a root, decommit rows at query indices, verify paths.

Leaves and all internal levels are hashed on device with the vectorized
Blake2s kernel; the tree levels stay on device and are only pulled to host
lazily when paths are assembled.

The reference's mixed-hash "friendly" tree (Pedersen top layers,
crypto/src/merkle/mod.rs:43-238) is FriendlyMerkleTreeFast below; the
EthVerifierClaim's masked-Keccak LeafVariant tree is
MaskedKeccakMerkleTree.  Host mirrors live in crypto/merkle_variants.py.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .hashing.blake2s import blake2s_words, hash_rows, hash_node_pairs, blake2s_host


@functools.lru_cache(maxsize=None)
def _path_gather_kernel(nlevels: int):
    """One fused gather of every level's sibling digests for a batch of
    query indices: levels (tuple of [M_l, W]) x [Q] -> [nlevels, Q, W]
    stacked so ONE transfer carries the whole tree's paths (a per-level
    fetch costs a tunnel round trip per level per tree)."""
    @jax.jit
    def f(levels, idx):
        out = []
        cur = idx
        for level in levels:
            out.append(jnp.take(level, cur ^ 1, axis=0))
            cur = cur >> 1
        return jnp.stack(out)
    return f


def _sibling_stack_dev(levels, indices):
    """Device [nlevels, Q, W] sibling rows for the queries (one gather)."""
    idx = jnp.asarray(list(indices), dtype=jnp.int32)
    return _path_gather_kernel(len(levels))(tuple(levels), idx)


def _sibling_stack(levels, indices):
    """numpy [nlevels, Q, W] sibling rows for the queries (one transfer)."""
    return np.asarray(jax.device_get(_sibling_stack_dev(levels, indices)))


class FetchPlan:
    """Batches many small device->host reads into ONE transfer.

    Every queued array is raveled into a single u32 buffer (one device
    concat dispatch) and fetched with one device_get: through the
    tunneled TPU each separate fetch pays a ~24ms round trip, and query
    assembly makes ~16 of them per prove.  add() returns a handle;
    run() resolves every handle to its numpy array."""

    def __init__(self):
        self._arrays = []
        self._shapes = []

    def add(self, arr):
        assert arr.dtype == jnp.uint32, arr.dtype
        self._arrays.append(jnp.ravel(arr))
        self._shapes.append(tuple(arr.shape))
        return len(self._arrays) - 1

    def run(self):
        if not self._arrays:
            return []
        flat = (jnp.concatenate(self._arrays) if len(self._arrays) > 1
                else self._arrays[0])
        host = np.asarray(jax.device_get(flat))
        out, off = [], 0
        for sh in self._shapes:
            size = int(np.prod(sh)) if sh else 1
            out.append(host[off:off + size].reshape(sh))
            off += size
        return out


def _digest_paths_np(sibs, nq):
    """[nlev, Q, W] numpy sibling words -> per-query 32-byte path lists."""
    return [[b"".join(int(w).to_bytes(4, "little") for w in sibs[l, qi])
             for l in range(sibs.shape[0])]
            for qi in range(nq)]


def _batched_paths(levels, indices):
    """Sibling digests -> list (per query) of 32-byte path strings."""
    if not levels:
        return [[] for _ in indices]
    return _digest_paths_np(_sibling_stack(levels, indices), len(indices))


class MerkleTree:
    """Binary Merkle tree over [N, 8]-u32 leaf digests (N a power of two)."""

    def __init__(self, leaf_digests):
        n = leaf_digests.shape[0]
        assert n & (n - 1) == 0, "leaf count must be a power of two"
        levels = [leaf_digests]
        while levels[-1].shape[0] > 1:
            levels.append(hash_node_pairs(levels[-1]))
        self._levels = levels  # device arrays, leaves first
        self._host_levels = None

    @classmethod
    def from_matrix_columns(cls, word_arrays):
        """word_arrays: list of [N, W] canonical-LE u32 word arrays."""
        return cls(hash_rows(word_arrays))

    @property
    def root(self) -> bytes:
        top = np.asarray(jax.device_get(self._levels[-1]))[0]
        return b"".join(int(w).to_bytes(4, "little") for w in top)

    def _host(self):
        if self._host_levels is None:
            self._host_levels = [np.asarray(jax.device_get(l)) for l in self._levels]
        return self._host_levels

    def prove(self, index: int):
        """Authentication path (list of 32-byte sibling digests, leaf->root)."""
        return self.prove_batch([index])[0]

    def prove_batch(self, indices):
        """Paths for many indices: ONE fused device gather + transfer for
        the whole tree (pulling full levels to host moves hundreds of MB;
        eager per-level gathers pay a round trip per level)."""
        plan = FetchPlan()
        finish = self.plan_paths(indices, plan)
        return finish(plan.run())

    def plan_paths(self, indices, plan: FetchPlan):
        """Queue this tree's sibling gather on `plan`; returns a
        finish(results) -> paths closure (the query phase batches every
        tree's fetch into one transfer)."""
        levels = self._levels[:-1]
        if not levels:
            return lambda res: [[] for _ in indices]
        h = plan.add(_sibling_stack_dev(levels, indices))
        nq = len(list(indices))
        return lambda res: _digest_paths_np(res[h], nq)

    @staticmethod
    def verify(root: bytes, index: int, leaf_digest: bytes, path) -> bool:
        node = leaf_digest
        idx = index
        for sib in path:
            if idx & 1:
                node = blake2s_host(sib + node)
            else:
                node = blake2s_host(node + sib)
            idx >>= 1
        return node == root

    @staticmethod
    def hash_row_host(row_words_le: bytes) -> bytes:
        """Host mirror of the device leaf hash (input: canonical LE bytes)."""
        return blake2s_host(row_words_le)


def _words_to_felt_limbs(words_np):
    """[N, 8] LE-packed digest words -> [N, 4] LE u64 limbs of the felt
    obtained by reading the 32-byte digest big-endian (the friendly tree's
    Blake-to-felt boundary conversion, mixed.rs:148-156)."""
    u8 = np.ascontiguousarray(words_np.astype("<u4")).view(np.uint8)
    u8 = u8.reshape(words_np.shape[0], 32)[:, ::-1]  # reverse = LE int bytes
    return np.ascontiguousarray(u8).view("<u8").reshape(-1, 4)


def _use_device_pedersen() -> bool:
    """Device subset-sum for the algebraic layers: TPU only by default
    (the XLA digit kernels are slow on CPU backends; the native C++ batch
    wins there).  SANDSTORM_TPU_DEVICE_PEDERSEN=0/1 overrides (tests)."""
    import os
    ov = os.environ.get("SANDSTORM_TPU_DEVICE_PEDERSEN")
    if ov is not None:
        return ov == "1"
    return jax.default_backend() == "tpu"


# levels with fewer pairs than this switch from the device kernel to the
# native C++ batch (dispatch overhead beats the hash work below it).
# 2^9 balances the single-core native top (~511 hashes, ~12ms) against
# padded tiny-level device dispatches in the FRI layer trees
DEVICE_PEDERSEN_MIN_PAIRS = 1 << 9


class FriendlyMerkleTreeFast:
    """FriendlyMerkleTree with device row/low-level hashing and the
    algebraic top layers on the TPU (hashing/pedersen_tpu.py), falling
    back to native (C++) batched Pedersen for small levels / CPU runs.

    Bit-identical to crypto/merkle_variants.FriendlyMerkleTree: rows hashed
    with MaskedBlake2s<20> over Montgomery-form felts, node merges below
    depth n_friendly with MaskedBlake2s, the top n_friendly layers with the
    Pedersen hash after a big-endian digest->felt boundary conversion.
    """

    def __init__(self, blake_levels, felt_dev_levels, felt_levels,
                 single_col):
        self._blake_levels = blake_levels      # device [M, 8] word arrays
        self._felt_dev = felt_dev_levels       # device [M, 16] digit arrays
        self._felt_levels = felt_levels        # numpy [M, 4] u64 limb arrays
        self.single_col = single_col
        self._host_blake = None

    @classmethod
    def from_felt_column(cls, F, col, n_friendly: int):
        """Single-column commitment: leaves are the raw CANONICAL felts
        (the reference's Unhashed leaf variant) and every merge is
        algebraic, so the whole tree is the Pedersen chain — on device
        for the big levels (a 2^22-leaf single-column tree was minutes of
        one-at-a-time host hashing)."""
        from .native import pedersen_hash_pairs
        from .hashing.pedersen_tpu import (digits_to_limbs_np,
                                           hash_pairs_digits)
        dig = F.from_mont(col)  # [N, 16] canonical digits (device)
        felt_dev = []
        if (_use_device_pedersen()
                and dig.shape[0] >= 2 * DEVICE_PEDERSEN_MIN_PAIRS):
            cur = dig
            felt_dev.append(cur)
            while cur.shape[0] // 2 >= DEVICE_PEDERSEN_MIN_PAIRS:
                cur = hash_pairs_digits(F, cur[0::2], cur[1::2])
                felt_dev.append(cur)
            felt_levels = [digits_to_limbs_np(
                np.asarray(jax.device_get(cur)))]
        else:
            felt_levels = [digits_to_limbs_np(
                np.asarray(jax.device_get(dig)))]
        while felt_levels[-1].shape[0] > 1:
            prev = felt_levels[-1]
            felt_levels.append(pedersen_hash_pairs(prev[0::2], prev[1::2]))
        return cls([], felt_dev, felt_levels, True)

    @classmethod
    def from_mont_word_columns(cls, F, word_cols, n_friendly: int,
                               n_unmasked: int = 20):
        from .hashing.blake2s import hash_rows, hash_node_pairs
        from .native import pedersen_hash_pairs
        zero_words = (32 - n_unmasked) // 4
        assert (32 - n_unmasked) % 4 == 0

        def mask(d):  # keep the n_unmasked LEAST-significant digest bytes
            return d.at[..., :zero_words].set(0)

        single = len(word_cols) == 1
        blake_levels = []
        felt_dev = []
        if single:
            # felt leaves, every layer algebraic
            felts = _words_to_felt_limbs(
                np.asarray(jax.device_get(word_cols[0])))
            # NOTE: single-column leaves are canonical felts, not digests —
            # callers pass canonical (non-Montgomery) words in this mode
            felt_levels = [felts]
        else:
            leaves = mask(hash_rows(word_cols))
            blake_levels.append(leaves)
            height = int(leaves.shape[0]).bit_length() - 1
            for _ in range(max(height - n_friendly, 0)):
                blake_levels.append(mask(hash_node_pairs(blake_levels[-1])))
            boundary = blake_levels[-1]
            if (_use_device_pedersen()
                    and boundary.shape[0] >= 2 * DEVICE_PEDERSEN_MIN_PAIRS):
                from .hashing.pedersen_tpu import (
                    digest_words_to_digits, digits_to_limbs_np,
                    hash_pairs_digits)
                cur = digest_words_to_digits(boundary)
                felt_dev.append(cur)
                while cur.shape[0] // 2 >= DEVICE_PEDERSEN_MIN_PAIRS:
                    cur = hash_pairs_digits(F, cur[0::2], cur[1::2])
                    felt_dev.append(cur)
                felt_levels = [digits_to_limbs_np(
                    np.asarray(jax.device_get(cur)))]
            else:
                felt_levels = [_words_to_felt_limbs(
                    np.asarray(jax.device_get(boundary)))]
        while felt_levels[-1].shape[0] > 1:
            prev = felt_levels[-1]
            felt_levels.append(pedersen_hash_pairs(prev[0::2], prev[1::2]))
        return cls(blake_levels, felt_dev, felt_levels, single)

    @property
    def root(self) -> bytes:
        limbs = self._felt_levels[-1][0]
        return int.from_bytes(limbs.tobytes(), "little").to_bytes(32, "big")

    def _host(self):
        if self._host_blake is None:
            self._host_blake = [np.asarray(jax.device_get(l))
                                for l in self._blake_levels]
        return self._host_blake

    def prove(self, index: int):
        return self.prove_batch([index])[0]

    def prove_batch(self, indices):
        plan = FetchPlan()
        finish = self.plan_paths(indices, plan)
        return finish(plan.run())

    def plan_paths(self, indices, plan: FetchPlan):
        """32-byte siblings leaf->root per query (two-phase: device
        gathers queued on `plan`, host path assembly in the returned
        finish closure).  The last blake level and felt level 0 are the
        same tree level (a boundary conversion, not a merge), and a
        boundary felt's big-endian serialization IS the digest's byte
        string — so every sibling serializes uniformly.

        _felt_dev (when present) holds felt levels 0..d with level d
        duplicated as _felt_levels[0], so device siblings come from
        _felt_dev[:-1] and host siblings from _felt_levels[:-1]."""
        idx = [int(i) for i in indices]
        bl = self._blake_levels[:-1]
        hb = plan.add(_sibling_stack_dev(bl, idx)) if bl else None
        shift = max(len(self._blake_levels) - 1, 0)
        cur0 = [q >> shift for q in idx]
        dev = self._felt_dev[:-1]
        hf = plan.add(_sibling_stack_dev(dev, cur0)) \
            if len(self._felt_dev) > 1 else None

        def finish(res):
            paths = (_digest_paths_np(res[hb], len(idx)) if hb is not None
                     else [[] for _ in idx])
            cur = list(cur0)
            if hf is not None:
                for lvl in res[hf].astype(np.uint64):  # [Q, 16] digits
                    for q in range(len(idx)):
                        v = 0
                        for k in range(16):
                            v |= int(lvl[q, k]) << (16 * k)
                        paths[q].append(v.to_bytes(32, "big"))
                cur = [q >> len(dev) for q in cur]
            for level in self._felt_levels[:-1]:
                for q in range(len(idx)):
                    sib = level[cur[q] ^ 1]
                    paths[q].append(int.from_bytes(sib.tobytes(), "little")
                                    .to_bytes(32, "big"))
                cur = [q >> 1 for q in cur]
            return paths
        return finish


class MaskedKeccakMerkleTree:
    """Device-hashed LeafVariant tree over MaskedKeccak256<N> — the
    EthVerifierClaim's commitment (crypto/src/merkle/mod.rs:240-417) with
    leaves and levels hashed by the vectorized Keccak kernel.

    Matrix rows are Montgomery-form big-endian felt streams (the reference
    Keccak256HashFn convention); a single-column matrix commits its raw
    felts as unhashed leaves.  Digests are 32-byte strings with only the
    n_unmasked most-significant bytes kept — on device that zeroes whole
    u32 words (n_unmasked must be a multiple of 4).
    """

    def __init__(self, levels, single_col: bool):
        self._levels = levels
        self.single_col = single_col
        self._host_levels = None

    @classmethod
    def from_mont_word_columns(cls, word_cols, n_unmasked: int = 20):
        """word_cols: list of [N, 8] Montgomery-BE u32 word arrays."""
        from .hashing.keccak import (keccak_hash_rows,
                                     keccak_hash_node_pairs)
        assert n_unmasked % 4 == 0
        keep = n_unmasked // 4

        def mask(d):
            return d.at[..., keep:].set(0)

        single = len(word_cols) == 1
        if single:
            leaves = word_cols[0]  # raw felts, unhashed
        else:
            leaves = mask(keccak_hash_rows(word_cols))
        levels = [leaves]
        while levels[-1].shape[0] > 1:
            levels.append(mask(keccak_hash_node_pairs(levels[-1])))
        return cls(levels, single)

    @property
    def root(self) -> bytes:
        top = np.asarray(jax.device_get(self._levels[-1]))[0]
        return b"".join(int(w).to_bytes(4, "little") for w in top)

    def _host(self):
        if self._host_levels is None:
            self._host_levels = [np.asarray(jax.device_get(l))
                                 for l in self._levels]
        return self._host_levels

    def prove(self, index: int):
        return self.prove_batch([index])[0]

    def prove_batch(self, indices):
        return _batched_paths(self._levels[:-1], indices)

    def plan_paths(self, indices, plan: FetchPlan):
        levels = self._levels[:-1]
        if not levels:
            return lambda res: [[] for _ in indices]
        h = plan.add(_sibling_stack_dev(levels, indices))
        nq = len(list(indices))
        return lambda res: _digest_paths_np(res[h], nq)
