"""Merkle-tree variants matching the reference's commitment schemes.

Parity with /root/reference crypto/src/merkle/{mod.rs,mixed.rs}:

- LeafVariantMerkleTree<H>: a matrix commitment where a single-column
  matrix's leaves are the raw felts ("Unhashed") and a multi-column
  matrix's rows are element-hashed first ("Hashed") — used with
  MaskedKeccak256HashFn<20> by the EthVerifierClaim (mod.rs:240-417).

- FriendlyMerkleTree<N, H>: rows hashed with MaskedBlake2sHashFn<20>;
  internal nodes at depth >= N (counted from the root) merge with
  MaskedBlake2s, the top N layers merge with the algebraic hash H
  (Pedersen) after converting the boundary Blake digests to felts
  big-endian (mixed.rs:104-156).  ">100x faster for the prover" than
  hashing every layer algebraically (mod.rs:28-42).

Digests are `bytes` (byte-oriented hashes) or `int` (algebraic); the
mixed tree mirrors ministark's MixedMerkleDigest as ("high"|"low", value).

These host implementations define the protocol semantics and serve the
correctness tests; bulk leaf/level hashing on device (Blake2s kernel, and
batched-EC Pedersen merges) slots in behind the same interface on the hot
path.
"""

from .hashes import MaskedBlake2sHashFn, PedersenHashFn

_MASKED_BLAKE20 = MaskedBlake2sHashFn(20)


class _HostTree:
    """Plain single-hash binary tree over a list of leaf digests."""

    def __init__(self, leaves, merge_fn):
        n = len(leaves)
        assert n & (n - 1) == 0 and n > 0
        self.levels = [list(leaves)]
        while len(self.levels[-1]) > 1:
            prev = self.levels[-1]
            self.levels.append(
                [merge_fn(prev[i], prev[i + 1]) for i in range(0, len(prev), 2)])

    @property
    def root(self):
        return self.levels[-1][0]

    def prove(self, index: int):
        path, idx = [], index
        for level in self.levels[:-1]:
            path.append(level[idx ^ 1])
            idx >>= 1
        return path

    @staticmethod
    def verify(root, index, leaf, path, merge_fn):
        node, idx = leaf, index
        for sib in path:
            node = merge_fn(sib, node) if idx & 1 else merge_fn(node, sib)
            idx >>= 1
        return node == root


class LeafVariantMerkleTree:
    """Matrix commitment with hashed/unhashed leaf variants (mod.rs:240+)."""

    def __init__(self, hash_fn):
        self.H = hash_fn
        self._tree = None
        self.single_col = False

    @classmethod
    def from_rows(cls, hash_fn, rows):
        """rows: list of per-row felt lists (len 1 => unhashed variant)."""
        self = cls(hash_fn)
        if all(len(r) == 1 for r in rows):
            self.single_col = True
            leaves = [r[0] for r in rows]
            merge = self._unhashed_merge
        else:
            leaves = [hash_fn.hash_elements(r) for r in rows]
            merge = hash_fn.merge
        self._tree = _HostTree(leaves, merge)
        return self

    def _unhashed_merge(self, a, b):
        # raw-felt leaves serialize in Montgomery form, the byte convention
        # of the tree's Keccak hash (crypto/src/hash/keccak.rs:50-57)
        from .hashes import to_montgomery_bytes
        enc = (to_montgomery_bytes(x) if isinstance(x, int) else x
               for x in (a, b))
        return self.H.hash(b"".join(enc))

    @property
    def root(self):
        return self._tree.root

    def prove(self, index: int):
        return self._tree.prove(index)

    @classmethod
    def verify_row(cls, hash_fn, root, index, row, path):
        self = cls(hash_fn)
        if len(row) == 1:
            leaf, merge = row[0], self._unhashed_merge
        else:
            leaf, merge = hash_fn.hash_elements(row), hash_fn.merge
        return _HostTree.verify(root, index, leaf, path, merge)


class FriendlyMerkleTree:
    """Mixed-hash tree: Blake2s low layers, algebraic top layers."""

    def __init__(self, n_friendly_layers: int, friendly_hash=PedersenHashFn,
                 row_hash=_MASKED_BLAKE20):
        self.n_friendly = n_friendly_layers
        self.FH = friendly_hash
        self.row_hash = row_hash
        self.levels = None

    @staticmethod
    def _boundary(n0: bytes, n1: bytes, friendly_hash):
        a = int.from_bytes(n0, "big")
        b = int.from_bytes(n1, "big")
        return friendly_hash.merge(a, b)

    def _merge_at_depth(self, depth: int, a, b):
        """depth = parent's distance from the root (mixed.rs:110-125)."""
        if depth >= self.n_friendly:
            return ("low", self.row_hash.merge(a[1], b[1]))
        if a[0] == "low":
            return ("high", self._boundary(a[1], b[1], self.FH))
        return ("high", self.FH.merge(a[1], b[1]))

    @classmethod
    def from_rows(cls, n_friendly_layers, rows, friendly_hash=PedersenHashFn):
        self = cls(n_friendly_layers, friendly_hash)
        if all(len(r) == 1 for r in rows):
            # single-column: felt leaves, every level algebraic
            leaves = [("high", r[0]) for r in rows]
            height = max(len(rows).bit_length() - 1, 0)
            self.levels = [leaves]
            while len(self.levels[-1]) > 1:
                prev = self.levels[-1]
                self.levels.append([
                    ("high", friendly_hash.merge(prev[i][1], prev[i + 1][1]))
                    for i in range(0, len(prev), 2)])
            return self
        leaves = [("low", self.row_hash.hash_elements(r)) for r in rows]
        height = max(len(rows).bit_length() - 1, 0)
        self.levels = [leaves]
        while len(self.levels[-1]) > 1:
            prev = self.levels[-1]
            depth = height - len(self.levels)  # parent depth from root
            self.levels.append([
                self._merge_at_depth(depth, prev[i], prev[i + 1])
                for i in range(0, len(prev), 2)])
        return self

    @property
    def root(self):
        return self.levels[-1][0]

    def prove(self, index: int):
        path, idx = [], index
        for level in self.levels[:-1]:
            path.append(level[idx ^ 1])
            idx >>= 1
        return path

    def verify_row(self, root, index, row, path):
        height = len(path)
        if len(row) == 1:
            node = ("high", row[0])
        else:
            node = ("low", self.row_hash.hash_elements(row))
        idx = index
        for lvl, sib in enumerate(path):
            depth = height - 1 - lvl
            a, b = (sib, node) if idx & 1 else (node, sib)
            if len(row) == 1:
                node = ("high", self.FH.merge(a[1], b[1]))
            else:
                node = self._merge_at_depth(depth, a, b)
            idx >>= 1
        return node == root
