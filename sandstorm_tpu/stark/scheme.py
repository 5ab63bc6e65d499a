"""Pluggable commitment + Fiat-Shamir configuration for the engine.

The analog of the M (MatrixMerkleTree) and P (PublicCoin) type parameters
of the reference's CairoClaim<Fp, A, T, M, P> (src/lib.rs:34-125) and its
concrete claim aliases (src/claims.rs:12-33):

- GenericScheme: device-Blake2s row hashing + the generic public coin —
  the analog of the stock MatrixMerkleTreeImpl/PublicCoinImpl pair used by
  the Goldilocks experimental path (cli/src/main.rs:103-133).
- EthVerifierScheme: LeafVariantMerkleTree over MaskedKeccak256<20> +
  SolidityVerifierPublicCoin seeded from the Keccak hash of the canonical
  CairoAuxInput element serialization — the EthVerifierClaim.
- CairoVerifierScheme: FriendlyMerkleTree (MaskedBlake2s<20> rows, Blake2s
  low layers, Pedersen top N_FRIENDLY_LAYERS=22 — src/claims.rs:10) +
  CairoVerifierPublicCoin seeded from the Blake2s hash of the same element
  stream under the Pedersen page hash — the CairoVerifierClaim.

A scheme provides: make_coin(pub, options, trace_len), commit(F, lde_cols)
returning a tree handle (.root bytes, .prove(i) -> [32-byte siblings]), and
verify_row(root, index, row_felts, path).  Roots and path entries are
always 32-byte strings on the wire; algebraic (felt) digests serialize
big-endian, matching the proof container's fixed-width path encoding.
"""

import jax

from ..aux_input import CairoAuxInput
from ..crypto.coins import SolidityVerifierPublicCoin, CairoVerifierPublicCoin
from ..crypto.hashes import (keccak256, blake2s256, MaskedKeccak256HashFn,
                             MaskedBlake2sHashFn, CanonicalKeccak256HashFn,
                             PedersenHashFn)
from ..crypto.merkle_variants import LeafVariantMerkleTree, FriendlyMerkleTree
from ..merkle import MerkleTree
from .transcript import make_coin as make_generic_coin

N_FRIENDLY_LAYERS = 22  # src/claims.rs:10


def _rows_from_lde_cols(F, lde_cols):
    """Device [N, L] column list -> host list of per-row felt lists."""
    cols = [F.decode_ints(c) for c in lde_cols]
    return [list(r) for r in zip(*cols)]


class GenericScheme:
    """Current engine default: device Blake2s row/level hashing, generic
    Blake2s public coin seeded from a canonical public-input serialization."""

    name = "generic"
    # full Blake2s-256 digests: 128-bit collision resistance
    COLLISION_RESISTANCE_BITS = 128

    def prewarm(self, F):
        """Build any device tables before the prove's arrays land (see
        CairoVerifierScheme.prewarm)."""

    def make_coin(self, pub, options, trace_len):
        return make_generic_coin(pub, options, trace_len)

    def commit(self, F, lde_cols):
        return MerkleTree.from_matrix_columns(
            [F.to_bytes_words(c) for c in lde_cols])

    def hash_row(self, F, row_felts) -> bytes:
        """The leaf digest of a committed row (host mirror of commit).

        Extension fields override to_hash_bytes_int: their canonical byte
        stream is per-coordinate, not the packed int's own LE bytes."""
        tb = getattr(F, "to_hash_bytes_int",
                     lambda v: int(v).to_bytes(F.NUM_BYTES, "little"))
        return MerkleTree.hash_row_host(b"".join(tb(v) for v in row_felts))

    def verify_row(self, F, root, index, row_felts, path):
        return MerkleTree.verify(root, index, self.hash_row(F, row_felts),
                                 path)


class _HostTreeHandle:
    """Adapts the host tree variants to the engine's (root, prove) surface
    with fixed 32-byte path entries."""

    def __init__(self, tree, root_bytes, path_fn):
        self._tree = tree
        self.root = root_bytes
        self._path_fn = path_fn

    def prove(self, index: int):
        return [self._path_fn(x) for x in self._tree.prove(index)]


def _digest32(x) -> bytes:
    if isinstance(x, bytes):
        return x
    if isinstance(x, tuple):  # mixed digest ("high"|"low", value)
        return _digest32(x[1])
    return int(x).to_bytes(32, "big")


class EthVerifierScheme:
    """LeafVariant(MaskedKeccak256<20>) + Solidity coin (EthVerifierClaim)."""

    name = "eth"
    # 20-byte masked Keccak digests: 80-bit collision resistance
    COLLISION_RESISTANCE_BITS = 80

    def __init__(self):
        self.H = MaskedKeccak256HashFn(20)

    def prewarm(self, F):
        pass

    def make_coin(self, pub, options, trace_len):
        # Solidity coin seeds with the Keccak256 of the canonical
        # public-input element serialization (src/lib.rs:145-156)
        aux = CairoAuxInput(pub)
        seed = keccak256(aux.serialize(CanonicalKeccak256HashFn))
        return SolidityVerifierPublicCoin(seed)

    def commit(self, F, lde_cols):
        if getattr(F, "IS_MONT", False):
            # device path: the raw digit arrays are already the Montgomery
            # representation the Keccak hash convention wants
            from ..merkle import MaskedKeccakMerkleTree
            return MaskedKeccakMerkleTree.from_mont_word_columns(
                [F.to_mont_be_words(c) for c in lde_cols],
                n_unmasked=self.H.N_UNMASKED)
        rows = _rows_from_lde_cols(F, lde_cols)
        tree = LeafVariantMerkleTree.from_rows(self.H, rows)
        return _HostTreeHandle(tree, _digest32(tree.root), _digest32)

    def hash_row(self, F, row_felts) -> bytes:
        """Leaf digest: masked-Keccak element hash; single-column trees use
        the unhashed (raw felt) leaf variant."""
        if len(row_felts) == 1:
            return int(row_felts[0]).to_bytes(32, "big")
        return self.H.hash_elements(row_felts)

    def verify_row(self, F, root, index, row_felts, path):
        return LeafVariantMerkleTree.verify_row(
            self.H, root, index, list(row_felts), list(path))


class CairoVerifierScheme:
    """FriendlyMerkleTree<22, Pedersen> + Cairo coin (CairoVerifierClaim)."""

    name = "cairo"
    # min(20-byte masked Blake2s rows/low layers = 80, Pedersen
    # COLLISION_RESISTANCE = 125 — crypto/src/hash/pedersen.rs:77)
    COLLISION_RESISTANCE_BITS = 80

    def __init__(self, n_friendly_layers: int = N_FRIENDLY_LAYERS):
        self.n_friendly = n_friendly_layers

    def prewarm(self, F):
        """Device Pedersen window tables: built in a clean HBM arena (the
        16-bit combine's transients OOM in a fragmented one mid-prove)."""
        if getattr(F, "IS_MONT", False):
            from ..merkle import _use_device_pedersen
            if _use_device_pedersen():
                from ..hashing.pedersen_tpu import prewarm_tables
                prewarm_tables(F)

    def make_coin(self, pub, options, trace_len):
        # Cairo coin seeds with the Blake2s of the element stream under
        # the Pedersen page hash (src/lib.rs:157-167)
        aux = CairoAuxInput(pub)
        seed = blake2s256(aux.serialize(PedersenHashFn))
        return CairoVerifierPublicCoin(seed)

    def commit(self, F, lde_cols):
        if getattr(F, "IS_MONT", False):
            from ..merkle import FriendlyMerkleTreeFast
            from .. import native
            if native.available():
                if len(lde_cols) > 1:
                    return FriendlyMerkleTreeFast.from_mont_word_columns(
                        F, [F.to_mont_be_words(c) for c in lde_cols],
                        self.n_friendly)
                return FriendlyMerkleTreeFast.from_felt_column(
                    F, lde_cols[0], self.n_friendly)
        rows = _rows_from_lde_cols(F, lde_cols)
        tree = FriendlyMerkleTree.from_rows(self.n_friendly, rows)
        return _HostTreeHandle(tree, _digest32(tree.root), _digest32)

    def _tag(self, depth, height, single, raw32):
        """Reconstruct a node's mixed-digest tag from its depth: leaves are
        "low" row hashes (felts when single-column); an internal node at
        depth d (root = 0) came from a merge at d — algebraic iff
        d < n_friendly (mixed.rs:110-125)."""
        if single or (depth < height and depth < self.n_friendly):
            return ("high", int.from_bytes(raw32, "big"))
        return ("low", raw32)

    def hash_row(self, F, row_felts) -> bytes:
        """Leaf digest (32-byte wire form): masked-Blake2s row hash, or the
        raw felt big-endian for single-column (all-algebraic) trees."""
        if len(row_felts) == 1:
            return int(row_felts[0]).to_bytes(32, "big")
        return MaskedBlake2sHashFn(20).hash_elements(row_felts)

    def verify_row(self, F, root, index, row_felts, path):
        height = len(path)
        single = len(row_felts) == 1
        tree = FriendlyMerkleTree(self.n_friendly)
        tagged = [self._tag(height - lvl, height, single, sib)
                  for lvl, sib in enumerate(path)]
        troot = self._tag(0, height, single, root)
        return tree.verify_row(troot, index, list(row_felts), tagged)


SCHEMES = {
    "generic": GenericScheme,
    "eth": EthVerifierScheme,
    "cairo": CairoVerifierScheme,
}


def get_scheme(name_or_scheme):
    if name_or_scheme is None:
        return GenericScheme()
    if isinstance(name_or_scheme, str):
        return SCHEMES[name_or_scheme]()
    return name_or_scheme
