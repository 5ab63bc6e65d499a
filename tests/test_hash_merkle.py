"""Blake2s device kernel vs hashlib; Merkle build/prove/verify roundtrip
(the reference's Merkle roundtrip tests live in crypto/src/merkle/mod.rs)."""

import hashlib
import random

import numpy as np
import jax.numpy as jnp

from sandstorm_tpu.hashing.blake2s import blake2s_words
from sandstorm_tpu.merkle import MerkleTree
from sandstorm_tpu.fields.fp252 import Fp252


def _words_to_bytes(words):
    return b"".join(int(w).to_bytes(4, "little") for w in words)


def test_blake2s_vs_hashlib():
    rng = random.Random(42)
    for nwords in [1, 8, 16, 17, 32, 40]:
        batch = 5
        data = np.array(
            [[rng.randrange(1 << 32) for _ in range(nwords)] for _ in range(batch)],
            dtype=np.uint32)
        got = np.asarray(blake2s_words(jnp.asarray(data)))
        for i in range(batch):
            msg = b"".join(int(w).to_bytes(4, "little") for w in data[i])
            expected = hashlib.blake2s(msg, digest_size=32).digest()
            assert _words_to_bytes(got[i]) == expected, f"nwords={nwords} row={i}"


def test_blake2s_empty():
    got = np.asarray(blake2s_words(jnp.zeros((1, 0), dtype=jnp.uint32)))
    assert _words_to_bytes(got[0]) == hashlib.blake2s(b"", digest_size=32).digest()


def test_merkle_roundtrip():
    rng = random.Random(7)
    n = 32
    p = Fp252.MODULUS
    col1 = Fp252.encode_ints([rng.randrange(p) for _ in range(n)])
    col2 = Fp252.encode_ints([rng.randrange(p) for _ in range(n)])
    words = [Fp252.to_bytes_words(col1), Fp252.to_bytes_words(col2)]
    tree = MerkleTree.from_matrix_columns(words)
    root = tree.root

    w1 = np.asarray(words[0])
    w2 = np.asarray(words[1])
    for idx in [0, 1, 13, 31]:
        row_bytes = _words_to_bytes(w1[idx]) + _words_to_bytes(w2[idx])
        leaf = MerkleTree.hash_row_host(row_bytes)
        path = tree.prove(idx)
        assert MerkleTree.verify(root, idx, leaf, path)
        # tampered leaf must fail
        bad = hashlib.blake2s(b"bad", digest_size=32).digest()
        assert not MerkleTree.verify(root, idx, bad, path)


def test_keccak256_vs_host():
    """Device Keccak-256 KAT against the host implementation (which is
    itself KAT'd against known Ethereum keccak vectors in test_crypto)."""
    from sandstorm_tpu.hashing.keccak import keccak256_words
    from sandstorm_tpu.crypto.hashes import keccak256
    rng = random.Random(11)
    for nwords in (1, 8, 16, 33, 34, 35, 68):
        rows = [[rng.randrange(1 << 32) for _ in range(nwords)]
                for _ in range(3)]
        got = np.asarray(keccak256_words(
            jnp.asarray(rows, dtype=jnp.uint32)))
        for r, row in enumerate(rows):
            data = b"".join(int(w).to_bytes(4, "little") for w in row)
            want = keccak256(data)
            have = b"".join(int(w).to_bytes(4, "little") for w in got[r])
            assert have == want, (nwords, r)


def test_device_pedersen_matches_native():
    """The TPU subset-sum (Jacobian windows) == the native C++ batch,
    including the zero-scalar and high-window edge cases."""
    from sandstorm_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native pedersen unavailable")
    from sandstorm_tpu.hashing.pedersen_tpu import (digits_to_limbs_np,
                                                    hash_pairs_digits)
    rng = random.Random(7)
    av = [rng.getrandbits(251) for _ in range(6)] + [0, 1]
    bv = [rng.getrandbits(251) for _ in range(6)] + [0, (1 << 248) + 5]

    def to_digits(vals):
        return jnp.asarray(np.array(
            [[(v >> (16 * k)) & 0xFFFF for k in range(16)] for v in vals],
            dtype=np.uint32))

    got = digits_to_limbs_np(np.asarray(
        hash_pairs_digits(Fp252, to_digits(av), to_digits(bv))))
    want = native.pedersen_hash_pairs(
        np.stack([native._int_to_limbs(v) for v in av]),
        np.stack([native._int_to_limbs(v) for v in bv]))
    assert np.array_equal(got, want)


def test_friendly_tree_device_path_matches_host(monkeypatch):
    """FriendlyMerkleTreeFast with the device pedersen levels produces the
    same root and query paths as the native-levels path."""
    from sandstorm_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native pedersen unavailable")
    from sandstorm_tpu import merkle as merkle_mod
    rng = random.Random(3)
    n, C = 64, 3
    cols = [Fp252.encode_ints([rng.getrandbits(251) for _ in range(n)])
            for _ in range(C)]
    words = [Fp252.to_mont_be_words(c) for c in cols]

    def build():
        return merkle_mod.FriendlyMerkleTreeFast.from_mont_word_columns(
            Fp252, words, n_friendly=22)

    monkeypatch.setenv("SANDSTORM_TPU_DEVICE_PEDERSEN", "0")
    ref = build()
    monkeypatch.setenv("SANDSTORM_TPU_DEVICE_PEDERSEN", "1")
    monkeypatch.setattr(merkle_mod, "DEVICE_PEDERSEN_MIN_PAIRS", 4)
    dev = build()
    assert dev._felt_dev, "device path not taken"
    assert dev.root == ref.root
    idx = [0, 1, 7, n - 1]
    assert dev.prove_batch(idx) == ref.prove_batch(idx)


def test_friendly_tree_single_column_device_matches_host(monkeypatch):
    """from_felt_column (single-column all-algebraic device tree) ==
    the host FriendlyMerkleTree on the same felts (root + paths)."""
    from sandstorm_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native pedersen unavailable")
    from sandstorm_tpu import merkle as merkle_mod
    from sandstorm_tpu.crypto.merkle_variants import FriendlyMerkleTree
    rng = random.Random(5)
    n = 32
    felts = [rng.getrandbits(251) for _ in range(n)]
    col = Fp252.encode_ints(felts)

    ref = FriendlyMerkleTree.from_rows(22, [[v] for v in felts])
    monkeypatch.setenv("SANDSTORM_TPU_DEVICE_PEDERSEN", "1")
    monkeypatch.setattr(merkle_mod, "DEVICE_PEDERSEN_MIN_PAIRS", 4)
    dev = merkle_mod.FriendlyMerkleTreeFast.from_felt_column(Fp252, col, 22)
    assert dev._felt_dev, "device path not taken"
    assert dev.root == int(ref.root[1]).to_bytes(32, "big")
    for i in (0, 5, n - 1):
        want = [int(x[1]).to_bytes(32, "big") for x in ref.prove(i)]
        assert dev.prove(i) == want
