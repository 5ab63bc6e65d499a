"""KATs and roundtrips for the crypto layer (hashes, coins, Merkle variants).

The coin KATs are the reference's own checked-in vectors
(crypto/src/public_coin/solidity.rs:163-194, cairo.rs:176-209), so passing
them means bit-exact Fiat-Shamir protocol compatibility.
"""

import pytest

from sandstorm_tpu.crypto.hashes import (
    keccak256, Keccak256HashFn, MaskedKeccak256HashFn, Blake2sHashFn,
    MaskedBlake2sHashFn, PedersenHashFn, to_montgomery_bytes,
    from_montgomery_int, P)
from sandstorm_tpu.crypto.coins import (SolidityVerifierPublicCoin,
                                        CairoVerifierPublicCoin)
from sandstorm_tpu.crypto.merkle_variants import (LeafVariantMerkleTree,
                                                  FriendlyMerkleTree)


def test_keccak256_kats():
    # Ethereum-style Keccak-256 (original 0x01 padding)
    assert keccak256(b"").hex() == \
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert keccak256(b"abc").hex() == \
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    # multi-block (rate 136) input
    assert keccak256(b"a" * 200).hex() == keccak256(b"a" * 200).hex()


def test_montgomery_roundtrip():
    for v in (0, 1, 12345, P - 1):
        u = int.from_bytes(to_montgomery_bytes(v), "big")
        assert from_montgomery_int(u) == v


def test_solidity_coin_draw_matches_reference_vector():
    coin = SolidityVerifierPublicCoin(b"\x00" * 32)
    expected = [
        914053382091189896561965228399096618375831658573140010954888220151670628653,
        3496720894051083870907112578962849417100085660158534559258626637026506475074,
        1568281537905787801632546124130153362941104398120976544423901633300198530772,
        539395842685339476048032152056539303790683868668644006005689195830492067187,
    ]
    for e in expected:
        assert coin.draw_felt() == e


def test_cairo_coin_reseed_matches_reference_vector():
    seed = bytes([
        0x1f, 0x9c, 0x7b, 0xc9, 0xad, 0x41, 0xb8, 0xa6, 0x92, 0x36, 0x00,
        0x6e, 0x7e, 0xea, 0x80, 0x38, 0xae, 0xa4, 0x32, 0x96, 0x07, 0x41,
        0xb8, 0x19, 0x79, 0x16, 0x36, 0xf8, 0x2c, 0xc2, 0xd2, 0x5d])
    coin = CairoVerifierPublicCoin(seed)
    coin.reseed_with_bytes(
        (941210603170996043151108091873286171552595656949).to_bytes(32, "big"))
    assert coin.digest == bytes([
        0x60, 0x57, 0x79, 0xf6, 0xc9, 0xae, 0x87, 0x1e, 0xd7, 0x30, 0x56,
        0xb4, 0xeb, 0xaa, 0x61, 0xa7, 0x7e, 0x7f, 0xb5, 0x09, 0xbc, 0x08,
        0xc1, 0x93, 0xf1, 0x3a, 0xdc, 0xbf, 0x0c, 0x0b, 0xed, 0xc0])


def test_pow_grind_and_verify():
    coin = SolidityVerifierPublicCoin(b"\x11" * 32)
    nonce = coin.grind_proof_of_work(8)
    assert coin.verify_proof_of_work(nonce, 8)
    assert not coin.verify_proof_of_work(nonce + 1, 30)


def test_query_draws_deterministic_and_in_range():
    c1 = CairoVerifierPublicCoin(b"\x22" * 32)
    c2 = CairoVerifierPublicCoin(b"\x22" * 32)
    q1 = c1.draw_queries(65, 1 << 20)
    q2 = c2.draw_queries(65, 1 << 20)
    assert q1 == q2
    assert all(0 <= q < (1 << 20) for q in q1)
    assert q1 == sorted(set(q1))


def test_masked_hashes():
    mk = MaskedKeccak256HashFn(20)
    d = mk.hash(b"hello")
    assert d[20:] == b"\x00" * 12 and d[:20] != b"\x00" * 20
    mb = MaskedBlake2sHashFn(20)
    d = mb.hash(b"hello")
    assert d[:12] == b"\x00" * 12 and d[12:] != b"\x00" * 20


def test_leaf_variant_merkle_roundtrip():
    H = MaskedKeccak256HashFn(20)
    rows = [[i, i * 7 + 1, i + 12345] for i in range(8)]
    tree = LeafVariantMerkleTree.from_rows(H, rows)
    for idx in (0, 3, 7):
        path = tree.prove(idx)
        assert LeafVariantMerkleTree.verify_row(H, tree.root, idx,
                                                rows[idx], path)
        assert not LeafVariantMerkleTree.verify_row(H, tree.root, idx,
                                                    [9, 9, 9], path)
    # unhashed single-column variant
    rows1 = [[i * 31 + 5] for i in range(8)]
    tree1 = LeafVariantMerkleTree.from_rows(H, rows1)
    path = tree1.prove(2)
    assert LeafVariantMerkleTree.verify_row(H, tree1.root, 2, rows1[2], path)


@pytest.mark.parametrize("n_friendly", [0, 1, 2, 16])
def test_friendly_merkle_roundtrip(n_friendly):
    rows = [[i, i + 1] for i in range(8)]
    tree = FriendlyMerkleTree.from_rows(n_friendly, rows)
    kind, _ = tree.root
    # height-3 tree: root depth 0 is friendly iff n_friendly > 0
    assert kind == ("high" if n_friendly > 0 else "low")
    for idx in range(8):
        path = tree.prove(idx)
        assert tree.verify_row(tree.root, idx, rows[idx], path)
        assert not tree.verify_row(tree.root, idx, [1, 2], path) or \
            rows[idx] == [1, 2]


def test_friendly_merkle_single_column_algebraic():
    rows = [[i + 100] for i in range(4)]
    tree = FriendlyMerkleTree.from_rows(22, rows)
    kind, root_val = tree.root
    assert kind == "high"
    # manual: pedersen chain
    h01 = PedersenHashFn.merge(100, 101)
    h23 = PedersenHashFn.merge(102, 103)
    assert root_val == PedersenHashFn.merge(h01, h23)
    path = tree.prove(1)
    assert tree.verify_row(tree.root, 1, rows[1], path)
