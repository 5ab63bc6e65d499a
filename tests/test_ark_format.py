"""Differential tests of the ark-CanonicalSerialize proof layout against
the reference's checked-in proof bytes (the golden vector demanded by
SURVEY.md §4: transcript-replay tests against reference-generated proofs).
"""

import os

import pytest

from sandstorm_tpu.stark.ark import parse_proof, serialize_proof

REF = "/root/reference"
GOLDEN = os.path.join(REF, "bootloader-proof.bin")
SAVED = os.path.join(REF, "example", "array-sum.proof.saved")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference not mounted")
def test_golden_proof_roundtrips_byte_identically():
    data = open(GOLDEN, "rb").read()
    proof = parse_proof(data)  # consumes every byte (asserts internally)
    assert serialize_proof(proof) == data


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference not mounted")
def test_golden_proof_structure():
    proof = parse_proof(open(GOLDEN, "rb").read())
    # ProofOptions::new(num_queries, blowup, pow_bits, fold, remainder)
    assert proof.options == (40, 2, 16, 8, 64)
    # 16384-step recursive-layout trace: trace_len = 16384 * 16
    assert proof.trace_len == 262144
    nq = proof.options[0]
    # recursive layout: 7 base + 3 extension columns, ce blowup 2
    assert len(proof.queries.base_values) == 7 * nq
    assert len(proof.queries.ext_values) == 3 * nq
    assert len(proof.queries.comp_values) == 2 * nq
    assert len(proof.composition_ood_evals) == 2
    # every query gets an independent path in each trace tree (N = 2^19)
    for views in (proof.queries.base_proofs, proof.queries.ext_proofs,
                  proof.queries.comp_proofs):
        assert len(views) == nq
        assert all(v.hashed and len(v.nodes) == 18 for v in views)
    # FRI: fold 8 from 2^19 with <=64 remainder coeffs -> 4 layers
    sizes = [1 << 16, 1 << 13, 1 << 10, 1 << 7]
    assert len(proof.fri_layers) == len(sizes)
    for layer, size in zip(proof.fri_layers, sizes):
        # per-layer rows/proofs dedupe as query indices collapse mod size
        assert len(layer.proofs) <= nq
        assert len(layer.values) == 8 * len(layer.proofs)
        expected_nodes = size.bit_length() - 1 - 1  # pair-hashed leaves
        assert all(len(v.nodes) == expected_nodes for v in layer.proofs)
    assert len(proof.fri_remainder) == 64
    # masked Keccak<20>: digests keep the 20 most-significant bytes
    for d in (proof.base_commitment, proof.ext_commitment,
              proof.comp_commitment):
        assert d[20:] == b"\x00" * 12


@pytest.mark.skipif(not os.path.exists(SAVED), reason="reference not mounted")
def test_saved_array_sum_proof_roundtrips():
    data = open(SAVED, "rb").read()
    proof = parse_proof(data)
    assert serialize_proof(proof) == data
