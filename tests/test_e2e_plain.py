"""End-to-end prove + verify on the plain layout with a VM-generated trace.

The reference's e2e flow is cairo-compile/cairo-run/prove/verify
(README.md:36-77); here the built-in mini runner generates the witness.
"""

import pytest

from sandstorm_tpu.binary.formats import AirPrivateInput, CairoWitness, Layout
from sandstorm_tpu.claims import CairoClaim
from sandstorm_tpu.fields.fp252 import Fp252
from sandstorm_tpu.runner.vm import (
    CairoVM, instr_assert_eq_imm, instr_jmp_rel_imm)
from sandstorm_tpu.stark.options import ProofOptions
from sandstorm_tpu.stark.proof import Proof
from sandstorm_tpu.stark.verifier import VerificationError


def _tiny_run(num_cycles=16):
    p = Fp252.MODULUS
    # [ap] = 10; ap++  then the proof-mode padding loop jmp rel 0
    words = [instr_assert_eq_imm(), 10, instr_jmp_rel_imm(), 0]
    vm = CairoVM(words, p)
    trace, mem = vm.run(num_cycles, initial_ap=6, extra_memory={5: 0})
    registers, memory = vm.to_witness_arrays(trace, mem)
    pub = vm.build_public_input(trace, mem, layout=Layout.PLAIN)
    witness = CairoWitness(
        air_private_input=AirPrivateInput("", "", [], [], [], [], [], []),
        register_states=registers, memory=memory)
    return pub, witness


OPTIONS = ProofOptions(num_queries=8, lde_blowup_factor=2,
                       proof_of_work_bits=8, fri_folding_factor=8,
                       fri_max_remainder_coeffs=16)


@pytest.fixture(scope="module")
def proof_and_claim():
    pub, witness = _tiny_run()
    claim = CairoClaim(None, pub, field=Fp252, layout=Layout.PLAIN)
    proof = claim.prove(witness, OPTIONS)
    return claim, proof


def test_prove_verify_roundtrip(proof_and_claim):
    claim, proof = proof_and_claim
    assert claim.verify(proof, required_security_bits=0)


def test_proof_serialization_roundtrip(proof_and_claim):
    claim, proof = proof_and_claim
    data = proof.to_bytes()
    restored = Proof.from_bytes(data)
    assert restored.to_bytes() == data
    assert claim.verify(restored, required_security_bits=0)


def test_tampered_proof_fails(proof_and_claim):
    claim, proof = proof_and_claim
    data = proof.to_bytes()
    bad = Proof.from_bytes(data)
    bad.oods_trace_values = list(bad.oods_trace_values)
    bad.oods_trace_values[0] = (bad.oods_trace_values[0] + 1) % Fp252.MODULUS
    with pytest.raises(VerificationError):
        claim.verify(bad, required_security_bits=0)

    bad2 = Proof.from_bytes(data)
    bad2.openings[0].base_row[0] = (bad2.openings[0].base_row[0] + 1) \
        % Fp252.MODULUS
    with pytest.raises(VerificationError):
        claim.verify(bad2, required_security_bits=0)


def test_prove_verify_goldilocks():
    """The Goldilocks plain-layout path (the reference's experimental_claims
    Goldilocks configuration, cli/src/main.rs:103-133) proves and verifies
    end-to-end; exercises the field-width-aware row hashing."""
    from sandstorm_tpu.fields.goldilocks import GL
    pub, witness = _tiny_run()
    claim = CairoClaim(None, pub, field=GL, layout=Layout.PLAIN)
    proof = claim.prove(witness, OPTIONS)
    assert claim.verify(proof, required_security_bits=0)


# -- adversarial tamper matrix ------------------------------------------------
# Every mutation below must be caught; each targets a distinct verifier
# check (transcript replay, PoW, Merkle paths, FRI walk, OODS identity,
# felt range validation).

P = Fp252.MODULUS


def _t_pow_nonce(p):
    p.pow_nonce ^= 1


def _t_base_root(p):
    p.base_root = bytes([p.base_root[0] ^ 1]) + p.base_root[1:]


def _t_fri_root(p):
    p.fri_roots = list(p.fri_roots)
    p.fri_roots[-1] = bytes([p.fri_roots[-1][0] ^ 1]) + p.fri_roots[-1][1:]


def _t_fri_row_value(p):
    p.openings[0].fri_rows[0][0] = (p.openings[0].fri_rows[0][0] + 1) % P


def _t_fri_rows_truncated(p):
    p.openings[0].fri_rows = p.openings[0].fri_rows[:-1]
    p.openings[0].fri_paths = p.openings[0].fri_paths[:-1]


def _t_fri_rows_reordered(p):
    rows = p.openings[0].fri_rows
    if len(rows) >= 2:
        rows[0], rows[1] = rows[1], rows[0]
    else:
        rows[0] = list(reversed(rows[0]))


def _t_fri_remainder(p):
    p.fri_remainder = list(p.fri_remainder)
    p.fri_remainder[0] = (p.fri_remainder[0] + 1) % P


def _t_fri_remainder_extended(p):
    # exceed fri_max_remainder_coeffs: degree-bound check must fire
    p.fri_remainder = list(p.fri_remainder) + [1] * (
        p.options.fri_max_remainder_coeffs + 1 - len(p.fri_remainder))


def _t_oods_comp_value(p):
    p.oods_comp_values = list(p.oods_comp_values)
    p.oods_comp_values[0] = (p.oods_comp_values[0] + 1) % P


def _t_out_of_range_felt(p):
    # non-canonical felt in an opening: must be rejected, not reduced
    p.openings[0].base_row[0] = p.openings[0].base_row[0] + P


def _t_merkle_path_node(p):
    path = p.openings[0].base_path
    path[0] = bytes([path[0][0] ^ 1]) + path[0][1:]


def _t_ext_row(p):
    if p.openings[0].ext_row:
        p.openings[0].ext_row[0] = (p.openings[0].ext_row[0] + 1) % P
    else:  # plain layout always has the permutation extension column
        raise AssertionError("expected extension columns")


def _t_comp_row(p):
    p.openings[0].comp_row[0] = (p.openings[0].comp_row[0] + 1) % P


def _t_trace_len(p):
    p.trace_len *= 2


TAMPERS = [
    _t_pow_nonce, _t_base_root, _t_fri_root, _t_fri_row_value,
    _t_fri_rows_truncated, _t_fri_rows_reordered, _t_fri_remainder,
    _t_fri_remainder_extended, _t_oods_comp_value, _t_out_of_range_felt,
    _t_merkle_path_node, _t_ext_row, _t_comp_row, _t_trace_len,
]


@pytest.mark.parametrize("tamper", TAMPERS, ids=lambda t: t.__name__[3:])
def test_tamper_matrix(proof_and_claim, tamper):
    claim, proof = proof_and_claim
    bad = Proof.from_bytes(proof.to_bytes())
    tamper(bad)
    with pytest.raises((VerificationError, ValueError, AssertionError,
                        IndexError, OverflowError)) as exc:
        claim.verify(bad, required_security_bits=0)
    # mutations must surface as typed verification errors, not crashes
    assert isinstance(exc.value, VerificationError), (
        f"{tamper.__name__}: raised {type(exc.value).__name__} "
        f"instead of VerificationError: {exc.value}")
