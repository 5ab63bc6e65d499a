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
