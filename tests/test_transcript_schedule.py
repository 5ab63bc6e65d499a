"""The Fiat–Shamir event schedule is FROZEN (PARITY.md "Fiat–Shamir event
schedule"): golden self-proof bytes + every transcript draw are pinned in
tests/data/self_{proof,transcript}_<scheme>.{bin,json}
(tools/gen_self_transcript.py).  Any change to the seed construction,
reseed/draw order, or encodings makes these fail loudly.
"""

import json
import os

import pytest

from sandstorm_tpu.binary.formats import AirPrivateInput, CairoWitness, Layout
from sandstorm_tpu.claims import CairoClaim
from sandstorm_tpu.fields.fp252 import Fp252
from sandstorm_tpu.runner.vm import (CairoVM, instr_assert_eq_imm,
                                     instr_jmp_rel_imm)
from sandstorm_tpu.stark.ark import parse_proof
from sandstorm_tpu.stark.transcript_replay import replay_transcript

DATA = os.path.join(os.path.dirname(__file__), "data")


def _tiny_claim(scheme):
    vm = CairoVM([instr_assert_eq_imm(), 10, instr_jmp_rel_imm(), 0],
                 Fp252.MODULUS)
    trace, mem = vm.run(16, initial_ap=6, extra_memory={5: 0})
    registers, memory = vm.to_witness_arrays(trace, mem)
    pub = vm.build_public_input(trace, mem, layout=Layout.PLAIN)
    witness = CairoWitness(
        air_private_input=AirPrivateInput("", "", [], [], [], [], [], []),
        register_states=registers, memory=memory)
    return CairoClaim(None, pub, field=Fp252, layout=Layout.PLAIN,
                      scheme=scheme), witness, pub


@pytest.mark.parametrize("scheme", ["generic", "eth", "cairo"])
def test_schedule_matches_frozen_vectors(scheme):
    """Replaying the coin over the pinned proof bytes reproduces every
    pinned draw — seed, challenge, alpha, z, betas, PoW, queries."""
    claim, _, pub = _tiny_claim(scheme)
    blob = open(os.path.join(DATA, f"self_proof_{scheme}.bin"), "rb").read()
    proof = parse_proof(blob, modulus=Fp252.MODULUS)
    want = json.load(open(os.path.join(DATA,
                                       f"self_transcript_{scheme}.json")))
    got = replay_transcript(Fp252, claim.air_config, pub, proof,
                            claim.scheme)
    assert got == want, f"Fiat-Shamir schedule drift ({scheme})"


@pytest.mark.parametrize("scheme", ["generic", "eth", "cairo"])
def test_pinned_proof_still_verifies(scheme):
    claim, _, pub = _tiny_claim(scheme)
    blob = open(os.path.join(DATA, f"self_proof_{scheme}.bin"), "rb").read()
    proof = parse_proof(blob, modulus=Fp252.MODULUS)
    assert claim.verify(proof, required_security_bits=0)
