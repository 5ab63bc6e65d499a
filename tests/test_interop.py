"""Differential verification of the reference's checked-in golden proof.

`bootloader-proof.bin` (despite the name, a recursive-layout proof of the
16384-step array-sum example — see PARITY.md "Reference proof-format
facts") is verified end-to-end by this repo's own field arithmetic, hash
functions, AIR constraint system, DEEP composition, and FRI fold: every
trace-tree Merkle opening, every FRI-layer opening, the DEEP codeword
consistency at all 40 queries, the full FRI walk, and the remainder
low-degree check.

The proof's Fiat-Shamir *schedule* predates the reference source as
checked in (its masked-Keccak recursive trees match neither of the current
recursive claims — claims.rs pairs recursive with unmasked Keccak or the
Pedersen friendly tree), so the transcript values (z, alpha_deep, betas,
query indices) were recovered algebraically from the proof bytes alone and
are pinned in tests/data/golden_recursive_transcript.json. Everything
downstream of the coin is checked cryptographically; the coin primitives
themselves are KAT'd bit-exact in tests/test_crypto.py.
"""

import copy
import json
import os

import pytest

from sandstorm_tpu.binary.formats import AirPublicInput
from sandstorm_tpu.fields.fp252 import Fp252
from sandstorm_tpu.layouts.recursive.air import RecursiveAirConfig
from sandstorm_tpu.stark.ark import parse_proof
from sandstorm_tpu.stark.verifier import verify_ark
from sandstorm_tpu.stark.scheme import get_scheme
from sandstorm_tpu.stark.verifier import VerificationError

REF = "/root/reference"
GOLDEN = os.path.join(REF, "bootloader-proof.bin")
PUB = os.path.join(REF, "example", "air-public-input.json")
VECTORS = os.path.join(os.path.dirname(__file__), "data",
                       "golden_recursive_transcript.json")

needs_ref = pytest.mark.skipif(not os.path.exists(GOLDEN),
                               reason="reference not mounted")


def _load():
    pub = AirPublicInput.from_json(json.load(open(PUB)))
    proof = parse_proof(open(GOLDEN, "rb").read())
    vec = json.load(open(VECTORS))
    transcript = {"z": vec["z"], "alpha_deep": vec["alpha_deep"],
                  "betas": vec["betas"], "queries": vec["queries"],
                  "challenges": None, "alpha_comp": None}
    return pub, proof, transcript


@needs_ref
def test_golden_proof_verifies_with_recovered_transcript():
    pub, proof, transcript = _load()
    assert verify_ark(Fp252, RecursiveAirConfig, pub, proof, get_scheme("eth"),
                      transcript=transcript)


@needs_ref
@pytest.mark.parametrize("mutate", [
    pytest.param(lambda p: p.fri_layers[0].values.__setitem__(3, 7),
                 id="fri-value"),
    pytest.param(lambda p: p.queries.base_values.__setitem__(0, 7),
                 id="trace-value"),
    pytest.param(lambda p: setattr(p.fri_layers[1], "commitment",
                                   bytes(32)), id="fri-commitment"),
    pytest.param(lambda p: p.fri_remainder.__setitem__(0, 7),
                 id="remainder-coeff"),
    pytest.param(lambda p: p.execution_ood_evals.__setitem__(16, 7),
                 id="ood-eval"),
])
def test_golden_proof_tamper_rejected(mutate):
    pub, proof, transcript = _load()
    bad = copy.deepcopy(proof)
    mutate(bad)
    with pytest.raises(VerificationError):
        verify_ark(Fp252, RecursiveAirConfig, pub, bad, get_scheme("eth"),
                   transcript=transcript)
