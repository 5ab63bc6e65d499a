"""Generate the frozen Fiat–Shamir schedule vectors (PARITY.md "Fiat–Shamir
event schedule"): for each scheme, prove a pinned tiny trace, store the
proof bytes and every transcript draw in tests/data/, so any schedule
drift fails tests/test_transcript_schedule.py loudly.

Run on CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/gen_self_transcript.py
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
from sandstorm_tpu import enable_compile_cache
enable_compile_cache()

from sandstorm_tpu.binary.formats import AirPrivateInput, CairoWitness, Layout
from sandstorm_tpu.claims import CairoClaim
from sandstorm_tpu.fields.fp252 import Fp252
from sandstorm_tpu.runner.vm import (CairoVM, instr_assert_eq_imm,
                                     instr_jmp_rel_imm)
from sandstorm_tpu.stark.ark import serialize_proof
from sandstorm_tpu.stark.options import ProofOptions
from sandstorm_tpu.stark.transcript_replay import replay_transcript

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def tiny_claim(scheme):
    vm = CairoVM([instr_assert_eq_imm(), 10, instr_jmp_rel_imm(), 0],
                 Fp252.MODULUS)
    trace, mem = vm.run(16, initial_ap=6, extra_memory={5: 0})
    registers, memory = vm.to_witness_arrays(trace, mem)
    pub = vm.build_public_input(trace, mem, layout=Layout.PLAIN)
    witness = CairoWitness(
        air_private_input=AirPrivateInput("", "", [], [], [], [], [], []),
        register_states=registers, memory=memory)
    claim = CairoClaim(None, pub, field=Fp252, layout=Layout.PLAIN,
                       scheme=scheme)
    return claim, witness, pub


def main():
    options = ProofOptions(num_queries=4, proof_of_work_bits=4)
    for scheme in ("generic", "eth", "cairo"):
        claim, witness, pub = tiny_claim(scheme)
        proof = claim.prove(witness, options)
        assert claim.verify(proof, required_security_bits=0)
        blob = serialize_proof(proof)
        with open(os.path.join(DATA, f"self_proof_{scheme}.bin"), "wb") as f:
            f.write(blob)
        draws = replay_transcript(Fp252, claim.air_config, pub, proof,
                                  claim.scheme)
        with open(os.path.join(DATA,
                               f"self_transcript_{scheme}.json"), "w") as f:
            json.dump(draws, f, indent=1)
        print(scheme, "ok:", len(blob), "bytes,",
              len(draws["challenges"]), "challenges")


if __name__ == "__main__":
    main()
