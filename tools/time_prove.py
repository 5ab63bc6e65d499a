"""Per-phase timing of the tiny plain-layout prove (CPU)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from sandstorm_tpu import enable_compile_cache
enable_compile_cache()

t0 = time.time()
from sandstorm_tpu.binary.formats import AirPrivateInput, CairoWitness, Layout
from sandstorm_tpu.claims import CairoClaim
from sandstorm_tpu.fields.fp252 import Fp252
from sandstorm_tpu.runner.vm import CairoVM, instr_assert_eq_imm, instr_jmp_rel_imm
from sandstorm_tpu.stark.options import ProofOptions
print(f"imports {time.time()-t0:.1f}s")

p = Fp252.MODULUS
words = [instr_assert_eq_imm(), 10, instr_jmp_rel_imm(), 0]
vm = CairoVM(words, p)
trace, mem = vm.run(16, initial_ap=6, extra_memory={5: 0})
registers, memory = vm.to_witness_arrays(trace, mem)
pub = vm.build_public_input(trace, mem, layout=Layout.PLAIN)
witness = CairoWitness(AirPrivateInput("", "", [], [], [], [], [], []),
                       registers, memory)
OPTIONS = ProofOptions(num_queries=8, lde_blowup_factor=2,
                       proof_of_work_bits=8, fri_folding_factor=8,
                       fri_max_remainder_coeffs=16)
claim = CairoClaim(None, pub, field=Fp252, layout=Layout.PLAIN)

# monkeypatch phase timers into the prover
import sandstorm_tpu.stark.prover as prover_mod
orig_evaluate = prover_mod.evaluate_lde
def timed_eval(*a, **k):
    t = time.time(); r = orig_evaluate(*a, **k)
    print(f"  evaluate_lde {time.time()-t:.1f}s"); return r
prover_mod.evaluate_lde = timed_eval

t0 = time.time()
proof = claim.prove(witness, OPTIONS)
print(f"prove total {time.time()-t0:.1f}s")
t0 = time.time()
assert claim.verify(proof, required_security_bits=0)
print(f"verify {time.time()-t0:.1f}s")
