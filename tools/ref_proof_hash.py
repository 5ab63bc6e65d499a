"""Single-chip TPU proof hash of the recursive example at the reduced
options used by tests/test_parallel.py::test_mesh_prove_recursive_real_example
— paste the output into _RECURSIVE_PROOF_SHA256."""
import hashlib
import sys
sys.path.insert(0, "/root/repo")
from sandstorm_tpu import enable_compile_cache
enable_compile_cache()
from sandstorm_tpu.claims import CairoClaim
from sandstorm_tpu.examples import load_artifacts
from sandstorm_tpu.fields.fp252 import Fp252
from sandstorm_tpu.binary.formats import Layout
from sandstorm_tpu.stark.ark import serialize_proof
from sandstorm_tpu.stark.options import ProofOptions

ref = "/root/reference/example"
program, pub, witness = load_artifacts(
    ref + "/array-sum.json", ref + "/air-public-input.json",
    ref + "/air-private-input.json")
claim = CairoClaim(program, pub, field=Fp252, layout=Layout.RECURSIVE,
                   scheme="cairo")
options = ProofOptions(num_queries=4, proof_of_work_bits=4)
proof = claim.prove(witness, options)
assert claim.verify(proof, required_security_bits=0)
print("RECURSIVE-PROOF-SHA256:",
      hashlib.sha256(serialize_proof(proof)).hexdigest())
