"""Reproduce the bench OOM and dump live device buffer sizes."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from sandstorm_tpu import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
from sandstorm_tpu.binary.formats import Layout
from sandstorm_tpu.claims import CairoClaim
from sandstorm_tpu.examples import load_artifacts
from sandstorm_tpu.fields.fp252 import Fp252
from sandstorm_tpu.stark.options import ProofOptions

ref = "/root/reference/example"
program, pub, witness = load_artifacts(
    os.path.join(ref, "array-sum.json"),
    os.path.join(ref, "air-public-input.json"),
    os.path.join(ref, "air-private-input.json"))
claim = CairoClaim(program, pub, field=Fp252, layout=Layout.RECURSIVE,
                   scheme="cairo")
try:
    proof = claim.prove(witness, ProofOptions())
    print("PROVE OK")
except Exception as e:
    print("FAILED:", str(e)[:200])
    arrs = jax.live_arrays()
    tot = 0
    by_shape = {}
    for a in arrs:
        sz = a.size * a.dtype.itemsize
        tot += sz
        key = (str(a.shape), str(a.dtype))
        by_shape[key] = by_shape.get(key, [0, 0])
        by_shape[key][0] += 1
        by_shape[key][1] += sz
    print(f"live arrays: {len(arrs)}, total {tot/(1<<20):.0f} MB")
    for k, (cnt, sz) in sorted(by_shape.items(), key=lambda x: -x[1][1])[:20]:
        print(f"  {cnt:4d} x {k}  {sz/(1<<20):.1f} MB")
