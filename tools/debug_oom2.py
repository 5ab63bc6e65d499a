"""Bisect the prove OOM: sync the queue at commit boundaries."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from sandstorm_tpu import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
import sandstorm_tpu.merkle as merkle_mod
from sandstorm_tpu.binary.formats import Layout
from sandstorm_tpu.claims import CairoClaim
from sandstorm_tpu.examples import load_artifacts
from sandstorm_tpu.fields.fp252 import Fp252
from sandstorm_tpu.stark.options import ProofOptions

# monkeypatch: sync before + between pedersen ladder levels
import sandstorm_tpu.hashing.pedersen_tpu as ped

orig = ped.hash_pairs_digits
calls = [0]


orig_chunk = ped._combine_window_chunk


def traced_chunk(F, lo, hi):
    print("   chunk...", flush=True)
    out = orig_chunk(F, lo, hi)
    jax.device_get(jnp.ravel(out)[:1])
    print("   chunk ok", flush=True)
    return out


ped._combine_window_chunk = traced_chunk


def traced(F, a, b):
    calls[0] += 1
    tot = sum(x.size * x.dtype.itemsize for x in jax.live_arrays())
    print(f"  hash_pairs M={a.shape[0]} live={tot>>20}MB", flush=True)
    jax.device_get(jnp.ravel(a)[:1])  # drain queue first
    if "t16" not in ped._DEV:
        print("  building t16...", flush=True)
        ped._tables16_dev(F)
        jax.device_get(jnp.ravel(ped._DEV['t16'])[:1])
        print("  t16 built", flush=True)
    out = orig(F, a, b)
    jax.device_get(jnp.ravel(out)[:1])
    print("   ok", flush=True)
    return out


ped.hash_pairs_digits = traced
merkle_mod.hash_pairs_digits = traced  # if imported by name

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
    assert claim.verify(proof, required_security_bits=80)
    print("VERIFY OK")
except Exception as e:
    import traceback; traceback.print_exc(); print("FAILED FULL:", str(e))
