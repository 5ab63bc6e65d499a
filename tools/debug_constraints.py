"""Localize failing plain-layout constraints on a VM-generated trace.

For each constraint: evaluate over the LDE domain, interpolate, evaluate the
interpolant at a random z, and compare with the symbolic (rational-function)
value at z computed from the trace polynomials' OODS values.  A clean
quotient matches; a mismatch pinpoints the broken constraint."""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import random
import jax.numpy as jnp
from sandstorm_tpu.binary.formats import AirPrivateInput, CairoWitness, Layout
from sandstorm_tpu.fields.fp252 import Fp252 as F
from sandstorm_tpu.runner.vm import CairoVM, instr_assert_eq_imm, instr_jmp_rel_imm
from sandstorm_tpu.layouts.plain.air import PlainAirConfig
from sandstorm_tpu.layouts.plain.trace import PlainExecutionTrace
from sandstorm_tpu.air.expr import (LdeContext, IntContext, evaluate_lde,
                                    evaluate_int, trace_arguments)
from sandstorm_tpu.ntt import intt, powers_host, field_sum, powers
import sandstorm_tpu.stark.prover as PR

p = F.MODULUS
words = [instr_assert_eq_imm(), 10, instr_jmp_rel_imm(), 0]
vm = CairoVM(words, p)
tracearr, mem = vm.run(16, initial_ap=6, extra_memory={5: 0})
registers, memory = vm.to_witness_arrays(tracearr, mem)
pub = vm.build_public_input(tracearr, mem, layout=Layout.PLAIN)
witness = CairoWitness(AirPrivateInput("","",[],[],[],[],[],[]), registers, memory)
tr = PlainExecutionTrace(F, None, pub, witness)

n = tr.trace_len; blowup = 2; N = n*blowup; coset = F.GENERATOR
g = F.root_of_unity_int(n)
rng = random.Random(99)
challenges = [rng.randrange(p) for _ in range(PlainAirConfig.NUM_CHALLENGES)]
hints = PlainAirConfig.gen_hints(n, pub, challenges, p)

base = tr.base_columns()
ext = tr.build_extension_columns(challenges)

# check terminals first
perm = ext[5]
mem_term = int(F.decode(perm[-2]))   # cell 2k at k=8n-1 -> index n-2
rc_term = int(F.decode(perm[n-4+1])) # last rc cell index 4(4n/4-1)+1 = n-3
print("mem terminal == hint:", mem_term == hints[4], flush=True)
print("rc terminal == 1:", rc_term == hints[5] == 1, flush=True)

dom = PR._DomainCache(F, N, coset)
all_cols = {}
all_coeffs = {}
for i, c in {**base, **ext}.items():
    cf, lde = PR._lde_and_coeffs(F, c, blowup, coset)
    all_cols[i] = lde; all_coeffs[i] = cf

constraints = PlainAirConfig.constraints(n, p, g)
ctx = LdeContext(F, all_cols, blowup, dom.domain, dom.x_pow,
                 [F.encode_int(c) for c in challenges],
                 [F.encode_int(h) for h in hints])
cvals = evaluate_lde(constraints, ctx, domain_size=N)

z = rng.randrange(p)
targs = trace_arguments(constraints)
zp = powers(F, F.encode_int(z), n)
tvals = {}
offs = sorted({o for (_, o) in targs})
for off in offs:
    gk = jnp.asarray(powers_host(F, pow(g, off % n, p), n))
    zo = F.mul(zp, gk)
    for (col, o) in targs:
        if o == off:
            tvals[(col, off)] = int(F.decode(field_sum(F, F.mul(all_coeffs[col], zo), axis=0)))

ictx = IntContext(p, z, tvals, challenges, hints)
sym = evaluate_int(constraints, ictx)

# interpolated values at z: iNTT constraint evals (they're on the coset)
cinv = powers_host(F, pow(coset, -1, p), N)
zpN = powers(F, F.encode_int(z), N)
bad = []
for i, cv in enumerate(cvals):
    cf = F.mul(intt(F, cv), jnp.asarray(cinv))
    val = int(F.decode(field_sum(F, F.mul(cf, zpN), axis=0)))
    ok = val == sym[i]
    if not ok:
        bad.append(i)
    print(f"constraint {i:2d}: {'OK' if ok else 'FAIL'}", flush=True)
print("BAD:", bad)
