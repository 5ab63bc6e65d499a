"""Diagnostic: verify an AIR's constraint quotients are genuine polynomials
on a built trace (the prover-side low-degree property), with per-constraint
bisection on failure.

Method: evaluate the composition over the CE (LDE) domain, interpolate the
values to coefficients, evaluate that polynomial at a random out-of-domain
point x0, and compare with the host big-int evaluation of the symbolic
constraints at x0 (using column-polynomial openings computed on device).
A mismatch means some constraint's numerator does not vanish on its
zerofier's support; the failing subset is then bisected.

Usage: python tools/check_air.py [recursive|plain]
"""

import os
import random
import sys
import time

sys.path.insert(0, "/root/repo")
# runs on the default backend — the real TPU when available
from sandstorm_tpu import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax.numpy as jnp

from sandstorm_tpu.air.expr import (LdeContext, IntContext, evaluate_lde,
                                    evaluate_int, trace_arguments)
from sandstorm_tpu.examples import load_artifacts
from sandstorm_tpu.fields.fp252 import Fp252 as F
from sandstorm_tpu.ntt import intt, powers, powers_host, field_sum
from sandstorm_tpu.stark.openings import open_columns
from sandstorm_tpu.stark.prover import _DomainCache, _lde_and_coeffs


GROUPS = {
    "recursive": [
        ("cpu", 0, 27), ("boundary", 27, 33), ("memory", 33, 41),
        ("rc16", 41, 47), ("diluted", 47, 54), ("pedersen", 54, 79),
        ("rc128", 79, 82), ("bitwise", 82, 93),
    ],
    "starknet": [
        ("cpu", 0, 27), ("boundary", 27, 33), ("memory", 33, 41),
        ("rc16", 41, 47), ("diluted", 47, 54), ("pedersen", 54, 79),
        ("rc128", 79, 82), ("ecdsa", 82, 123), ("bitwise", 123, 134),
        ("ec_op", 134, 167), ("poseidon", 167, 195),
    ],
}


def main():
    layout = sys.argv[1] if len(sys.argv) > 1 else "recursive"
    if layout == "recursive":
        program, pub, witness = load_artifacts(
            "/root/reference/example/array-sum.json",
            "/root/reference/example/air-public-input.json",
            "/root/reference/example/air-private-input.json",
            base_dir="/root/reference/example")
        from sandstorm_tpu.layouts.recursive import (
            RecursiveAirConfig as air, RecursiveExecutionTrace as trace_cls)
    else:
        program, pub, witness = load_artifacts(
            "/root/reference/example/bootloader/bootloader_compiled.json",
            "/root/reference/example/bootloader/air-public-input.json",
            "/root/reference/example/bootloader/air-private-input.json",
            base_dir="/root/reference/example/bootloader")
        from sandstorm_tpu.layouts.starknet import (
            StarknetAirConfig as air, StarknetExecutionTrace as trace_cls)
    t0 = time.time()
    trace = trace_cls(F, program, pub, witness)
    print(f"trace built in {time.time()-t0:.1f}s, len={trace.trace_len}")

    p = F.MODULUS
    n = trace.trace_len
    blowup = 2
    N = n * blowup
    coset = F.GENERATOR
    g = F.root_of_unity_int(n)
    dom = _DomainCache(F, N, coset)

    rng = random.Random(1234)
    challenges = [rng.randrange(1, p) for _ in range(air.NUM_CHALLENGES)]
    hints = air.gen_hints(n, pub, challenges, p)

    # phase 1: interpolate all columns (coeffs only — LDEs after openings
    # so the two never coexist at full residency)
    t0 = time.time()
    base_cols = trace.base_columns()
    ext_cols = trace.build_extension_columns(challenges)
    all_cols = {**base_cols, **ext_cols}
    coeffs = {}
    for i, col in all_cols.items():
        coeffs[i] = intt(F, col)
        coeffs[i].block_until_ready()
    all_cols.clear()
    trace._device_cols = None  # free the encoded trace columns
    print(f"interpolated in {time.time()-t0:.1f}s")

    constraints = air.constraints(n, p, g)
    targs = trace_arguments(constraints)
    pcs = air.periodic_columns(n)

    x0 = rng.randrange(1, p)
    # batched openings of every column poly at x0*g^off (one device call)
    t0 = time.time()
    openings, _ = open_columns(F, coeffs, targs, x0, g, n)
    print(f"openings at x0 in {time.time()-t0:.1f}s")

    # phase 2: coset LDEs, device-resident (10 cols x [N, 16] u32 fits —
    # chunked constraint evaluation keeps all intermediates at [B, L])
    import jax
    from sandstorm_tpu.ntt import coset_eval_from_coeffs
    from sandstorm_tpu.stark.prover import constraint_chunk_size
    t0 = time.time()
    ldes = {}
    for i in sorted(coeffs):
        ldes[i] = coset_eval_from_coeffs(F, coeffs[i], N, coset)
        ldes[i].block_until_ready()
        del coeffs[i]
        print(f"  col {i} LDE done {time.time()-t0:.1f}s")
    del all_cols
    periodic_values = [pc.eval_int(x0, p) for pc in pcs]
    ictx = IntContext(p, x0, openings, challenges, hints, periodic_values)
    host_vals = evaluate_int(constraints, ictx)

    def device_vals_at_x0(idxs):
        exprs = [constraints[i] for i in idxs]
        ctx = LdeContext(
            F, columns=ldes, blowup=blowup, domain_fn=dom.domain,
            x_pow_fn=dom.x_pow,
            challenges=[F.encode_int(c) for c in challenges],
            hints=[F.encode_int(h) for h in hints],
            periodic=[pc.lde_fn(F, dom) for pc in pcs],
            coset=coset)
        # random-weighted sum so one pass covers a whole subset
        weights = {i: rng.randrange(1, p) for i in idxs}

        def fold(acc, cv, k):
            w = F.encode_int(weights[idxs[k]])
            term = F.mul(cv, jnp.broadcast_to(w, cv.shape))
            return term if acc is None else F.add(acc, term)

        comb = evaluate_lde(exprs, ctx, domain_size=N, fold=fold,
                            chunk_size=constraint_chunk_size(F, N))
        cf = intt(F, comb)
        cf = F.mul(cf, powers_host(F, pow(coset, -1, p), N))
        vals, _ = open_columns(F, {0: cf}, [(0, 0)], x0, 1, N)
        expect = sum(weights[i] * host_vals[i] for i in idxs) % p
        return vals[(0, 0)], expect

    def hbm():
        try:
            s = jax.local_devices()[0].memory_stats()
            return f"{s.get('bytes_in_use', 0)/2**30:.2f}G in use"
        except Exception:
            return "?"

    def check(idxs, label):
        t0 = time.time()
        print(f"{label}: start, hbm {hbm()}", flush=True)
        got, expect = device_vals_at_x0(idxs)
        ok = got == expect
        print(f"{label}: {'OK' if ok else 'MISMATCH'} "
              f"({time.time()-t0:.1f}s, {len(idxs)} constraints, hbm {hbm()})")
        return ok

    groups = [(name, list(range(lo, hi)))
              for (name, lo, hi) in GROUPS[layout]]
    assert sorted(sum((g for _, g in groups), [])) == \
        list(range(len(constraints)))
    bad_groups = []
    for name, idxs in groups:
        if not check(idxs, name):
            bad_groups.append((name, idxs))
    if not bad_groups:
        print(f"ALL {layout.upper()} CONSTRAINTS LOW-DEGREE OK")
        return
    for name, idxs in bad_groups:
        for i in idxs:
            check([i], f"  {name} #{i}")


if __name__ == "__main__":
    main()
