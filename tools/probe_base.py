"""Decompose the 'base columns interpolated + extended' phase on the real
recursive example: trace build (host), upload/encode, intt, fwd NTT —
each step synced so the device queue drains.  Run on the TPU.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from sandstorm_tpu import enable_compile_cache
enable_compile_cache()
import numpy as np
import jax, jax.numpy as jnp

from sandstorm_tpu.examples import load_artifacts
from sandstorm_tpu.fields.fp252 import Fp252 as F
from sandstorm_tpu.binary.formats import Layout
from sandstorm_tpu.layouts.recursive.trace import RecursiveExecutionTrace

ref = "/root/reference/example"
t0 = time.time()
program, pub, witness = load_artifacts(
    f"{ref}/array-sum.json", f"{ref}/air-public-input.json",
    f"{ref}/air-private-input.json")
print(f"artifacts loaded          {time.time()-t0:7.3f}s")


def sync(x):
    jax.device_get(jnp.ravel(x)[:1])


for rep in range(2):
    t0 = time.time()
    trace = RecursiveExecutionTrace(F, program, pub, witness)
    print(f"trace build (host numpy)  {time.time()-t0:7.3f}s")

    t0 = time.time()
    cols = trace.base_columns()
    sync(cols[0])
    print(f"base_columns upload+mont  {time.time()-t0:7.3f}s")

    from sandstorm_tpu.stark.prover import _lde_and_coeffs_multi
    t0 = time.time()
    coeffs, ldes = _lde_and_coeffs_multi(F, cols, 2, F.GENERATOR)
    sync(ldes[0])
    print(f"intt+scale+fwd (batched)  {time.time()-t0:7.3f}s")

    # commit sub-steps (cairo scheme)
    from sandstorm_tpu.ntt.ntt_pallas import _dev
    from sandstorm_tpu.stark.fri import bitrev_perm
    N = ldes[0].shape[0]
    brev = _dev(("bitrev", N), lambda: bitrev_perm(N))
    t0 = time.time()
    rb = [jnp.take(ldes[i], brev, axis=0) for i in sorted(ldes)]
    sync(rb[-1])
    print(f"bitrev gather x7          {time.time()-t0:7.3f}s")

    t0 = time.time()
    words = [F.to_mont_be_words(c) for c in rb]
    sync(words[-1])
    print(f"to_mont_be_words x7       {time.time()-t0:7.3f}s")

    from sandstorm_tpu.hashing.blake2s import hash_rows
    t0 = time.time()
    leaves = hash_rows(words)
    # mask
    leaves = leaves.at[..., :3].set(0)
    sync(leaves)
    print(f"hash_rows+mask            {time.time()-t0:7.3f}s")

    from sandstorm_tpu.hashing.pedersen_tpu import (digest_words_to_digits,
                                                    hash_pairs_digits)
    from sandstorm_tpu.merkle import DEVICE_PEDERSEN_MIN_PAIRS
    t0 = time.time()
    cur = digest_words_to_digits(leaves)
    while cur.shape[0] // 2 >= DEVICE_PEDERSEN_MIN_PAIRS:
        cur = hash_pairs_digits(F, cur[0::2], cur[1::2])
    sync(cur)
    print(f"device pedersen ladder    {time.time()-t0:7.3f}s")
    print("---")
