"""Micro-bench the prove phases' device components at recursive scale.

Times each sub-step with a forced sync so the device queue drains; run
twice per step (compile warm) and report the second.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from sandstorm_tpu import enable_compile_cache
enable_compile_cache()
import numpy as np
import jax, jax.numpy as jnp
from sandstorm_tpu.fields.fp252 import Fp252 as F

N = 1 << 19
n = 1 << 18
C = 7


def sync(x):
    jax.device_get(jnp.ravel(x)[:1])


def t(label, fn, reps=3):
    fn_out = fn(); sync(fn_out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); out = fn(); sync(out)
        best = min(best, time.time() - t0)
    print(f"{label:55s} {best*1000:8.1f} ms")
    return out


cols = [jnp.broadcast_to(F.encode_int(3 + i), (n, 16)) for i in range(C)]
cols = [jnp.asarray(c) + 0 for c in cols]

# NTT paths
from sandstorm_tpu.ntt.ntt_pallas import batched_ntt_cols
t("intt 7 cols n=2^18 (batched four-step)", lambda: batched_ntt_cols(F, cols, True)[0])
big = [jnp.zeros((N, 16), jnp.uint32) + c[:1] for c in cols]
big = [jnp.concatenate([c, jnp.zeros((N - n, 16), jnp.uint32)]) for c in cols]
t("fwd ntt 7 cols N=2^19 (batched four-step)", lambda: batched_ntt_cols(F, big, False)[0])

# Commit path (cairo scheme: friendly tree)
from sandstorm_tpu.hashing.blake2s import hash_rows, hash_node_pairs
ldes = [jnp.broadcast_to(F.encode_int(7 + i), (N, 16)) + 0 for i in range(C)]
words = [F.to_mont_be_words(c) for c in ldes]
t("to_mont_be_words x7", lambda: [F.to_mont_be_words(c) for c in ldes][-1])
leaves = t("hash_rows (blake2s, 7 cols, 2^19 rows)", lambda: hash_rows(words))

def ladder(leaves, n_stop):
    cur = leaves
    while cur.shape[0] > n_stop:
        cur = hash_node_pairs(cur)
    return cur
bound = t("blake2s node ladder 2^19 -> 2^10", lambda: ladder(leaves, 1 << 10))

from sandstorm_tpu.hashing.pedersen_tpu import (digest_words_to_digits,
                                                hash_pairs_digits)
bdig = digest_words_to_digits(ladder(leaves, 1 << 19 >> 9))  # 2^10 rows
# device pedersen from 2^19-level boundary? In the real tree: boundary at
# depth 22 => friendly levels start at 2^19 size... check real config:
# tree has 2^19 leaves, height 19; n_friendly=22 > height so ALL levels
# algebraic? No wait — rows hashed blake, then max(height - 22, 0) = 0
# blake merge levels; boundary = leaves (2^19), all 19 merge levels are
# Pedersen! Measure the full device pedersen ladder 2^19 -> 2^10.
bdig_full = digest_words_to_digits(leaves)

def ped_ladder(cur):
    while cur.shape[0] // 2 >= (1 << 10):
        cur = hash_pairs_digits(F, cur[0::2], cur[1::2])
    return cur
t("device pedersen ladder 2^19 -> 2^10", lambda: ped_ladder(bdig_full))

from sandstorm_tpu.native import pedersen_hash_pairs, available
print("native available:", available())
from sandstorm_tpu.hashing.pedersen_tpu import digits_to_limbs_np
limbs = digits_to_limbs_np(np.asarray(jax.device_get(ped_ladder(bdig_full))))
t0 = time.time()
lv = limbs
while lv.shape[0] > 1:
    lv = pedersen_hash_pairs(lv[0::2], lv[1::2])
print(f"{'native pedersen top 2^10 -> 1':55s} {(time.time()-t0)*1000:8.1f} ms")

# FRI fold
from sandstorm_tpu.stark.fri import fri_fold_device
deep = jnp.broadcast_to(F.encode_int(5), (N, 16)) + 0
beta = F.encode_int(9)
t("fri fold 2^19 -> 2^16", lambda: fri_fold_device(F, deep, 3, N, 8, 9))

# constraint eval equivalent: ~93 constraints -> measured in bench (0.56s)
# DEEP scans
from sandstorm_tpu.stark.prover import _deep_den_scans
pts = jnp.stack([F.encode_int(11 + k) for k in range(8)])
x = jnp.broadcast_to(F.encode_int(13), (N, 16)) + 0
t("deep den scans K=8 over 2^19", lambda: _deep_den_scans(F, x, pts))
pts33 = jnp.stack([F.encode_int(11 + k) for k in range(33)])
t("deep den scans K=33 over 2^19", lambda: _deep_den_scans(F, x, pts33))

# batch_inv via Fermat inv: 252-step fori loop over [1,16] is latency
one = F.encode_int(1).reshape(1, 16)
t("Fermat inv of ONE element (fori 252)", lambda: F.inv(one))
t("batch_inv over 2^19", lambda: F.batch_inv(x, 0))
