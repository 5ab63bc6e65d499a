"""Verify + time the 16-bit-window device Pedersen against the native CPU
batch (and the reference KAT via crypto.hashes)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["SANDSTORM_TPU_PEDERSEN_W16"] = "1"
from sandstorm_tpu import enable_compile_cache
enable_compile_cache()
import numpy as np
import jax, jax.numpy as jnp
from sandstorm_tpu.fields.fp252 import Fp252 as F
from sandstorm_tpu.hashing.pedersen_tpu import (_tables16_dev, hash_pairs_digits,
                                                digits_to_limbs_np)
from sandstorm_tpu.native import pedersen_hash_pairs
from sandstorm_tpu.builtins.pedersen import pedersen_hash

print("backend:", jax.default_backend())
t0 = time.time()
_tables16_dev(F)
jax.device_get(jnp.ravel(_tables16_dev(F))[:1])
print(f"table16 build: {time.time()-t0:.2f}s")

rng = np.random.default_rng(0)
P = F.MODULUS
M = 4096
a_ints = [int.from_bytes(rng.bytes(31), "little") % P for _ in range(M)]
b_ints = [int.from_bytes(rng.bytes(31), "little") % P for _ in range(M)]

def to_digits(ints):
    buf = b"".join(int(x).to_bytes(32, "little") for x in ints)
    return jnp.asarray(np.frombuffer(buf, dtype="<u2").reshape(-1, 16)
                       .astype(np.uint32))

a_d, b_d = to_digits(a_ints), to_digits(b_ints)
out = hash_pairs_digits(F, a_d, b_d)
out_np = np.asarray(jax.device_get(out), dtype=np.uint64)
got = [sum(int(out_np[i, k]) << (16 * k) for k in range(16)) for i in range(M)]

# native comparison
lim = lambda ints: np.stack([np.frombuffer(int(v).to_bytes(32, "little"),
                                           dtype="<u8") for v in ints])
nat = pedersen_hash_pairs(lim(a_ints), lim(b_ints))
nat_ints = [int.from_bytes(r.tobytes(), "little") for r in nat]
assert got == nat_ints, "MISMATCH vs native"
assert got[0] == pedersen_hash(a_ints[0], b_ints[0]), "MISMATCH vs python"
print("correct on", M, "pairs")

# timing at tree scale
big_a = jnp.tile(a_d, (64, 1))[: 1 << 18]
big_b = jnp.tile(b_d, (64, 1))[: 1 << 18]

def ladder(a):
    cur = a
    while cur.shape[0] // 2 >= (1 << 10):
        cur = hash_pairs_digits(F, cur[0::2], cur[1::2])
    return cur

full = jnp.concatenate([big_a, big_b])[: 1 << 19]
r = ladder(full); jax.device_get(jnp.ravel(r)[:1])
t0 = time.time()
r = ladder(full); jax.device_get(jnp.ravel(r)[:1])
print(f"w16 pedersen ladder 2^19 -> 2^10: {(time.time()-t0)*1000:.1f} ms")
