"""TPU validation of the fused Pallas EC mixed-add kernel.

Runs on the real chip (the 11-montmul chain makes interpret-mode /
XLA:CPU compile time explode, so this check cannot live in the CPU
pytest tier): the fused kernel must match the whole-array XLA madd
formula, and the full device Pedersen ladder must match the native C++
batch on random scalars.
"""
import sys
sys.path.insert(0, "/root/repo")
from sandstorm_tpu import enable_compile_cache
enable_compile_cache()

import random
import numpy as np
import jax
import jax.numpy as jnp

from sandstorm_tpu.fields.fp252 import Fp252 as F


def madd_xla(X, Y, Z, x2, y2, skip):
    Z1Z1 = F.sqr(Z)
    U2 = F.mul(x2, Z1Z1)
    S2 = F.mul(y2, F.mul(Z, Z1Z1))
    H = F.sub(U2, X)
    HH = F.sqr(H)
    I = F.add(F.add(HH, HH), F.add(HH, HH))
    J = F.mul(H, I)
    r = F.sub(S2, Y)
    r = F.add(r, r)
    V = F.mul(X, I)
    X3 = F.sub(F.sub(F.sqr(r), J), F.add(V, V))
    YJ = F.mul(Y, J)
    Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.add(YJ, YJ))
    Z3 = F.sub(F.sub(F.sqr(F.add(Z, H)), Z1Z1), HH)
    keep = skip[:, None]
    return (jnp.where(keep, X, X3), jnp.where(keep, Y, Y3),
            jnp.where(keep, Z, Z3))


def main():
    from sandstorm_tpu.fields.fp252_pallas import ec_madd_digitmajor
    rng = random.Random(11)
    M = 2048
    mk = lambda: F.encode_ints([rng.randrange(F.MODULUS) for _ in range(M)])
    X, Y, Z, x2, y2 = mk(), mk(), mk(), mk(), mk()
    skip = jnp.asarray(np.array([i % 5 == 0 for i in range(M)]))
    want = [np.asarray(jax.device_get(a))
            for a in madd_xla(X, Y, Z, x2, y2, skip)]
    got = ec_madd_digitmajor(X.T, Y.T, Z.T, x2.T, y2.T, skip)
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(jax.device_get(g)).T, w)
    print("ec_madd kernel == XLA formula: OK")

    # full ladder vs native C++ on a real-size level
    from sandstorm_tpu import native
    assert native.available()
    from sandstorm_tpu.hashing.pedersen_tpu import (digits_to_limbs_np,
                                                    hash_pairs_digits)
    av = [rng.getrandbits(251) for _ in range(2048)] + [0, 1]
    bv = [rng.getrandbits(251) for _ in range(2048)] + [0, (1 << 248) + 5]

    def to_digits(vals):
        return jnp.asarray(np.array(
            [[(v >> (16 * k)) & 0xFFFF for k in range(16)] for v in vals],
            dtype=np.uint32))

    got = digits_to_limbs_np(np.asarray(jax.device_get(
        hash_pairs_digits(F, to_digits(av), to_digits(bv)))))
    want = native.pedersen_hash_pairs(
        np.stack([native._int_to_limbs(v) for v in av]),
        np.stack([native._int_to_limbs(v) for v in bv]))
    assert np.array_equal(got, want)
    print("device pedersen (fused madd) == native batch: OK")


if __name__ == "__main__":
    main()
