"""Field-arithmetic known-answer tests vs python-int ground truth.

Mirrors the reference's strategy of checking kernels against an independent
implementation (cf. /root/reference builtins/src/utils.rs tests); here the
oracle is python arbitrary-precision integers.
"""

import random

import numpy as np
import pytest

from sandstorm_tpu.fields.goldilocks import GL
from sandstorm_tpu.fields.fp252 import Fp252, R as FP252_R

N = 257  # deliberately not a power of two


def _rand_ints(rng, p, n):
    special = [0, 1, 2, p - 1, p - 2, (1 << 32) - 1, 1 << 32, (1 << 64) - 1]
    vals = [s % p for s in special]
    vals += [rng.randrange(p) for _ in range(n - len(vals))]
    return vals


@pytest.mark.parametrize("F", [GL, Fp252], ids=["goldilocks", "fp252"])
class TestField:
    def test_roundtrip(self, F):
        rng = random.Random(0)
        xs = _rand_ints(rng, F.MODULUS, N)
        arr = F.encode_ints(xs)
        assert F.decode_ints(arr) == xs

    def test_add_sub_neg(self, F):
        rng = random.Random(1)
        p = F.MODULUS
        xs = _rand_ints(rng, p, N)
        ys = list(reversed(xs))
        a, b = F.encode_ints(xs), F.encode_ints(ys)
        assert F.decode_ints(F.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
        assert F.decode_ints(F.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
        assert F.decode_ints(F.neg(a)) == [(-x) % p for x in xs]

    def test_mul(self, F):
        rng = random.Random(2)
        p = F.MODULUS
        xs = _rand_ints(rng, p, N)
        ys = _rand_ints(rng, p, N)
        rng.shuffle(ys)
        a, b = F.encode_ints(xs), F.encode_ints(ys)
        assert F.decode_ints(F.mul(a, b)) == [(x * y) % p for x, y in zip(xs, ys)]

    def test_pow_static(self, F):
        rng = random.Random(3)
        p = F.MODULUS
        xs = _rand_ints(rng, p, 17)
        a = F.encode_ints(xs)
        for e in [0, 1, 2, 3, 7, 65537]:
            assert F.decode_ints(F.pow_static(a, e)) == [pow(x, e, p) for x in xs]

    def test_inv(self, F):
        rng = random.Random(4)
        p = F.MODULUS
        xs = [x for x in _rand_ints(rng, p, 33) if x != 0]
        a = F.encode_ints(xs)
        assert F.decode_ints(F.inv(a)) == [pow(x, p - 2, p) for x in xs]

    def test_batch_inv(self, F):
        rng = random.Random(5)
        p = F.MODULUS
        xs = [rng.randrange(1, p) for _ in range(64)]
        a = F.encode_ints(xs)
        assert F.decode_ints(F.batch_inv(a)) == [pow(x, -1, p) for x in xs]

    def test_root_of_unity(self, F):
        p = F.MODULUS
        for log_order in [1, 4, 10]:
            order = 1 << log_order
            w = F.root_of_unity_int(order)
            assert pow(w, order, p) == 1
            assert pow(w, order // 2, p) != 1

    def test_broadcast_scalar(self, F):
        p = F.MODULUS
        xs = [123456789, 987654321, p - 5]
        a = F.encode_ints(xs)
        s = F.encode_int(7)
        assert F.decode_ints(F.mul(a, s)) == [(x * 7) % p for x in xs]


def test_goldilocks_generator():
    # 7 generates the multiplicative group of the Goldilocks field
    p = GL.MODULUS
    assert pow(7, (p - 1) // 2, p) == p - 1


def test_fp252_generator():
    p = Fp252.MODULUS
    assert pow(3, (p - 1) // 2, p) == p - 1


def test_fp252_montgomery_bytes():
    # to_bytes_words must produce the canonical LE byte encoding
    x = 0x1234567890ABCDEF_FEDCBA0987654321_0123456789ABCDEF_0FEDCBA987654321 % Fp252.MODULUS
    arr = Fp252.encode_ints([x])
    words = np.asarray(Fp252.to_bytes_words(arr))[0]
    got = b"".join(int(w).to_bytes(4, "little") for w in words)
    assert got == x.to_bytes(32, "little")


def test_goldilocks_bytes():
    x = 0x1122334455667788 % GL.MODULUS
    arr = GL.encode_ints([x])
    words = np.asarray(GL.to_bytes_words(arr))[0]
    got = b"".join(int(w).to_bytes(4, "little") for w in words)
    assert got == x.to_bytes(8, "little")
