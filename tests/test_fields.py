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


class TestGL3:
    """GF(p^3) cubic extension of Goldilocks (x^3 = 2): device kernels and
    the host Fq3S scalar vs an independent coordinate-wise int oracle.
    Reference capability: ministark's `Fq3: StarkExtensionOf<Fp>` fast-field
    configuration (cli/src/main.rs:104-133)."""

    def _oracle_mul(self, a, b):
        from sandstorm_tpu.fields.gl3 import unpack, pack, NR
        from sandstorm_tpu.fields.goldilocks import P
        a0, a1, a2 = unpack(a)
        b0, b1, b2 = unpack(b)
        c0 = (a0 * b0 + NR * (a1 * b2 + a2 * b1)) % P
        c1 = (a0 * b1 + a1 * b0 + NR * a2 * b2) % P
        c2 = (a0 * b2 + a1 * b1 + a2 * b0) % P
        return pack(c0, c1, c2)

    def test_irreducibility(self):
        # x^3 - 2 is irreducible over GF(p) iff 2 is a non-cube
        from sandstorm_tpu.fields.gl3 import NR
        from sandstorm_tpu.fields.goldilocks import P
        assert (P - 1) % 3 == 0
        assert pow(NR, (P - 1) // 3, P) != 1

    def test_scalar_mul_inv_pow(self):
        from sandstorm_tpu.fields.gl3 import Fq3S, Q
        rng = random.Random(7)
        for _ in range(20):
            a, b = rng.randrange(Q), rng.randrange(Q)
            assert int(Fq3S.from_packed(a) * Fq3S.from_packed(b)) \
                == self._oracle_mul(a, b)
        for _ in range(10):
            a = rng.randrange(1, Q)
            s = Fq3S.from_packed(a)
            assert int(s * s.inv()) == 1
            # the generic Fermat exponent (MODULUS - 2) IS the inverse
            assert int(pow(s, Q - 2, Q)) == int(s.inv())

    def test_device_matches_scalar(self):
        from sandstorm_tpu.fields.gl3 import GL3, Fq3S, Q
        rng = random.Random(11)
        xs = [rng.randrange(Q) for _ in range(33)] + [0, 1, Q - 1]
        ys = [rng.randrange(Q) for _ in range(33)] + [Q - 1, 2, 1]
        a, b = GL3.encode_ints(xs), GL3.encode_ints(ys)
        assert GL3.decode_ints(GL3.mul(a, b)) == \
            [self._oracle_mul(x, y) for x, y in zip(xs, ys)]
        assert GL3.decode_ints(GL3.add(a, b)) == \
            [int(Fq3S.from_packed(x) + Fq3S.from_packed(y))
             for x, y in zip(xs, ys)]

    def test_device_inv_batch_inv(self):
        from sandstorm_tpu.fields.gl3 import GL3, Q
        rng = random.Random(13)
        xs = [rng.randrange(1, Q) for _ in range(16)]
        a = GL3.encode_ints(xs)
        prod = GL3.decode_ints(GL3.mul(a, GL3.inv(a)))
        assert prod == [1] * len(xs)
        prod = GL3.decode_ints(GL3.mul(a, GL3.batch_inv(a)))
        assert prod == [1] * len(xs)

    def test_base_embedding_and_hash_bytes(self):
        from sandstorm_tpu.fields.gl3 import GL3, Fq3S
        from sandstorm_tpu.fields.goldilocks import P
        # ints < P embed as coordinate 0; negative ints are base-field
        assert int(Fq3S(5) * Fq3S(-1)) == P - 5
        assert GL3.s(P - 1) == Fq3S(P - 1)
        v = 3 + 5 * P + 7 * P * P
        assert GL3.to_hash_bytes_int(v) == (
            (3).to_bytes(8, "little") + (5).to_bytes(8, "little")
            + (7).to_bytes(8, "little"))
