"""Cubic extension of Goldilocks: GF(p^3) with p = 2^64 - 2^32 + 1.

The reference's fast-field configuration draws its verifier challenges,
OODS point, and DEEP/FRI randomness from a cubic extension
(`ministark_gpu::...::Fq3`, dispatched at /root/reference
cli/src/main.rs:104-133) because 64-bit draws give only ~2^-64 soundness
per challenge.  This is the TPU-native equivalent: elements are
``[..., 6]`` uint32 arrays (three Goldilocks coordinates, each a (lo, hi)
pair), and every op is built from the vectorized GL kernels.

Representation: a0 + a1*x + a2*x^2 with x^3 = 2 (x^3 - 2 is irreducible:
2^((p-1)/3) = 2^32 - 1 != 1).  At python-int boundaries an element is the
*packed* integer a0 + a1*p + a2*p^2 < p^3 — a bijection with GF(p^3), so a
uniform integer draw below p^3 is a uniform field element, and embedding a
base-field value is the identity on ints < p.

Host-side transcript math uses the `Fq3S` scalar (operator-overloaded so
the generic int evaluators work unchanged): `GL3.s(v)` wraps, `int(s)`
packs.  MODULUS is p^3, making the generic Fermat exponent (MODULUS - 2)
the true inverse exponent of GF(p^3); base-field (domain) exponentiations
must use BASE_MODULUS = p.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .goldilocks import GL, P, U32

NR = 2                       # x^3 = NR
OMEGA = pow(NR, (P - 1) // 3, P)      # = 2^32 - 1, primitive cube root of 1
OMEGA2 = OMEGA * OMEGA % P
Q = P ** 3


def pack(c0: int, c1: int, c2: int) -> int:
    return c0 % P + (c1 % P) * P + (c2 % P) * P * P


def unpack(v: int):
    v = int(v)
    assert 0 <= v < Q, "packed GL3 value out of range"
    c0 = v % P
    v //= P
    return c0, v % P, v // P


class Fq3S:
    """Host scalar over GF(p^3); interoperates with plain ints (which
    coerce as base-field elements — any int, reduced mod p)."""

    __slots__ = ("c",)

    def __init__(self, c0, c1=0, c2=0):
        self.c = (c0 % P, c1 % P, c2 % P)

    @classmethod
    def from_packed(cls, v):
        if isinstance(v, Fq3S):
            return v
        return cls(*unpack(v))

    @classmethod
    def _co(cls, x):
        if isinstance(x, Fq3S):
            return x
        return cls(int(x))

    def __int__(self):
        return pack(*self.c)

    def __add__(self, o):
        o = self._co(o)
        return Fq3S(*[a + b for a, b in zip(self.c, o.c)])

    __radd__ = __add__

    def __sub__(self, o):
        o = self._co(o)
        return Fq3S(*[a - b for a, b in zip(self.c, o.c)])

    def __rsub__(self, o):
        return self._co(o).__sub__(self)

    def __neg__(self):
        return Fq3S(*[-a for a in self.c])

    def __mul__(self, o):
        o = self._co(o)
        a0, a1, a2 = self.c
        b0, b1, b2 = o.c
        d0 = a0 * b0
        d1 = a0 * b1 + a1 * b0
        d2 = a0 * b2 + a1 * b1 + a2 * b0
        d3 = a1 * b2 + a2 * b1
        d4 = a2 * b2
        return Fq3S(d0 + NR * d3, d1 + NR * d4, d2)

    __rmul__ = __mul__

    def __mod__(self, m):
        # coordinates are kept canonical; the evaluators' `% MODULUS` is a
        # no-op on scalars
        return self

    def __pow__(self, e, mod=None):
        # `mod` is ignored: MODULUS - 2 == p^3 - 2 IS the field's Fermat
        # inverse exponent, so generic pow(x, p - 2, p) code stays correct
        e = int(e)
        assert e >= 0
        result = Fq3S(1)
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base * base
            e >>= 1
        return result

    def frob(self):
        """x -> x^p: coordinate scaling by the cube roots of unity."""
        a0, a1, a2 = self.c
        return Fq3S(a0, a1 * OMEGA, a2 * OMEGA2)

    def inv(self):
        t = self.frob() * self.frob().frob()      # x^(p + p^2)
        norm = (self * t).c
        assert norm[1] == 0 and norm[2] == 0, "norm not in the base field"
        return t * pow(norm[0], P - 2, P)

    def __eq__(self, o):
        return self.c == self._co(o).c

    def __hash__(self):
        return hash(self.c)

    def __repr__(self):
        return f"Fq3S{self.c}"


class GL3:
    """GF(p^3) over uint32-limb arrays of shape [..., 6]:
    (c0_lo, c0_hi, c1_lo, c1_hi, c2_lo, c2_hi)."""

    NLIMBS = 6
    MODULUS = Q              # field order: draws/Fermat exponents use this
    BASE_MODULUS = P         # domain (root-of-unity / coset) exponentiations
    TWO_ADICITY = GL.TWO_ADICITY
    GENERATOR = GL.GENERATOR  # LDE coset offset: a base-field generator
    NAME = "gl3"
    NUM_BYTES = 24
    IS_MONT = False
    EXT_DEGREE = 3
    XLA_FUSE_SAFE = False    # see the note above _jit discussion at EOF

    # -- host scalar hooks ---------------------------------------------------

    @staticmethod
    def s(v):
        """Wrap a packed int (or scalar) as a host field scalar.

        Negative ints carry base-field (integer mod p) semantics — packing
        only represents canonical elements — so they embed as coordinate 0.
        """
        if isinstance(v, Fq3S):
            return v
        v = int(v)
        if v < 0:
            return Fq3S(v)
        return Fq3S.from_packed(v)

    @staticmethod
    def host_mul(a: int, b: int) -> int:
        return int(Fq3S.from_packed(a) * Fq3S.from_packed(b))

    # -- representation ------------------------------------------------------

    @staticmethod
    def _c(a, i):
        return a[..., 2 * i:2 * i + 2]

    @staticmethod
    def _stack(c0, c1, c2):
        return jnp.concatenate([c0, c1, c2], axis=-1)

    @staticmethod
    def zeros(shape=()):
        return jnp.zeros(tuple(shape) + (6,), dtype=U32)

    @classmethod
    def ones(cls, shape=()):
        return jnp.broadcast_to(cls.encode_int(1), tuple(shape) + (6,))

    @staticmethod
    def _canon(x) -> int:
        """Packed canonical int of a host value; negative ints carry
        base-field (mod p) semantics, exactly like `s` — keeping the
        device and host encodings of e.g. Constant(-1) consistent."""
        if isinstance(x, Fq3S):
            return pack(*x.c)
        x = int(x)
        if x < 0:
            return pack(x % P, 0, 0)
        return x % Q

    @staticmethod
    def encode_int(x):
        return jnp.asarray(GL3.encode_ints_np([x])[0])

    @staticmethod
    def encode_ints_np(xs):
        xs = list(xs)
        out = np.empty((len(xs), 6), dtype=np.uint32)
        for i, x in enumerate(xs):
            c0, c1, c2 = unpack(GL3._canon(x))
            out[i, 0], out[i, 1] = c0 & 0xFFFFFFFF, c0 >> 32
            out[i, 2], out[i, 3] = c1 & 0xFFFFFFFF, c1 >> 32
            out[i, 4], out[i, 5] = c2 & 0xFFFFFFFF, c2 >> 32
        return out

    @classmethod
    def encode_ints(cls, xs):
        return jnp.asarray(cls.encode_ints_np(list(xs)))

    encode = encode_ints

    @classmethod
    def encode_canonical_u64(cls, arr):
        """Trace-builder store ([..., 4] u64 LE words, base-field values):
        embed into coordinate 0."""
        arr = np.asarray(arr, dtype=np.uint64)
        assert not arr[..., 1:].any(), "value exceeds the Goldilocks field"
        out = np.zeros(arr.shape[:-1] + (6,), dtype=np.uint32)
        out[..., 0] = (arr[..., 0] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        out[..., 1] = (arr[..., 0] >> np.uint64(32)).astype(np.uint32)
        return jnp.asarray(out)

    @staticmethod
    def to_canonical_dev(arr):
        return arr  # not a Montgomery representation

    @staticmethod
    def decode_np(a_np):
        a = np.asarray(a_np, dtype=np.uint64)
        c0 = a[..., 0] | (a[..., 1] << np.uint64(32))
        c1 = a[..., 2] | (a[..., 3] << np.uint64(32))
        c2 = a[..., 4] | (a[..., 5] << np.uint64(32))
        out = np.empty(c0.shape, dtype=object)
        it = np.nditer(c0, flags=["multi_index", "refs_ok"])
        for _ in it:
            k = it.multi_index
            out[k] = pack(int(c0[k]), int(c1[k]), int(c2[k]))
        return out

    @classmethod
    def decode(cls, arr):
        """[..., 6] -> numpy object array of packed python ints."""
        return cls.decode_np(np.asarray(jax.device_get(arr)))

    @classmethod
    def decode_ints(cls, arr):
        return [int(v) for v in cls.decode(arr).ravel()]

    # -- arithmetic ----------------------------------------------------------

    @classmethod
    def add(cls, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        s = a.shape[:-1]
        return GL.add(a.reshape(s + (3, 2)), b.reshape(s + (3, 2))
                      ).reshape(s + (6,))

    @classmethod
    def sub(cls, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        s = a.shape[:-1]
        return GL.sub(a.reshape(s + (3, 2)), b.reshape(s + (3, 2))
                      ).reshape(s + (6,))

    @classmethod
    def neg(cls, a):
        return cls.sub(jnp.zeros_like(a), a)

    @classmethod
    def mul(cls, a, b):
        a0, a1, a2 = cls._c(a, 0), cls._c(a, 1), cls._c(a, 2)
        b0, b1, b2 = cls._c(b, 0), cls._c(b, 1), cls._c(b, 2)
        M, A = GL.mul, GL.add
        d0 = M(a0, b0)
        d1 = A(M(a0, b1), M(a1, b0))
        d2 = A(A(M(a0, b2), M(a1, b1)), M(a2, b0))
        d3 = A(M(a1, b2), M(a2, b1))
        d4 = M(a2, b2)
        # reduce by x^3 = NR
        r0 = A(d0, GL.mul_scalar(d3, NR))
        r1 = A(d1, GL.mul_scalar(d4, NR))
        return cls._stack(r0, r1, d2)

    @classmethod
    def sqr(cls, a):
        return cls.mul(a, a)

    @classmethod
    def mul_scalar(cls, a, s: int):
        return cls.mul(a, jnp.broadcast_to(cls.encode_int(s), a.shape))

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=-1)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=-1)

    # -- exponentiation / inversion -------------------------------------------

    @classmethod
    def pow_static(cls, a, e: int):
        if e == 0:
            return cls.ones(a.shape[:-1])
        result = None
        base = a
        while e > 0:
            if e & 1:
                result = base if result is None else cls.mul(result, base)
            e >>= 1
            if e:
                base = cls.mul(base, base)
        return result

    @classmethod
    def frob(cls, a):
        """x -> x^p (coordinate scaling by cube roots of unity)."""
        c0, c1, c2 = cls._c(a, 0), cls._c(a, 1), cls._c(a, 2)
        return cls._stack(c0, GL.mul_scalar(c1, OMEGA),
                          GL.mul_scalar(c2, OMEGA2))

    @classmethod
    def inv(cls, a):
        """Norm-based inverse: 1/x = x^(p+p^2) / N(x), N(x) in GF(p)."""
        t = cls.mul(cls.frob(a), cls.frob(cls.frob(a)))   # x^(p + p^2)
        norm0 = cls._c(cls.mul(a, t), 0)                  # N(x), base field
        ninv = GL.inv(norm0)                              # [..., 2]
        lift = jnp.concatenate(
            [ninv, jnp.zeros(ninv.shape[:-1] + (4,), dtype=U32)], axis=-1)
        return cls.mul(t, lift)

    @classmethod
    def batch_inv(cls, a, axis=0):
        """Same prefix/suffix-scan trick as GL.batch_inv, over GF(p^3)."""
        from .scan import prefix_mul
        assert axis == 0
        n = a.shape[0]
        prefix = prefix_mul(cls, a)
        total_inv = cls.inv(prefix[n - 1:n])
        suffix = prefix_mul(cls, a, reverse=True)
        ones = cls.ones((1,) + a.shape[1:-1])
        prefix_shift = jnp.concatenate([ones, prefix[: n - 1]], axis=0)
        suffix_shift = jnp.concatenate([suffix[1:], ones], axis=0)
        t = cls.mul(prefix_shift, suffix_shift)
        return cls.mul(t, total_inv)

    # -- roots of unity (base-field domain) ------------------------------------

    @classmethod
    def root_of_unity_int(cls, order: int) -> int:
        return GL.root_of_unity_int(order)

    @classmethod
    def root_of_unity(cls, order: int):
        return cls.encode_int(cls.root_of_unity_int(order))

    @classmethod
    def to_bytes_words(cls, a):
        """Canonical LE u32 coordinate words for hashing: [..., 6]."""
        return a

    @staticmethod
    def to_hash_bytes_int(v) -> bytes:
        """Host mirror of the device leaf byte stream for one element:
        three 8-byte LE coordinates (NOT the packed int's own LE bytes)."""
        c0, c1, c2 = unpack(int(v))
        return (c0.to_bytes(8, "little") + c1.to_bytes(8, "little")
                + c2.to_bytes(8, "little"))


# NOTE: deliberately NOT jit-wrapped as whole class ops.  A fused GL3
# kernel (9 GL muls per extension mul, chained through batch_inv/scan
# bodies) sends XLA:CPU optimization time unbounded — the same
# exponential-in-chain-depth pathology fp252 documents in
# stark/prover.py:_deep_den_scans.  Composing the already-jitted GL
# kernels keeps every compiled graph small; inside lax.scan bodies the
# ops trace inline exactly once per stage, which is the intended shape.
