"""Goldilocks prime field p = 2^64 - 2^32 + 1 as vectorized uint32-pair kernels.

The reference stack exposes this field as
``ministark_gpu::fields::p18446744069414584321`` (see /root/reference
cli/src/main.rs:104-110, where the Goldilocks path is dispatched).  Here it is
implemented TPU-natively: an element is a ``[..., 2]`` uint32 array
``(lo, hi)`` and every op is a branchless VPU-friendly expression.

Reduction uses the special form of p: 2^64 = 2^32 - 1 (mod p) and
2^96 = -1 (mod p).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .u32 import (
    U32, add32_carry, sub32_borrow, add64, sub64, mul64_wide, mul32_wide,
)

P = (1 << 64) - (1 << 32) + 1
P_LO = U32(1)
P_HI = U32(0xFFFFFFFF)
EPS = U32(0xFFFFFFFF)  # 2^32 - 1 = 2^64 mod p


class GL:
    """Goldilocks field over uint32-limb arrays of shape [..., 2] (lo, hi)."""

    NLIMBS = 2
    MODULUS = P
    BASE_MODULUS = P
    TWO_ADICITY = 32
    GENERATOR = 7
    NAME = "goldilocks"

    # -- host scalar hooks (identity for a base field) ----------------------

    @staticmethod
    def s(v):
        return int(v) % P

    @staticmethod
    def host_mul(a: int, b: int) -> int:
        return a * b % P

    @staticmethod
    def to_hash_bytes_int(v) -> bytes:
        return int(v).to_bytes(8, "little")

    # -- representation ----------------------------------------------------

    @staticmethod
    def zeros(shape=()):
        return jnp.zeros(tuple(shape) + (2,), dtype=U32)

    @classmethod
    def ones(cls, shape=()):
        return jnp.broadcast_to(cls.encode_int(1), tuple(shape) + (2,))

    @staticmethod
    def encode_int(x):
        """Python int -> canonical element array of shape [2]."""
        x = x % P
        return jnp.array([x & 0xFFFFFFFF, x >> 32], dtype=U32)

    @staticmethod
    def encode_ints_np(xs):
        """Iterable of python ints -> numpy [n, 2] uint32 array."""
        buf = b"".join((int(x) % P).to_bytes(8, "little") for x in xs)
        return np.frombuffer(buf, dtype="<u4").reshape(-1, 2).copy()

    @classmethod
    def encode_ints(cls, xs):
        return jnp.asarray(cls.encode_ints_np(xs))

    @staticmethod
    def encode_u64(arr):
        """numpy uint64 array -> [..., 2] uint32 array (values must be < p)."""
        arr = np.asarray(arr, dtype=np.uint64)
        out = np.empty(arr.shape + (2,), dtype=np.uint32)
        out[..., 0] = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        out[..., 1] = (arr >> np.uint64(32)).astype(np.uint32)
        return jnp.asarray(out)

    @classmethod
    def encode_canonical_u64(cls, arr):
        """numpy [..., 4] uint64 LE-word canonical values (the trace
        builders' field-agnostic store) -> device elements; Goldilocks
        values occupy word 0 only."""
        arr = np.asarray(arr, dtype=np.uint64)
        assert not arr[..., 1:].any(), "value exceeds the Goldilocks field"
        return cls.encode_u64(arr[..., 0])

    @staticmethod
    def to_canonical_dev(arr):
        return arr  # not a Montgomery representation

    @staticmethod
    def decode_np(a_np):
        a = np.asarray(a_np, dtype=np.uint64)
        return (a[..., 0] | (a[..., 1] << np.uint64(32)))

    @staticmethod
    def decode(arr):
        """[..., 2] uint32 array -> numpy object array of python ints."""
        return GL.decode_np(np.asarray(jax.device_get(arr)))

    @classmethod
    def decode_ints(cls, arr):
        flat = cls.decode(arr).ravel()
        return [int(v) for v in flat]

    # -- arithmetic --------------------------------------------------------

    @staticmethod
    def _cond_sub_p(lo, hi):
        """Subtract p once if (lo, hi) >= p; input must be < 2p (mod 2^64 ok)."""
        dlo, dhi, borrow = sub64(lo, hi, P_LO, P_HI)
        keep = borrow.astype(jnp.bool_)
        return jnp.where(keep, lo, dlo), jnp.where(keep, hi, dhi)

    @classmethod
    def add(cls, a, b):
        alo, ahi = a[..., 0], a[..., 1]
        blo, bhi = b[..., 0], b[..., 1]
        lo, hi, c = add64(alo, ahi, blo, bhi)
        # 2^64 = 2^32 - 1 (mod p): fold the carry back in (cannot re-overflow)
        lo, hi, _ = add64(lo, hi, c * EPS, jnp.zeros_like(c))
        lo, hi = cls._cond_sub_p(lo, hi)
        return jnp.stack([lo, hi], axis=-1)

    @staticmethod
    def sub(a, b):
        alo, ahi = a[..., 0], a[..., 1]
        blo, bhi = b[..., 0], b[..., 1]
        lo, hi, br = sub64(alo, ahi, blo, bhi)
        # -2^64 = -(2^32 - 1) (mod p): on borrow subtract 2^32-1 more
        lo, hi, _ = sub64(lo, hi, br * EPS, jnp.zeros_like(br))
        return jnp.stack([lo, hi], axis=-1)

    @classmethod
    def neg(cls, a):
        return cls.sub(jnp.zeros_like(a), a)

    @classmethod
    def reduce128(cls, w0, w1, w2, w3):
        """Reduce a 128-bit value (w0..w3 uint32 words, LE) mod p.

        Uses x = lo + hi_lo*2^64 + hi_hi*2^96 = lo + hi_lo*(2^32-1) - hi_hi.
        """
        hi_lo, hi_hi = w2, w3
        # t = lo - hi_hi  (64-bit, wrapping); on borrow subtract 2^32-1
        t_lo, t_hi, br = sub64(w0, w1, hi_hi, jnp.zeros_like(hi_hi))
        t_lo, t_hi, _ = sub64(t_lo, t_hi, br * EPS, jnp.zeros_like(br))
        # t1 = hi_lo * (2^32 - 1)
        t1_lo, t1_hi = mul32_wide(hi_lo, EPS)
        r_lo, r_hi, c = add64(t_lo, t_hi, t1_lo, t1_hi)
        r_lo, r_hi, _ = add64(r_lo, r_hi, c * EPS, jnp.zeros_like(c))
        r_lo, r_hi = cls._cond_sub_p(r_lo, r_hi)
        return jnp.stack([r_lo, r_hi], axis=-1)

    @classmethod
    def mul(cls, a, b):
        alo, ahi = a[..., 0], a[..., 1]
        blo, bhi = b[..., 0], b[..., 1]
        w0, w1, w2, w3 = mul64_wide(alo, ahi, blo, bhi)
        return cls.reduce128(w0, w1, w2, w3)

    @classmethod
    def sqr(cls, a):
        return cls.mul(a, a)

    @classmethod
    def mul_scalar(cls, a, s):
        """Multiply array by a python-int scalar."""
        return cls.mul(a, jnp.broadcast_to(cls.encode_int(s), a.shape))

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=-1)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=-1)

    # -- exponentiation / inversion ---------------------------------------

    @classmethod
    def pow_static(cls, a, e: int):
        """a^e for a static python-int exponent.

        Small exponents unroll square-and-multiply; larger ones fall back
        to the fori_loop kernel — XLA:CPU optimization time grows
        EXPONENTIALLY in the length of a chained-multiply graph (6 chained
        muls ~ 6s, 7 ~ 400s+), so deep unrolls must never reach it.
        """
        if e == 0:
            return cls.ones(a.shape[:-1])
        if e.bit_length() + bin(e).count("1") > 6:
            return cls.pow_bits_loop(a, e, e.bit_length())
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
    def pow_bits_loop(cls, a, e: int, nbits: int = 64):
        """a^e via an on-device fori_loop (small graph, sequential runtime).

        Use for one-off exponentiations with large exponents (e.g. inversion
        of a single element) where unrolling would bloat the graph.
        """
        bits = jnp.array([(e >> i) & 1 for i in range(nbits)], dtype=U32)
        one = cls.ones(a.shape[:-1])

        def body(i, carry):
            result, base = carry
            bit = bits[i]
            mul_res = cls.mul(result, base)
            result = jnp.where((bit == 1)[..., None], mul_res, result)
            base = cls.mul(base, base)
            return result, base

        result, _ = jax.lax.fori_loop(0, nbits, body, (one, a))
        return result

    @classmethod
    def inv(cls, a):
        """Batched modular inverse via Fermat (a^(p-2)); inv(0) = 0."""
        return cls.pow_bits_loop(a, P - 2, 64)

    @classmethod
    def batch_inv(cls, a, axis=0):
        """Montgomery batch inversion via two associative scans + one inv.

        All elements must be nonzero (zero poisons the whole batch).
        O(log n) depth of field muls instead of n sequential inversions.
        """
        from .scan import prefix_mul
        assert axis == 0
        n = a.shape[0]
        prefix = prefix_mul(cls, a)
        total_inv = cls.inv(prefix[n - 1:n])
        # suffix scan gives products a_i..a_{n-1}
        suffix = prefix_mul(cls, a, reverse=True)
        # inv_i = prefix_{i-1} * suffix_{i+1} * total_inv
        ones = cls.ones((1,) + a.shape[1:-1])
        prefix_shift = jnp.concatenate([ones, prefix[: n - 1]], axis=0)
        suffix_shift = jnp.concatenate([suffix[1:], ones], axis=0)
        t = cls.mul(prefix_shift, suffix_shift)
        return cls.mul(t, total_inv)

    # -- roots of unity ----------------------------------------------------

    @classmethod
    def root_of_unity_int(cls, order: int) -> int:
        assert order & (order - 1) == 0 and order <= (1 << cls.TWO_ADICITY)
        return pow(cls.GENERATOR, (P - 1) // order, P)

    @classmethod
    def root_of_unity(cls, order: int):
        return cls.encode_int(cls.root_of_unity_int(order))

    # -- Montgomery-domain interface (identity for Goldilocks) -------------

    IS_MONT = False

    @classmethod
    def encode(cls, ints):
        return cls.encode_ints(ints)

    @classmethod
    def to_bytes_words(cls, a):
        """Canonical little-endian u32 words for hashing: [..., 2]."""
        return a

    NUM_BYTES = 8


# jit-wrap the hot public ops (see _jit.py for rationale)
from ._jit import jit_class_ops as _jit_class_ops  # noqa: E402

_jit_class_ops(
    GL,
    ["add", "sub", "neg", "mul", "sqr", "inv", "reduce128"],
    static=[("pow_static", (1,)), ("pow_bits_loop", (1, 2)), ("batch_inv", (1,)),
            ("mul_scalar", (1,))],
)
