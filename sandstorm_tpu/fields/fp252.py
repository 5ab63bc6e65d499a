"""The 252-bit Starkware prime field p = 2^251 + 17*2^192 + 1, TPU-native.

The reference stack exposes this field as
``ministark_gpu::fields::p3618502788666131213697322783095070105623107215331596699973092056135872020481``
(see /root/reference cli/src/main.rs:25-26).  Here an element is a
``[..., 16]`` uint32 array of sixteen 16-bit digits (little-endian), kept in
the Montgomery domain (R = 2^256) so multiplication is a single
digit-convolution + REDC.

Why 16-bit digits: TPU VPU lanes are 32-bit and there is no widening
multiply, so 16x16->32 partial products are the widest exact products
available.  The Starkware prime has only THREE nonzero base-2^16 digits
(d0 = 1, d12 = 17, d15 = 0x0800), which makes each Montgomery-REDC round
four multiply-adds instead of sixteen.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .u32 import U32, MASK16

P = (1 << 251) + 17 * (1 << 192) + 1
NDIGITS = 16
DIGIT_BITS = 16
R = (1 << 256) % P
R2 = (R * R) % P
# p ≡ 1 (mod 2^16)  =>  -p^{-1} ≡ -1 (mod 2^16): m = (-t0) mod 2^16


def _int_to_digits(x: int, n: int = NDIGITS):
    return [(x >> (16 * i)) & 0xFFFF for i in range(n)]


P_DIGITS = _int_to_digits(P)
assert P_DIGITS[0] == 1 and P_DIGITS[12] == 17 and P_DIGITS[15] == 0x0800
assert all(d == 0 for i, d in enumerate(P_DIGITS) if i not in (0, 12, 15))


def _use_pallas() -> bool:
    """True when the Pallas montmul kernel should carry multiplies.

    TPU only: the kernel is ~85x the XLA digit-minor path there
    (fp252_pallas.py); on CPU backends Pallas would need interpret mode,
    which is far slower than the XLA path.  Overridable for tests.
    """
    import os
    ov = os.environ.get("SANDSTORM_TPU_PALLAS")
    if ov is not None:
        return ov == "1"
    import jax
    return jax.default_backend() == "tpu"


def _unstack(a):
    """[..., 16] array -> list of 16 [...] digit arrays."""
    return [a[..., i] for i in range(a.shape[-1])]


def _stack(digits):
    return jnp.stack(digits, axis=-1)


def _carry_propagate(digits, nout=None):
    """Ripple-carry normalize a list of u32 'loose' digits (< 2^32) to < 2^16.

    Returns nout digits; asserts no overflow past the last digit is expected
    by the caller.
    """
    nout = nout if nout is not None else len(digits)
    out = []
    c = jnp.zeros_like(digits[0])
    for i in range(nout):
        v = (digits[i] if i < len(digits) else jnp.zeros_like(c)) + c
        out.append(v & MASK16)
        c = v >> 16
    return out, c


def _sub_p(digits):
    """digits(list of 16) - p -> (diff digits, borrow_out)."""
    out = []
    borrow = jnp.zeros_like(digits[0])
    for i in range(NDIGITS):
        pd = U32(P_DIGITS[i])
        v = digits[i] - pd - borrow
        out.append(v & MASK16)
        # borrow if digits[i] < pd + borrow; digits are < 2^16 so check sign
        # via the 17th bit of the wrapped subtraction
        borrow = (v >> 31)  # u32 wraparound => top bit set
    return out, borrow


def _add_p(digits):
    out = []
    c = jnp.zeros_like(digits[0])
    for i in range(NDIGITS):
        v = digits[i] + U32(P_DIGITS[i]) + c
        out.append(v & MASK16)
        c = v >> 16
    return out


def _cond_sub_p(digits):
    """Subtract p once if >= p (input < 2p)."""
    diff, borrow = _sub_p(digits)
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, d, dd) for d, dd in zip(digits, diff)]


def _dmul_loose(a, b):
    """16x16-digit product -> 32 'loose' digits (each < 2^21).

    Expressed as 16 shifted multiply-adds (one per digit of b): every
    temporary stays [..., 32] u32, so the peak working set is a few times
    the element size.  The earlier outer-product formulation materialized
    [..., 16, 16] intermediates — 16x the element size per temp — which
    blew HBM on multi-million-row arrays.  Carries are NOT propagated:
    _redc tolerates loose digits because digit i receives no further
    contributions once the REDC round reaches it.
    """
    batch = a.shape[:-1]
    z1 = jnp.zeros(batch + (1,), dtype=a.dtype)
    loose = jnp.zeros(batch + (2 * NDIGITS,), dtype=a.dtype)
    for j in range(NDIGITS):
        # contrib layout: slot 0 gets lo[0]; slot k gets lo[k] + hi[k-1].
        # Built with concatenations and a plain add ONLY — an .at[].add
        # static-slice update lowers to scatter-add, which both chokes
        # XLA:CPU's compiler and crashes the TPU remote-compile helper on
        # large fused graphs.
        prod = a * b[..., j:j + 1]
        lo = prod & MASK16
        hi = prod >> 16
        contrib = (jnp.concatenate([lo, z1], axis=-1)
                   + jnp.concatenate([z1, hi], axis=-1))  # [..., 17]
        pad_r = 2 * NDIGITS - NDIGITS - 1 - j
        padded = jnp.concatenate(
            ([jnp.zeros(batch + (j,), dtype=a.dtype)] if j else [])
            + [contrib]
            + ([jnp.zeros(batch + (pad_r,), dtype=a.dtype)] if pad_r else []),
            axis=-1)
        loose = loose + padded
    return loose  # [..., 32]


def _redc(t_loose):
    """Montgomery reduction of 32 loose digits (< 2^22): t/R mod p, < p.

    Exploits p's sparse base-2^16 digits (1, 17@12, 0x800@15): each round
    adds m*(1 + 17*2^192 + 2^251) shifted by the round index — four
    multiply-adds.  Round i only needs digit i fully accumulated, which
    holds because contributions land at offsets >= +12.

    The round loop is unrolled over ONE [..., 33] array; per-round
    contributions merge via zero-padded concatenation + add, never
    .at[].add — that static-slice update lowers to scatter-add, which
    chokes XLA:CPU's compiler and crashes the TPU remote-compile helper
    inside large fused graphs.
    """
    batch = t_loose.shape[:-1]
    width = 2 * NDIGITS + 1
    t = jnp.concatenate(
        [t_loose, jnp.zeros(batch + (1,), dtype=t_loose.dtype)], axis=-1)
    c = jnp.zeros(batch + (1,), dtype=t_loose.dtype)
    for i in range(NDIGITS):
        ti = t[..., i:i + 1] + c
        m = (jnp.zeros_like(ti) - ti) & MASK16  # (-t_i) mod 2^16
        c = (ti + m) >> 16
        m17 = m * U32(17)
        # contributions at offsets +12, +13, +15, +16 relative to i
        contrib = jnp.concatenate([
            m17 & MASK16, m17 >> 16, jnp.zeros_like(ti),
            (m << 11) & MASK16, m >> 5], axis=-1)  # [..., 5] at i+12..i+16
        pad_r = width - i - 17
        padded = jnp.concatenate(
            [jnp.zeros(batch + (i + 12,), dtype=t.dtype), contrib]
            + ([jnp.zeros(batch + (pad_r,), dtype=t.dtype)] if pad_r else []),
            axis=-1)
        t = t + padded
    # result = t[16..33] + carry c at digit 16
    digits = [t[..., 16 + i] for i in range(17)]
    digits[0] = digits[0] + c[..., 0]
    res, _ = _carry_propagate(digits, 17)
    # result < 2p < 2^253: digit 16 must be zero after propagation
    return _cond_sub_p(res[:NDIGITS])


class Fp252:
    """Starkware 252-bit field; elements are [..., 16] u32 digit arrays.

    Arithmetic operates in the Montgomery domain (R = 2^256).
    """

    NLIMBS = NDIGITS
    MODULUS = P
    BASE_MODULUS = P
    TWO_ADICITY = 192
    GENERATOR = 3
    NAME = "fp252"
    IS_MONT = True
    NUM_BYTES = 32

    # -- host scalar hooks (identity for a base field) ----------------------

    @staticmethod
    def s(v):
        return int(v) % P

    @staticmethod
    def host_mul(a: int, b: int) -> int:
        return a * b % P

    # -- representation ----------------------------------------------------

    @staticmethod
    def zeros(shape=()):
        return jnp.zeros(tuple(shape) + (NDIGITS,), dtype=U32)

    @classmethod
    def ones(cls, shape=()):
        return jnp.broadcast_to(cls.encode_int(1), tuple(shape) + (NDIGITS,))

    @classmethod
    def encode_int(cls, x: int):
        """Python int -> Montgomery-domain element of shape [16]."""
        mont = (int(x) % P) * R % P
        return jnp.array(_int_to_digits(mont), dtype=U32)

    @classmethod
    def encode_ints_np(cls, xs):
        """Iterable of python ints -> numpy [n, 16] Montgomery digit array.

        Bulk conversion via a single bytes buffer (fast for large tables).
        Numpy return type makes the result safe to cache across jit traces."""
        buf = b"".join(((int(x) % P) * R % P).to_bytes(32, "little")
                       for x in xs)
        n = len(buf) // 32
        return np.frombuffer(buf, dtype="<u2").reshape(n, 16).astype(np.uint32)

    @classmethod
    def encode_ints(cls, xs):
        return jnp.asarray(cls.encode_ints_np(xs))

    @classmethod
    def encode_canonical_u64(cls, arr):
        """numpy [..., 4] uint64 (LE 64-bit words, canonical) -> Montgomery digits.

        Uploads the packed 8-byte words and expands to 16-bit digits ON
        DEVICE: the tunneled host->device link runs at ~13MB/s, so sending
        the pre-expanded [., 16] u32 digits (2x the bytes) doubled the
        upload cost of every trace-column transfer.  The Montgomery-domain
        conversion is one device mul.
        """
        arr = np.ascontiguousarray(np.asarray(arr, dtype=np.uint64))
        words = jnp.asarray(arr.view("<u4"))  # [..., 8] u32, exact bytes
        return cls._expand_and_mont(words)

    @classmethod
    def encode_canonical_u64_many(cls, cols):
        """List of numpy [n, 4] u64 canonical columns -> list of Montgomery
        digit arrays, via ONE host->device transfer (the tunneled link
        rewards large transfers: ~13MB/s at 8MB vs ~38MB/s at 128MB)."""
        stacked = np.ascontiguousarray(
            np.stack([np.asarray(c, dtype=np.uint64) for c in cols]))
        words = jnp.asarray(stacked.view("<u4"))  # [C, n, 8]
        out = cls._expand_and_mont(words)
        return [out[i] for i in range(len(cols))]

    @classmethod
    def encode_canonical_mixed(cls, cols):
        """List of numpy [n, k_i] u64 canonical columns (k_i <= 4
        least-significant 64-bit words; dropped words must be zero) ->
        list of [n, 16] Montgomery digit arrays via ONE flat transfer.

        Most base trace columns hold narrow values (flag prefixes and
        range-check cells < 2^16, diluted pools < 2^62, addresses < 2^32) —
        uploading them at full felt width made the trace upload the single
        largest phase of a recursive-example prove (~2.2s of a ~8s prove
        through the ~25MB/s tunnel).  Callers trim trailing zero words
        host-side (np.any per word column: cheap); a column whose wide rows
        are SPARSE (e.g. the aux column's per-JNZ dst^-1 felts, or the npc
        column's occasional full-felt memory values among u64 addresses)
        ships as a 1-word base plus (index, full-row) exceptions that are
        scattered in on device."""
        parts, specs = [], []
        off = 0

        def put(arr_u32):
            nonlocal off
            parts.append(arr_u32.ravel())
            start = off
            off += arr_u32.size
            return start

        for c in cols:
            c = np.ascontiguousarray(np.asarray(c, dtype=np.uint64))
            n, k = c.shape
            while k > 1 and not c[:, k - 1].any():
                k -= 1
            wide = c[:, 1:k].any(axis=1) if k > 1 else None
            if k > 1 and wide.sum() <= n // 8:
                idx = np.nonzero(wide)[0].astype(np.uint32)
                full = np.ascontiguousarray(c[idx, :k]).view("<u4")
                base = np.ascontiguousarray(c[:, :1]).view("<u4")
                specs.append(("sparse", put(base), n, put(idx), put(full),
                              len(idx), k))
            else:
                dense = np.ascontiguousarray(c[:, :k]).view("<u4")
                specs.append(("dense", put(dense), n, k))
        flat = jnp.asarray(np.concatenate(parts)) if parts else jnp.zeros(
            (0,), dtype=U32)
        r2 = jnp.array(_int_to_digits(R2), dtype=U32)

        def expand(words, rows, k):
            w = words.reshape(rows, k * 2)
            lo = w & U32(0xFFFF)
            hi = w >> 16
            dig = jnp.stack([lo, hi], axis=-1).reshape(rows, 4 * k)
            if 4 * k < NDIGITS:
                dig = jnp.pad(dig, ((0, 0), (0, NDIGITS - 4 * k)))
            return dig

        out = []
        for spec in specs:
            if spec[0] == "dense":
                _, o, n, k = spec
                dig = expand(flat[o:o + n * k * 2], n, k)
            else:
                _, ob, n, oi, of, m, k = spec
                dig = expand(flat[ob:ob + n * 2], n, 1)
                if m:
                    idx = flat[oi:oi + m]
                    fdig = expand(flat[of:of + m * k * 2], m, k)
                    dig = dig.at[idx].set(fdig)
            out.append(cls._montmul(dig, jnp.broadcast_to(r2, dig.shape)))
        return out

    @classmethod
    def _expand_and_mont(cls, words):
        lo = words & U32(0xFFFF)
        hi = words >> 16
        canonical = jnp.stack([lo, hi], axis=-1) \
            .reshape(words.shape[:-1] + (NDIGITS,))
        r2 = jnp.array(_int_to_digits(R2), dtype=U32)
        return cls._montmul(canonical, jnp.broadcast_to(r2, canonical.shape))

    @classmethod
    def to_canonical_dev(cls, arr):
        """Device half of decode (Montgomery -> canonical digits)."""
        return cls.from_mont(arr)

    @staticmethod
    def decode_np(digs_np):
        """Host half of decode: canonical [..., 16] digits (numpy) ->
        object array of python ints."""
        digs = np.asarray(digs_np, dtype=np.uint64)
        out = np.zeros(digs.shape[:-1], dtype=object)
        for i in range(NDIGITS):
            out += digs[..., i].astype(object) << (16 * i)
        return out

    @classmethod
    def decode(cls, arr):
        """Montgomery digits -> numpy object array of python ints."""
        canonical = cls.to_canonical_dev(arr)
        return cls.decode_np(np.asarray(jax.device_get(canonical)))

    @classmethod
    def decode_ints(cls, arr):
        return [int(v) for v in cls.decode(arr).ravel()]

    @classmethod
    def from_mont(cls, a):
        """Montgomery -> canonical digits (i.e. multiply by R^-1)."""
        one = jnp.zeros(a.shape, dtype=U32).at[..., 0].set(1)
        return cls._montmul(a, one)

    @classmethod
    def to_mont_digits(cls, canonical):
        r2 = jnp.array(_int_to_digits(R2), dtype=U32)
        return cls._montmul(canonical, jnp.broadcast_to(r2, canonical.shape))

    # -- arithmetic --------------------------------------------------------

    @staticmethod
    def add(a, b):
        loose = [x + y for x, y in zip(_unstack(a), _unstack(b))]
        digits, carry = _carry_propagate(loose, NDIGITS)
        # a, b < p < 2^252 so the sum fits in 16 digits (no carry out)
        return _stack(_cond_sub_p(digits))

    @staticmethod
    def sub(a, b):
        ad, bd = _unstack(a), _unstack(b)
        out = []
        borrow = jnp.zeros_like(ad[0])
        for i in range(NDIGITS):
            v = ad[i] - bd[i] - borrow
            out.append(v & MASK16)
            borrow = v >> 31
        added = _add_p(out)
        wrapped = borrow.astype(jnp.bool_)
        return _stack([jnp.where(wrapped, x, y) for x, y in zip(added, out)])

    @classmethod
    def neg(cls, a):
        return cls.sub(jnp.zeros_like(a), a)

    @classmethod
    def _montmul(cls, a, b):
        if _use_pallas():
            from .fp252_pallas import montmul_rows
            return montmul_rows(a, b)
        return _stack(_redc(_dmul_loose(a, b)))

    @classmethod
    def mul(cls, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        return cls._montmul(a, b)

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

    # -- exponentiation / inversion ---------------------------------------

    @classmethod
    def pow_static(cls, a, e: int):
        """a^e for a static python-int exponent.

        Small exponents unroll square-and-multiply; larger ones fall back
        to the fori_loop kernel — XLA:CPU optimization time grows
        exponentially in the length of a chained-multiply graph, so deep
        unrolls must never reach the compiler.
        """
        if e == 0:
            return cls.ones(a.shape[:-1])
        if e.bit_length() + bin(e).count("1") > 8:
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
    def pow_bits_loop(cls, a, e: int, nbits: int = 252):
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
    def _inv_small(cls, a):
        """Fermat inverse for small arrays: 4-bit windows over p-2 with the
        fusable XLA digit multiply.

        The 252-step bit loop of pallas muls costs ~26ms wall for a SINGLE
        element (each iteration is a handful of tiny kernel launches);
        every batch_inv ends in exactly one such tiny inversion, and a
        prove makes dozens of batch_inv calls (zerofiers, permutation
        scans, Pedersen ladder levels, DEEP chunks).  63 window steps of
        five fused elementwise multiplies run in ~2ms.
        """
        def mul(x, y):
            return _stack(_redc(_dmul_loose(x, y)))

        # a^1..a^15 via scan (one mul in the graph: XLA:CPU compile time
        # explodes on long chained-multiply graphs, see pow_static)
        def tstep(prev, _):
            nxt = mul(prev, a)
            return nxt, nxt

        _, tbl_hi = jax.lax.scan(tstep, a, None, length=14)
        tbl = jnp.concatenate(
            [cls.ones(a.shape[:-1])[None], a[None], tbl_hi], axis=0)
        E = P - 2
        nibbles = [(E >> (4 * i)) & 0xF for i in range(63)][::-1]  # MSB first
        nib = jnp.array(nibbles, dtype=jnp.int32)
        acc = jnp.take(tbl, nibbles[0], axis=0)

        def body(i, acc):
            for _ in range(4):
                acc = mul(acc, acc)
            return mul(acc, jnp.take(tbl, nib[i], axis=0))

        return jax.lax.fori_loop(1, 63, body, acc)

    @classmethod
    def inv(cls, a):
        """Batched modular inverse via Fermat; inv(0) = 0.

        Small arrays take the windowed unrolled path on TPU only: XLA:CPU
        needs ~6 minutes to compile even its 4-deep squaring chain
        (SANDSTORM_TPU_INV_SMALL=0/1 overrides for testing).
        """
        import os
        n = 1
        for d in a.shape[:-1]:
            n *= d
        ov = os.environ.get("SANDSTORM_TPU_INV_SMALL")
        small_ok = (ov == "1" if ov is not None
                    else jax.default_backend() == "tpu")
        if n <= 128 and small_ok:
            return cls._inv_small(a)
        return cls.pow_bits_loop(a, P - 2, 252)

    @classmethod
    def batch_inv(cls, a, axis=0):
        """Montgomery batch inversion: two prefix scans + one inversion.

        Scans use the uniform-stage formulation (fields/scan.py) so the
        compiled graph is O(1) in n.
        """
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
        return cls.mul(t, jnp.broadcast_to(total_inv, t.shape))

    # -- roots of unity ----------------------------------------------------

    @classmethod
    def root_of_unity_int(cls, order: int) -> int:
        assert order & (order - 1) == 0 and order <= (1 << cls.TWO_ADICITY)
        return pow(cls.GENERATOR, (P - 1) // order, P)

    @classmethod
    def root_of_unity(cls, order: int):
        return cls.encode_int(cls.root_of_unity_int(order))

    @classmethod
    def encode(cls, ints):
        return cls.encode_ints(ints)

    @classmethod
    def to_bytes_words(cls, a):
        """Canonical little-endian u32 words for hashing: [..., 8].

        Packs pairs of 16-bit digits into u32 words; the result is exactly
        the canonical 32-byte little-endian encoding of the element.
        """
        canonical = cls.from_mont(a)
        lo = canonical[..., 0::2]
        hi = canonical[..., 1::2]
        return lo | (hi << 16)

    @classmethod
    def to_mont_be_words(cls, a):
        """Montgomery-form 32-byte BIG-endian stream as LE u32 words: [..., 8].

        The element's raw digit array IS its Montgomery representation
        (R = 2^256); this packs it as the byte stream produced by the
        reference's to_montgomery serialization (crypto/src/utils.rs) —
        the input convention of its Keccak256HashFn (hash/keccak.rs:50-57).
        """
        d = a  # [..., 16] 16-bit digits, little-endian digit order
        rev = d[..., ::-1]  # big-endian digit order
        # byte stream: each digit as 2 BE bytes; u32 word j = bytes 4j..4j+3 LE
        hi_d = rev[..., 0::2]  # digits at stream bytes 4j, 4j+1
        lo_d = rev[..., 1::2]  # digits at stream bytes 4j+2, 4j+3
        return ((hi_d >> 8) | ((hi_d & U32(0xFF)) << 8)
                | ((lo_d >> 8) << 16) | ((lo_d & U32(0xFF)) << 24))


# jit-wrap the hot public ops (see _jit.py for rationale)
from ._jit import jit_class_ops as _jit_class_ops  # noqa: E402

_jit_class_ops(
    Fp252,
    ["add", "sub", "neg", "mul", "sqr", "inv", "from_mont", "to_bytes_words",
     "to_mont_be_words", "to_mont_digits", "_montmul"],
    static=[("pow_static", (1,)), ("pow_bits_loop", (1, 2)), ("batch_inv", (1,)),
            ("mul_scalar", (1,))],
)
