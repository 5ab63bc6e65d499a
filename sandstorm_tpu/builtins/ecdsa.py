"""ECDSA builtin: full signature-verification witness.

Semantics parity with /root/reference builtins/src/ecdsa/mod.rs: pubkey
recovery from x, 256-step EC multiply-add traces for z*G (250 doublings
cap), r*Q and w*B with B = zG + rQ, doubling steps, scalar inverses, and
r = x(wB - shift) extraction; `mimic_ec_mad_air` errors exactly when the
AIR would; dummy instances (privkey = 1) are memoized.
"""

import dataclasses
import functools

from . import curve, pedersen
from .curve import (P, FR, GENERATOR, ec_add, ec_double, ec_neg,
                    calculate_slope, ec_mul, recover_y)


def shift_point():
    return pedersen.shift_and_table_points()[0]


@dataclasses.dataclass
class EcMadPartialStep:
    partial_sum: tuple
    fixed_point: tuple
    suffix: int
    slope: int
    x_diff_inv: int


@dataclasses.dataclass
class DoublingStep:
    point: tuple
    slope: int


def doubling_steps(num_steps: int, p):
    out = []
    for _ in range(num_steps):
        out.append(DoublingStep(point=p, slope=calculate_slope(p, p)))
        p = ec_double(p)
    return out


def mimic_ec_mad_air(m: int, point, shift):
    """shift + m * point with the AIR's exact failure modes
    (ecdsa/mod.rs:306-331): fails when a partial sum shares an x-coordinate
    with the addend, or m has 0 or >= 252 bits."""
    if not (1 <= m.bit_length() < 252):
        return None
    partial = shift
    while m:
        if partial[0] == point[0]:
            return None
        if m & 1:
            partial = ec_add(partial, point)
        point = ec_double(point)
        m >>= 1
    return partial


def gen_ec_mad_steps(x: int, point, shift, max_point_doublings: int = 255):
    """256 EC multiply-add partial steps (ecdsa/mod.rs:167-205)."""
    assert 0 < x < (1 << 251)
    partial = shift
    res = []
    for i in range(256):
        suffix = x >> i
        bit = suffix & 1
        slope = 0
        nxt = partial
        if bit:
            slope = calculate_slope(point, partial)
            nxt = ec_add(partial, point)
        res.append(EcMadPartialStep(
            partial_sum=partial, fixed_point=point, suffix=suffix,
            slope=slope,
            x_diff_inv=pow(partial[0] - point[0], P - 2, P)))
        partial = nxt
        if i < max_point_doublings:
            point = ec_double(point)
    return res


def verify(msg_hash: int, r: int, s_inv_w: int, pubkey_x: int):
    """Verify with the AIR's formula x(w*(zG + rQ) - shift) == r; returns
    the recovered pubkey or None (ecdsa/mod.rs:275-304).

    s_inv_w: the signature's w = s^-1 (mod curve order).
    """
    w = s_inv_w
    y = recover_y(pubkey_x)
    if y is None:
        raise ValueError("pubkey_x not on the curve")
    shift = shift_point()
    for pubkey_y in (y, (-y) % P):
        pubkey = (pubkey_x, pubkey_y)
        zg = mimic_ec_mad_air(msg_hash, GENERATOR, ec_neg(shift))
        if zg is None:
            continue
        rq = mimic_ec_mad_air(r, pubkey, shift)
        if rq is None:
            continue
        b = ec_add(zg, rq)
        wb = mimic_ec_mad_air(w, b, shift)
        if wb is None:
            continue
        x = ec_add(wb, ec_neg(shift))[0]
        if r == x:
            return pubkey
    return None


@dataclasses.dataclass
class InstanceTrace:
    index: int
    pubkey_x: int
    message: int
    r: int
    w: int
    pubkey: tuple
    pubkey_doubling_steps: list
    w_inv: int
    r_inv: int
    r_point_slope: int
    r_point_x_diff_inv: int
    message_inv: int
    b: tuple
    b_slope: int
    b_x_diff_inv: int
    b_doubling_steps: list
    zg_steps: list
    rq_steps: list
    wb_steps: list

    @classmethod
    def new(cls, index: int, pubkey_x: int, message: int, r: int, w: int):
        pubkey = verify(message, r, w, pubkey_x)
        assert pubkey is not None, "signature is invalid"
        shift = shift_point()
        neg_shift = ec_neg(shift)

        zg = mimic_ec_mad_air(message, GENERATOR, neg_shift)
        rq = mimic_ec_mad_air(r, pubkey, shift)
        b = ec_add(zg, rq)
        b_slope = calculate_slope(zg, rq)
        b_x_diff_inv = pow(zg[0] - rq[0], P - 2, P)
        b_doubling_steps = doubling_steps(256, b)
        wb = mimic_ec_mad_air(w, b, shift)

        zg_steps = gen_ec_mad_steps(message, GENERATOR, neg_shift, 250)
        rq_steps = gen_ec_mad_steps(r, pubkey, shift, 255)
        wb_steps = gen_ec_mad_steps(w, b, shift, 255)
        # witness gen asserts the AIR will pass
        assert zg == zg_steps[-1].partial_sum
        assert rq == rq_steps[-1].partial_sum
        assert wb == wb_steps[-1].partial_sum

        r_point_slope = calculate_slope(wb, ec_neg(shift))
        r_point_x_diff_inv = pow(wb[0] - neg_shift[0], P - 2, P)
        assert r == ec_add(wb, neg_shift)[0]

        return cls(
            index=index, pubkey_x=pubkey_x, message=message, r=r, w=w,
            pubkey=pubkey,
            pubkey_doubling_steps=doubling_steps(256, pubkey),
            w_inv=pow(w, P - 2, P), r_inv=pow(r, P - 2, P),
            r_point_slope=r_point_slope,
            r_point_x_diff_inv=r_point_x_diff_inv,
            message_inv=pow(message, P - 2, P),
            b=b, b_slope=b_slope, b_x_diff_inv=b_x_diff_inv,
            b_doubling_steps=b_doubling_steps,
            zg_steps=zg_steps, rq_steps=rq_steps, wb_steps=wb_steps,
        )

    @classmethod
    def new_dummy(cls, index: int):
        t = _dummy_template()
        return dataclasses.replace(t, index=index)

    @classmethod
    def new_batch(cls, items):
        """items: list of (index, pubkey_x, message, r, w).

        Uses the native C++ batch generator (native/ecdsa.cpp: all
        instances advance their EC chains in lockstep, one Montgomery
        batch inversion per step) when available, falling back to the
        per-instance python path.  Semantics parity with `new` is tested
        differentially (tests/test_builtins.py)."""
        if not items:
            return []
        try:
            from .. import native
            if not native.ecdsa_available():
                raise OSError("native ecdsa unavailable")
        except Exception:
            return [cls.new(*it) for it in items]
        return _new_batch_native(cls, items)


def gen_dummy_instance():
    """Dummy signature with privkey = 1 (ecdsa/mod.rs:222-269)."""
    privkey = 1
    message = pedersen.pedersen_hash(1, 0)
    assert 0 < message < (1 << 251)
    k = 1
    while True:
        x = ec_mul(k, GENERATOR)[0]
        r = x
        if r == 0 or r >= (1 << 251):
            k += 1
            continue
        denom = (message + r * privkey) % FR
        if denom == 0:
            k += 1
            continue
        w = k * pow(denom, FR - 2, FR) % FR
        if w == 0 or w >= (1 << 251):
            k += 1
            continue
        pubkey_x = ec_mul(privkey, GENERATOR)[0]
        return pubkey_x, message, r, w


@functools.lru_cache(maxsize=1)
def _dummy_template():
    pubkey_x, message, r, w = gen_dummy_instance()
    return InstanceTrace.new_batch([(0, pubkey_x, message, r, w)])[0]


def _limbs_to_ints(a):
    """[..., 4] little-endian u64 limb array -> object ndarray of ints."""
    import numpy as np
    o = np.asarray(a, dtype=np.uint64).astype(object)
    return (o[..., 0] + (o[..., 1] << 64) + (o[..., 2] << 128)
            + (o[..., 3] << 192))


def _new_batch_native(cls, items):
    from .. import native
    k = len(items)
    pubx = [it[1] for it in items]
    msg = [it[2] for it in items]
    rr = [it[3] for it in items]
    ww = [it[4] for it in items]
    ys = []
    for x in pubx:
        y = recover_y(x)
        if y is None:
            raise ValueError("pubkey_x not on the curve")
        ys.append(y)
    out, status = native.ecdsa_witness_batch(msg, rr, ww, pubx, ys)
    # a wrong pubkey-y parity surfaces as a failed chain or an r mismatch:
    # retry those instances with the mirrored y (verify() tries both,
    # ecdsa/mod.rs:275-304)
    retry = [i for i in range(k) if status[i] != 0]
    if retry:
        out2, status2 = native.ecdsa_witness_batch(
            [msg[i] for i in retry], [rr[i] for i in retry],
            [ww[i] for i in retry], [pubx[i] for i in retry],
            [(-ys[i]) % P for i in retry])
        for j, i in enumerate(retry):
            assert status2[j] == 0, "signature is invalid"
            out[i] = out2[j]
            ys[i] = (-ys[i]) % P

    traces = []
    for i, (index, x, m, r, w) in enumerate(items):
        ints = _limbs_to_ints(out[i])

        def mad_steps(base, scalar):
            block = ints[base:base + 1536].reshape(256, 6)
            return [EcMadPartialStep(
                partial_sum=(b[0], b[1]), fixed_point=(b[2], b[3]),
                suffix=scalar >> step, slope=b[4], x_diff_inv=b[5])
                for step, b in enumerate(block)]

        def dbl_steps(base):
            block = ints[base:base + 768].reshape(256, 3)
            return [DoublingStep(point=(b[0], b[1]), slope=b[2])
                    for b in block]

        s = ints[6144:6160]
        zg_steps = mad_steps(0, m)
        rq_steps = mad_steps(1536, r)
        wb_steps = mad_steps(3072, w)
        # witness gen asserts the AIR will pass (mirrors `new`; the r
        # extraction check ran natively — status 0 above)
        assert (s[0], s[1]) == zg_steps[-1].partial_sum
        assert (s[2], s[3]) == rq_steps[-1].partial_sum
        assert (s[8], s[9]) == wb_steps[-1].partial_sum
        traces.append(cls(
            index=index, pubkey_x=x, message=m, r=r, w=w,
            pubkey=(x, ys[i]),
            pubkey_doubling_steps=dbl_steps(4608),
            w_inv=s[13], r_inv=s[14],
            r_point_slope=s[10], r_point_x_diff_inv=s[11],
            message_inv=s[15],
            b=(s[4], s[5]), b_slope=s[6], b_x_diff_inv=s[7],
            b_doubling_steps=dbl_steps(5376),
            zg_steps=zg_steps, rq_steps=rq_steps, wb_steps=wb_steps,
        ))
    return traces
