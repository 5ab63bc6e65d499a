"""EC-op builtin: witness for r = p + m * q.

Semantics parity with /root/reference builtins/src/ec_op/mod.rs: 256
q-doubling steps + 256 MAD partial steps + m bit-unpacking flags; the
dummy instance (p = shift point, q = generator, m = 1) is memoized.
"""

import dataclasses
import functools

from . import pedersen
from .curve import P, GENERATOR, ec_add, ec_double, calculate_slope, is_on_curve
from .ecdsa import (EcMadPartialStep, DoublingStep, doubling_steps)


def mimic_ec_mad_air(m: int, q, p):
    """p + m * q with the AIR's exact failure modes (ec_op/mod.rs:139-161).

    Unlike the ECDSA variant this accepts any m in [0, 2^252)."""
    partial = p
    while m:
        if partial[0] == q[0]:
            return None
        if m & 1:
            partial = ec_add(partial, q)
        q = ec_double(q)
        m >>= 1
    return partial


def gen_ec_mad_steps(m: int, q, p):
    partial = p
    res = []
    for i in range(256):
        suffix = m >> i
        bit = suffix & 1
        slope = 0
        nxt = partial
        if bit:
            slope = calculate_slope(q, partial)
            nxt = ec_add(partial, q)
        res.append(EcMadPartialStep(
            partial_sum=partial, fixed_point=q, suffix=suffix, slope=slope,
            x_diff_inv=pow(partial[0] - q[0], P - 2, P)))
        partial = nxt
        q = ec_double(q)
    return res


@dataclasses.dataclass
class InstanceTrace:
    index: int
    p: tuple
    q: tuple
    m: int
    r: tuple
    q_doubling_steps: list
    r_steps: list
    m_bit251_and_bit196_and_bit192: bool
    m_bit251_and_bit196: bool

    @classmethod
    def new(cls, index: int, p_x: int, p_y: int, q_x: int, q_y: int, m: int):
        p, q = (p_x, p_y), (q_x, q_y)
        assert is_on_curve(p) and is_on_curve(q)
        q_doubling_steps = doubling_steps(256, q)
        r = mimic_ec_mad_air(m, q, p)
        assert r is not None, "EC op would fail in the AIR"
        r_steps = gen_ec_mad_steps(m, q, p)
        assert r == r_steps[-1].partial_sum
        b251, b196, b192 = (m >> 251) & 1, (m >> 196) & 1, (m >> 192) & 1
        return cls(
            index=index, p=p, q=q, m=m, r=r,
            q_doubling_steps=q_doubling_steps, r_steps=r_steps,
            m_bit251_and_bit196_and_bit192=bool(b251 and b196 and b192),
            m_bit251_and_bit196=bool(b251 and b196),
        )

    @classmethod
    def new_dummy(cls, index: int):
        t = _dummy_template()
        return dataclasses.replace(t, index=index)

    @classmethod
    def new_batch(cls, items):
        """items: list of (index, p_x, p_y, q_x, q_y, m) -> InstanceTraces.

        Native C++ lockstep batch (native/ecdsa.cpp ec_op_witness_batch)
        with the python path as fallback; parity is tested differentially
        (tests/test_builtins.py)."""
        if not items:
            return []
        try:
            from .. import native
            if not native.ecdsa_available():
                raise OSError("native ec_op unavailable")
        except Exception:
            return [cls.new(*it) for it in items]
        return _new_batch_native(cls, items)


def _new_batch_native(cls, items):
    from .ecdsa import _limbs_to_ints
    from .. import native
    for _, p_x, p_y, q_x, q_y, _m in items:
        assert is_on_curve((p_x, p_y)) and is_on_curve((q_x, q_y))
    out, status = native.ec_op_witness_batch(
        [it[1] for it in items], [it[2] for it in items],
        [it[3] for it in items], [it[4] for it in items],
        [it[5] for it in items])
    traces = []
    for i, (index, p_x, p_y, q_x, q_y, m) in enumerate(items):
        assert status[i] == 0, "EC op would fail in the AIR"
        ints = _limbs_to_ints(out[i])
        mads = ints[0:1536].reshape(256, 6)
        r_steps = [EcMadPartialStep(
            partial_sum=(b[0], b[1]), fixed_point=(b[2], b[3]),
            suffix=m >> step, slope=b[4], x_diff_inv=b[5])
            for step, b in enumerate(mads)]
        dbls = ints[1536:2304].reshape(256, 3)
        q_doubling_steps = [DoublingStep(point=(b[0], b[1]), slope=b[2])
                            for b in dbls]
        r = (ints[2304], ints[2305])
        assert r == r_steps[-1].partial_sum
        b251, b196, b192 = (m >> 251) & 1, (m >> 196) & 1, (m >> 192) & 1
        traces.append(cls(
            index=index, p=(p_x, p_y), q=(q_x, q_y), m=m, r=r,
            q_doubling_steps=q_doubling_steps, r_steps=r_steps,
            m_bit251_and_bit196_and_bit192=bool(b251 and b196 and b192),
            m_bit251_and_bit196=bool(b251 and b196),
        ))
    return traces


@functools.lru_cache(maxsize=1)
def _dummy_template():
    p0 = pedersen.shift_and_table_points()[0]
    return InstanceTrace.new_batch(
        [(0, p0[0], p0[1], GENERATOR[0], GENERATOR[1], 1)])[0]
