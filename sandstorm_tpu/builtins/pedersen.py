"""Pedersen hash builtin: hash function + 512-step EC subset-sum witness.

Semantics parity with /root/reference builtins/src/pedersen/mod.rs:
- hash(a, b) = x-coord of  ((P0 + a_low*P1 + a_high*P2) + b_low*P3 + b_high*P4)
  with low = 248 bits, high = top 4 bits (StarkWare parameters from pi).
- InstanceTrace: for each input, 256 ElementPartialStep{point, suffix, slope}
  where step i holds the partial sum BEFORE consuming bit i, suffix = x >> i,
  and slope = the addition slope when bit i is set (else 0)
  (pedersen/mod.rs:131-176); plus the bit-251/196/192 product flags used by
  the AIR's unique-unpacking constraints.
- Periodic tables: x/y coordinates of the doubling chains of P1..P4 as
  512-coefficient polynomials (pedersen/periodic.rs) — derived here at
  runtime rather than baked as source constants.
"""

import dataclasses
import functools
import json
import os

from . import curve
from .curve import P, ec_add, ec_double, calculate_slope

_DATA = os.path.join(os.path.dirname(__file__), "data", "pedersen_points.json")

LOW_BITS = 248
HIGH_BITS = 4
N_ELEMENT_STEPS = 256


@functools.lru_cache(maxsize=1)
def shift_and_table_points():
    with open(_DATA) as f:
        data = json.load(f)
    p0, p1, p2, p3, p4 = [tuple(pt) for pt in data["P"]]
    return p0, p1, p2, p3, p4


@functools.lru_cache(maxsize=4)
def _chain(which: int):
    """Doubling chain for an element: 248 doublings of p_low then 4 of
    p_high (252 points)."""
    _, p1, p2, p3, p4 = shift_and_table_points()
    p_low, p_high = ((p1, p2), (p3, p4))[which]
    return (curve.doublings(p_low, LOW_BITS)
            + curve.doublings(p_high, HIGH_BITS))


def process_element(x: int, which: int, start):
    """start + x_low * p_low + x_high * p_high via the doubling chain."""
    chain = _chain(which)
    acc = start
    for i in range(252):
        if (x >> i) & 1:
            acc = ec_add(acc, chain[i])
    return acc


def pedersen_hash(a: int, b: int) -> int:
    """StarkWare Pedersen hash (verified against public test vectors).

    Routed through the native C++ window batch when available (~500x the
    python EC walk; transcript reseeds chain a hundred of these); the
    python path below remains the oracle the native kernels are tested
    against (tests/test_native.py, test_hash_merkle.py)."""
    from .. import native
    if native.available():
        return native.pedersen_hash_pairs_ints([a], [b])[0]
    return pedersen_hash_oracle(a, b)


def pedersen_hash_oracle(a: int, b: int) -> int:
    """Pure-python pedersen (the differential-test oracle)."""
    p0, *_ = shift_and_table_points()
    acc = process_element(a, 0, p0)
    acc = process_element(b, 1, acc)
    return acc[0]


@dataclasses.dataclass
class ElementPartialStep:
    point: tuple   # partial sum (affine) before consuming bit i
    suffix: int    # x >> i
    slope: int     # addition slope when bit i is set, else 0


def gen_element_steps(x: int, start, which: int):
    """The 256 partial steps of one element (pedersen/mod.rs:131-176)."""
    chain = _chain(which)
    partial = start
    steps = []
    for i in range(N_ELEMENT_STEPS):
        suffix = x >> i
        bit = suffix & 1
        slope = 0
        nxt = partial
        if bit:
            slope = calculate_slope(chain[i], partial)
            nxt = ec_add(partial, chain[i])
        steps.append(ElementPartialStep(point=partial, suffix=suffix,
                                        slope=slope))
        partial = nxt
    return steps


@dataclasses.dataclass
class InstanceTrace:
    """Witness for one pedersen builtin instance (a, b)."""
    index: int
    a: int
    b: int
    output: int
    a_steps: list
    b_steps: list
    a_bit251_and_bit196_and_bit192: bool
    a_bit251_and_bit196: bool
    b_bit251_and_bit196_and_bit192: bool
    b_bit251_and_bit196: bool

    @classmethod
    def new(cls, index: int, a: int, b: int) -> "InstanceTrace":
        p0, *_ = shift_and_table_points()
        a_steps = gen_element_steps(a, p0, 0)
        b_start = process_element(a, 0, p0)
        assert a_steps[-1].point == b_start or a >> 255 == 0
        b_steps = gen_element_steps(b, b_start, 1)
        output = pedersen_hash(a, b)
        # witness-gen asserts the AIR will pass (reference invariant)
        assert b_steps[-1].point[0] == output if (b >> 255) == 0 else True

        def bits(x):
            return (x >> 251) & 1, (x >> 196) & 1, (x >> 192) & 1

        a251, a196, a192 = bits(a)
        b251, b196, b192 = bits(b)
        return cls(
            index=index, a=a, b=b, output=output,
            a_steps=a_steps, b_steps=b_steps,
            a_bit251_and_bit196_and_bit192=bool(a251 and a196 and a192),
            a_bit251_and_bit196=bool(a251 and a196),
            b_bit251_and_bit196_and_bit192=bool(b251 and b196 and b192),
            b_bit251_and_bit196=bool(b251 and b196),
        )

    @classmethod
    def new_dummy(cls, index: int) -> "InstanceTrace":
        return dummy_instance_trace(index)

    @classmethod
    def new_batch(cls, items):
        """items: list of (index, a, b) -> InstanceTraces.

        Native C++ lockstep batch (native/ecdsa.cpp
        pedersen_witness_batch) with the python path as fallback; parity
        tested differentially (tests/test_builtins.py)."""
        if not items:
            return []
        try:
            from .. import native
            if not native.ecdsa_available():
                raise OSError("native pedersen witness unavailable")
            native._pedersen_witness_lib()
        except Exception:
            return [cls.new(*it) for it in items]
        return _new_batch_native(cls, items)


def _new_batch_native(cls, items):
    from .ecdsa import _limbs_to_ints
    from .. import native
    out, status = native.pedersen_witness_batch(
        [it[1] for it in items], [it[2] for it in items])

    def bits(x):
        return (x >> 251) & 1, (x >> 196) & 1, (x >> 192) & 1

    traces = []
    for i, (index, a, b) in enumerate(items):
        assert status[i] == 0, "pedersen input would fail in the AIR"
        ints = _limbs_to_ints(out[i])

        def steps(base, x):
            block = ints[base:base + 768].reshape(256, 3)
            return [ElementPartialStep(point=(r[0], r[1]), suffix=x >> s,
                                       slope=r[2])
                    for s, r in enumerate(block)]

        a_steps = steps(0, a)
        b_steps = steps(768, b)
        output = ints[1536]
        # witness-gen asserts the AIR will pass (mirrors `new`)
        assert b_steps[-1].point[0] == output if (b >> 255) == 0 else True
        a251, a196, a192 = bits(a)
        b251, b196, b192 = bits(b)
        traces.append(cls(
            index=index, a=a, b=b, output=output,
            a_steps=a_steps, b_steps=b_steps,
            a_bit251_and_bit196_and_bit192=bool(a251 and a196 and a192),
            a_bit251_and_bit196=bool(a251 and a196),
            b_bit251_and_bit196_and_bit192=bool(b251 and b196 and b192),
            b_bit251_and_bit196=bool(b251 and b196),
        ))
    return traces


@functools.lru_cache(maxsize=1)
def _dummy_template():
    return InstanceTrace.new_batch([(0, 0, 0)])[0]


def dummy_instance_trace(index: int) -> InstanceTrace:
    """Padding instance (a=b=0), memoized (cf. ecdsa new_dummy pattern)."""
    t = _dummy_template()
    return dataclasses.replace(t, index=index)


@functools.lru_cache(maxsize=4)
def periodic_table_points(which: int):
    """The doubling-chain coordinates used by the periodic columns.

    Matches the table layout documented in pedersen/periodic.rs:5-70:
    512 rows per hash: rows 0..247 the P1/P3 doublings, row 248.. the
    P2/P4 doublings (4), remaining rows repeat the last point (the AIR
    only constrains the first 252 of each half-instance).
    """
    chain = _chain(which)
    rows = list(chain) + [chain[-1]] * (256 - len(chain))
    return rows
