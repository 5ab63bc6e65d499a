"""Low-level uint32 limb arithmetic helpers.

TPUs have no native 64-bit integer datapath, so all big-integer arithmetic in
this framework is expressed over uint32 lanes (the VPU's native width) using
16x16->32-bit partial products.  These helpers are shared by the Goldilocks
and 252-bit Starkware-prime field kernels and by the hash kernels.

Everything here is shape-polymorphic: inputs are jnp arrays of any matching
shape and ops broadcast normally.
"""

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)  # numpy scalar: Pallas kernels may not capture device constants


def u32(x):
    return jnp.asarray(x, dtype=U32)


def mul32_wide(a, b):
    """Full 32x32 -> 64-bit product of uint32 arrays.

    Returns (lo, hi) uint32 arrays with a*b = hi*2^32 + lo.
    """
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # mid = lh + hl, may carry one bit past 32
    mid = lh + hl
    mid_carry = (mid < lh).astype(U32)  # 1 if wrapped
    lo = ll + (mid << 16)
    carry_lo = (lo < ll).astype(U32)
    hi = hh + (mid >> 16) + (mid_carry << 16) + carry_lo
    return lo, hi


def add32_carry(a, b, carry_in=None):
    """a + b (+ carry_in) -> (sum, carry_out) with carry_out in {0, 1}.

    carry_in, if given, must be a uint32 array of 0/1 values.
    """
    s = a + b
    c = (s < a).astype(U32)
    if carry_in is not None:
        s2 = s + carry_in
        c = c + (s2 < s).astype(U32)
        s = s2
    return s, c


def sub32_borrow(a, b, borrow_in=None):
    """a - b (- borrow_in) -> (diff, borrow_out) with borrow_out in {0, 1}."""
    d = a - b
    br = (a < b).astype(U32)
    if borrow_in is not None:
        d2 = d - borrow_in
        br = br + (d < borrow_in).astype(U32)
        d = d2
    return d, br


# ---------------------------------------------------------------------------
# 64-bit arithmetic over (lo, hi) uint32 pairs
# ---------------------------------------------------------------------------

def add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 -> (lo, hi, carry_out)."""
    lo, c = add32_carry(alo, blo)
    hi, c2 = add32_carry(ahi, bhi, c)
    return lo, hi, c2


def sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 -> (lo, hi, borrow_out)."""
    lo, br = sub32_borrow(alo, blo)
    hi, br2 = sub32_borrow(ahi, bhi, br)
    return lo, hi, br2


def mul64_wide(alo, ahi, blo, bhi):
    """Full 64x64 -> 128-bit product -> (w0, w1, w2, w3) uint32 words."""
    ll_lo, ll_hi = mul32_wide(alo, blo)
    lh_lo, lh_hi = mul32_wide(alo, bhi)
    hl_lo, hl_hi = mul32_wide(ahi, blo)
    hh_lo, hh_hi = mul32_wide(ahi, bhi)

    w0 = ll_lo
    # w1 = ll_hi + lh_lo + hl_lo  (carries into w2)
    w1, c1 = add32_carry(ll_hi, lh_lo)
    w1, c2 = add32_carry(w1, hl_lo)
    carry_w2 = c1 + c2
    # w2 = lh_hi + hl_hi + hh_lo + carry_w2 (carries into w3)
    w2, c3 = add32_carry(lh_hi, hl_hi)
    w2, c4 = add32_carry(w2, hh_lo)
    w2, c5 = add32_carry(w2, carry_w2)
    w3 = hh_hi + c3 + c4 + c5
    return w0, w1, w2, w3
