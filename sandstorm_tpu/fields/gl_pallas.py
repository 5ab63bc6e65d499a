"""Goldilocks tile ops for the Pallas four-step NTT (ntt/ntt_pallas.py).

An element is a digit-register list [lo, hi] of u32 arrays (the same
(lo, hi) split as fields/goldilocks.py); all arithmetic is the elementwise
u32 form from fields/u32.py, which lowers cleanly inside Pallas kernels.
Reduction uses 2^64 = 2^32 - 1 and 2^96 = -1 (mod p), mirroring
GL.mul/add/sub exactly (cross-checked in tests/test_ntt.py through the
four-step-vs-scan equivalence).
"""

import jax.numpy as jnp
import numpy as np

from .u32 import add64, sub64, mul32_wide, mul64_wide

# numpy scalars, NOT the jnp scalars from goldilocks.py: Pallas kernels
# may not capture device constants
EPS = np.uint32(0xFFFFFFFF)   # 2^32 - 1 = 2^64 mod p
P_LO = np.uint32(1)
P_HI = np.uint32(0xFFFFFFFF)


def _cond_sub_p(lo, hi):
    dlo, dhi, borrow = sub64(lo, hi, P_LO, P_HI)
    keep = borrow.astype(jnp.bool_)
    return jnp.where(keep, lo, dlo), jnp.where(keep, hi, dhi)


def gl_mul_tile(a, b):
    zeros = jnp.zeros_like(a[0])
    w0, w1, w2, w3 = mul64_wide(a[0], a[1], b[0], b[1])
    t_lo, t_hi, br = sub64(w0, w1, w3, zeros)
    t_lo, t_hi, _ = sub64(t_lo, t_hi, br * EPS, zeros)
    t1_lo, t1_hi = mul32_wide(w2, EPS)
    r_lo, r_hi, c = add64(t_lo, t_hi, t1_lo, t1_hi)
    r_lo, r_hi, _ = add64(r_lo, r_hi, c * EPS, zeros)
    return list(_cond_sub_p(r_lo, r_hi))


def gl_add_tile(a, b):
    zeros = jnp.zeros_like(a[0])
    lo, hi, c = add64(a[0], a[1], b[0], b[1])
    lo, hi, _ = add64(lo, hi, c * EPS, zeros)
    return list(_cond_sub_p(lo, hi))


def gl_sub_tile(a, b):
    zeros = jnp.zeros_like(a[0])
    lo, hi, br = sub64(a[0], a[1], b[0], b[1])
    lo, hi, _ = sub64(lo, hi, br * EPS, zeros)
    return [lo, hi]
