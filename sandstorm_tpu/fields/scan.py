"""Uniform-stage prefix scans for field ops.

jax.lax.associative_scan builds a recursive odd/even graph whose size grows
with log(n) distinct slice/op layers — on large arrays the XLA compile cost
dominates (the same problem the NTT solves with its single lax.scan stage
body; see ntt/ntt.py:_stage_tables).  This module provides a Hillis-Steele
inclusive scan expressed as ONE lax.scan over log2(n) identical stages:

    stage s:  out[k] = combine(x[k - 2^s], x[k])   for k >= 2^s

Work is n·log n combines (vs 2n for Blelloch) but each stage is a full-array
vector op — exactly what the TPU VPU wants — and the compiled graph is O(1)
in n.  Supports arbitrary pytrees of [n, ...] arrays and any associative
combine (used for permutation products and the diluted-aggregate affine
recurrence).
"""

import jax
import jax.numpy as jnp
import numpy as np


def prefix_scan(combine, xs, reverse: bool = False):
    """Inclusive prefix scan of a pytree of [n, ...] arrays along axis 0."""
    leaves = jax.tree_util.tree_leaves(xs)
    n = leaves[0].shape[0]
    if n == 1:
        return xs
    logn = (n - 1).bit_length()
    shifts = jnp.asarray(np.array([1 << s for s in range(logn)],
                                  dtype=np.int32))
    idx = jnp.arange(n, dtype=jnp.int32)

    def stage(x, shift):
        def roll_leaf(leaf):
            r = jnp.roll(leaf, shift if not reverse else -shift, axis=0)
            return r

        prev = jax.tree_util.tree_map(roll_leaf, x)
        y = combine(prev, x) if not reverse else combine(x, prev)
        valid = (idx >= shift) if not reverse else (idx < n - shift)

        def select_leaf(yl, xl):
            mask = valid.reshape((n,) + (1,) * (yl.ndim - 1))
            return jnp.where(mask, yl, xl)

        return jax.tree_util.tree_map(select_leaf, y, x), None

    out, _ = jax.lax.scan(stage, xs, shifts)
    return out


import functools


@functools.partial(jax.jit, static_argnums=(0, 2))
def _prefix_mul_2level(F, a, reverse: bool):
    """Two-level inclusive running product of an [n, L] field array.

    Reshape to [R, C] (C ~ sqrt n), Hillis-Steele along the C axis
    (log2(C) full passes), tiny prefix over the R row-totals, one
    broadcast multiply — ~log2(n)/2 + 1 full-array passes instead of
    log2(n).  batch_inv runs two of these per call, so this nearly halves
    the HBM traffic of every permutation/DEEP denominator inversion.
    """
    n, L = a.shape
    C = 1 << ((n.bit_length() - 1 + 1) // 2)
    R = n // C
    x = a[::-1].reshape(R, C, L) if reverse else a.reshape(R, C, L)
    idx = jnp.arange(C, dtype=jnp.int32)
    shifts = jnp.asarray([1 << s for s in range((C - 1).bit_length())],
                         dtype=jnp.int32)

    def stage(y, shift):
        z = F.mul(jnp.roll(y, shift, axis=1), y)
        mask = (idx >= shift).reshape(1, C, 1)
        return jnp.where(mask, z, y), None

    inner, _ = jax.lax.scan(stage, x, shifts)
    totals = inner[:, -1]                      # [R, L]
    tp = prefix_scan(F.mul, totals)            # inclusive, small
    excl = jnp.concatenate([F.ones((1,)), tp[:-1]], axis=0)
    out = F.mul(inner, jnp.broadcast_to(excl[:, None, :], inner.shape))
    out = out.reshape(n, L)
    return out[::-1] if reverse else out


def prefix_mul(F, a, reverse: bool = False):
    """Inclusive running product of an [n, L] field array."""
    n = a.shape[0]
    if a.ndim == 2 and n >= (1 << 10) and n & (n - 1) == 0:
        return _prefix_mul_2level(F, a, reverse)
    return prefix_scan(F.mul, a, reverse=reverse)
