"""Batched out-of-domain polynomial openings.

Evaluates EVERY committed column polynomial at EVERY opening point in one
jitted kernel (lax.map over points; per-point a powers scan + a tree
reduction over all columns), returning a small [K, C, L] array in a single
device round trip.  The eager per-(column, offset) formulation dispatched
hundreds of kernels — through the axon TPU tunnel each dispatch costs
real latency, making OODS the slowest prover phase.
"""

import functools

import jax
import jax.numpy as jnp

from ..fields.scan import prefix_mul


def _tree_sum(F, a, axis):
    a = jnp.moveaxis(a, axis, 0)
    n = a.shape[0]
    while n > 1:
        if n % 2 == 1:
            a = jnp.concatenate([a, F.zeros(a.shape[1:-1])[None]], axis=0)
            n += 1
        a = F.add(a[0::2], a[1::2])
        n = a.shape[0]
    return a[0]


@functools.partial(jax.jit, static_argnums=(0,))
def open_point(F, coeffs_stack, pt):
    """Open all columns at one point: [C, n, L], [L] -> [C, L].

    lax.map (not a python loop) over columns keeps one column's reduction
    live at a time; the point loop lives on the HOST (one dispatch per
    point) — a further nested lax.map over points made XLA's buffer
    assignment blow HBM at 2^21 rows.
    """
    C, n, L = coeffs_stack.shape
    seq = jnp.concatenate(
        [F.ones((1,)), jnp.broadcast_to(pt, (n - 1,) + pt.shape)], axis=0)
    zp = prefix_mul(F, seq)                      # [n, L]
    return jax.lax.map(
        lambda c: _tree_sum(F, F.mul(c, zp), axis=0),
        coeffs_stack)                            # [C, L]


def batch_open(F, coeffs_stack, points):
    """Open all columns at all points; returns [K, C, L] (host loop over
    points, one device dispatch each)."""
    return jnp.stack([open_point(F, coeffs_stack, points[k])
                      for k in range(points.shape[0])], axis=0)


def open_columns(F, coeffs_by_col, targs, z, g, n, extra_points=()):
    """Host driver: open the committed columns at z*g^off for every distinct
    offset in targs (plus extra points), one device round trip.

    coeffs_by_col: dict col -> [n, L]
    targs: iterable of (col, offset)
    Returns (values dict {(col, off): int}, extra list of {col: int}).
    """
    p = F.MODULUS
    cols = sorted(coeffs_by_col)
    offsets = sorted({off for (_, off) in targs})
    pts = [z * pow(g, off % n, p) % p for off in offsets] + list(extra_points)
    coeffs_stack = jnp.stack([coeffs_by_col[c] for c in cols], axis=0)
    pts_dev = jnp.stack([F.encode_int(pt) for pt in pts], axis=0)
    out = F.decode(batch_open(F, coeffs_stack, pts_dev))  # [K, C] ints
    values = {}
    for k, off in enumerate(offsets):
        for ci, c in enumerate(cols):
            values[(c, off)] = int(out[k, ci])
    extra = [{c: int(out[len(offsets) + j, ci]) for ci, c in enumerate(cols)}
             for j in range(len(extra_points))]
    return values, extra
