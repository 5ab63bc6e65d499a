"""Batched out-of-domain polynomial openings.

Evaluates every committed column polynomial at every opening point with one
fused kernel per (point, column) pair — a powers table per point (prefix
scan) and a mul + tree-reduction per column.  The eager per-op formulation
dispatched hundreds of kernels per opening; and stacking all columns into
one [C, n, L] array (the previous design) duplicated every coefficient
array, which at starknet scale (12 x 128MB) was the difference between
fitting in HBM and not.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(0,))
def _outer_mul(F, hi, lo):
    """[a, L] x [b, L] -> [a*b, L] field outer product (hi[i]*lo[j])."""
    a, b = hi.shape[0], lo.shape[0]
    big = F.mul(jnp.broadcast_to(hi[:, None], (a, b) + hi.shape[1:]),
                jnp.broadcast_to(lo[None, :], (a, b) + lo.shape[1:]))
    return big.reshape(a * b, -1)


def _point_powers(F, pt_int: int, n: int):
    """[n, L] powers pt^0..pt^(n-1).

    Decomposed as pt^(a*B + b) = (pt^B)^a * pt^b with two host-computed
    sqrt(n) tables and ONE device outer-product mul — a prefix scan here
    costs log2(n) full-length passes per opening point, which dominated
    the whole OODS phase at starknet scale.
    """
    from ..ntt import powers_host
    p = F.MODULUS
    b = 1 << ((n.bit_length() - 1) // 2)
    a = n // b
    lo = powers_host(F, pt_int % p, b)                      # pt^0..pt^(b-1)
    hi = powers_host(F, pow(pt_int, b, p), a)               # (pt^b)^0..
    return _outer_mul(F, hi, lo)


@functools.partial(jax.jit, static_argnums=(0,))
def open_one(F, coeffs, zp):
    """<coeffs, zp> field dot product: [n, L], [n, L] -> [L]."""
    a = F.mul(coeffs, zp)
    n = a.shape[0]
    while n > 1:
        a = F.add(a[0::2], a[1::2])
        n = a.shape[0]
    return a[0]


@functools.partial(jax.jit, static_argnums=(0,))
def _open_all_at_point(F, cols, hi, lo):
    """All columns at one point, fused into a single dispatch: the powers
    table (outer product of two sqrt(n) tables) plus every column's dot
    product: tuple of [n, L] -> [C, L]."""
    a, b = hi.shape[0], lo.shape[0]
    zp = F.mul(jnp.broadcast_to(hi[:, None], (a, b) + hi.shape[1:]),
               jnp.broadcast_to(lo[None, :], (a, b) + lo.shape[1:]))
    zp = zp.reshape(a * b, -1)
    outs = []
    for c in cols:
        x = F.mul(c, zp)
        m = x.shape[0]
        while m > 1:
            x = F.add(x[0::2], x[1::2])
            m = x.shape[0]
        outs.append(x[0])
    return jnp.stack(outs, axis=0)


def _open_all_pallas(F, col_arrays, pts, n):
    """All columns x all points via the fused Pallas opener: one device
    pass over the coefficient data per ~24 points (fields/fp252_pallas.py
    open_partials), instead of a mul + log2(n) halving-add passes per
    (point, column) — the XLA formulation re-streamed every array from HBM
    at each of the 18 reduction levels and dominated the OODS phase."""
    from ..fields import fp252_pallas as fpp
    from ..ntt import powers_host
    p = F.MODULUS
    T = fpp.SBT * 128
    A = n // T
    cols = jnp.stack([c.T for c in col_arrays])  # [C, 16, n]
    out_chunks = []
    CHUNK = 24
    for s in range(0, len(pts), CHUNK):
        chunk = pts[s:s + CHUNK]
        lo = jnp.stack([jnp.asarray(powers_host(F, pt % p, T)).T
                        for pt in chunk])
        hi = jnp.stack([jnp.asarray(powers_host(F, pow(pt, T, p), A)).T
                        for pt in chunk])
        partials = fpp.open_partials(cols, lo, hi)  # [K, C, 16, SBT, 128]
        K_, C_ = partials.shape[0], partials.shape[1]
        x = jnp.transpose(partials, (0, 1, 3, 4, 2)) \
            .reshape(K_, C_, T, -1)                 # [K, C, T, 16]
        m = T
        while m > 1:
            x = F.add(x[:, :, 0::2], x[:, :, 1::2])
            m //= 2
        out_chunks.append(x[:, :, 0])
    return F.decode(jnp.concatenate(out_chunks, axis=0))  # [K, C] ints


def open_columns(F, coeffs_by_col, targs, z, g, n, extra_points=()):
    """Open the committed columns at z*g^off for every distinct offset in
    targs (plus extra points).

    coeffs_by_col: dict col -> [n, L] device coefficient arrays
    targs: iterable of (col, offset)
    Returns (values dict {(col, off): int}, extra list of {col: int}).

    One fused dispatch per point — through a tunneled TPU, per-(point,
    column) dispatch latency dominated the whole OODS phase.
    """
    from ..ntt import powers_host
    p = F.MODULUS
    pb = F.BASE_MODULUS
    cols = sorted(coeffs_by_col)
    col_arrays = tuple(coeffs_by_col[c] for c in cols)
    offsets = sorted({off for (_, off) in targs})
    zs = F.s(z)
    pts = [int(zs * pow(g, off % n, pb)) for off in offsets] \
        + [int(F.s(e)) for e in extra_points]
    from ..fields.fp252 import _use_pallas
    if _use_pallas() and n % 1024 == 0 and n >= 4096 \
            and getattr(F, "NAME", "") == "fp252":
        vals = _open_all_pallas(F, col_arrays, pts, n)
    else:
        b = 1 << ((n.bit_length() - 1) // 2)
        a = n // b
        outs = []
        for pt in pts:
            lo = powers_host(F, pt % p, b)
            hi = powers_host(F, int(pow(F.s(pt), b, p)), a)
            outs.append(_open_all_at_point(F, col_arrays, hi, lo))
        vals = F.decode(jnp.stack(outs, axis=0))  # [K, C]; ONE host transfer
    values = {}
    for k, off in enumerate(offsets):
        for ci, c in enumerate(cols):
            values[(c, off)] = int(vals[k][ci])
    extra = [{c: int(vals[len(offsets) + j][ci])
              for ci, c in enumerate(cols)}
             for j in range(len(extra_points))]
    return values, extra
