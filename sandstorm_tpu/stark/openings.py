"""Batched out-of-domain polynomial openings.

The Pallas path evaluates exactly the (point, column) pairs the AIR's
trace arguments require — scalar-prefetch pair indices, per-point power
tables built on device, one fused pass over the coefficient data
(fields/fp252_pallas.py open_pairs_partials).  The dense fallback (CPU /
non-fp252) evaluates all columns per point in one dispatch each.  Earlier
designs, for the record: the eager per-op form dispatched hundreds of
kernels per opening; the dense K x C kernel did ~6x the needed work; host
power chains + their upload dominated the phase.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(0, 2))
def _point_power_stack(F, pts_dev, count: int):
    """[K, L] points -> [count, K, L] of pt^i via one device prefix scan."""
    from ..fields.scan import prefix_mul
    K = pts_dev.shape[0]
    seq = jnp.concatenate(
        [F.ones((1, K)),
         jnp.broadcast_to(pts_dev[None],
                          (count - 1,) + pts_dev.shape)], axis=0)
    return prefix_mul(F, seq)


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


def _open_pairs_pallas(F, col_arrays, pts, n, pairs):
    """Requested (point, column) pairs via the pair-indexed Pallas opener
    (fields/fp252_pallas.py open_pairs_partials): one device pass over the
    coefficient data for ALL pairs — the dense K x C form evaluated every
    column at every point (~6x the needed work for the recursive AIR),
    and the plain-XLA formulation before it re-streamed every array from
    HBM at each of the 18 reduction levels.

    pairs: sequence of (point_idx, col_idx).  Returns numpy [P] object
    ints in pair order."""
    from ..fields import fp252_pallas as fpp
    p = F.MODULUS
    T = fpp.SBT * 128
    A = n // T
    cols = jnp.stack([c.T for c in col_arrays])  # [C, 16, n]
    # per-point power tables built ON DEVICE from one tiny [K, L] upload
    # (host power chains + their ~6MB table upload dominated the OODS
    # phase: ~93k host modmuls + a 0.2s transfer per prove)
    pts_dev = F.encode_ints([pt % p for pt in pts])          # [K, L]
    lo = jnp.transpose(_point_power_stack(F, pts_dev, T), (1, 2, 0))
    hi_base = F.pow_static(pts_dev, T)
    hi = jnp.transpose(_point_power_stack(F, hi_base, A), (1, 2, 0))
    kidx = jnp.asarray([k for (k, _) in pairs], dtype=jnp.int32)
    cidx = jnp.asarray([c for (_, c) in pairs], dtype=jnp.int32)
    from ..ntt.ntt_pallas import _interpret
    partials = fpp.open_pairs_partials(cols, lo, hi, kidx, cidx,
                                       len(pairs),
                                       interpret=_interpret())
    x = jnp.transpose(partials, (0, 2, 3, 1)).reshape(len(pairs), T, -1)
    m = T
    while m > 1:
        x = F.add(x[:, 0::2], x[:, 1::2])
        m //= 2
    return F.decode(x[:, 0])  # [P] ints


def open_columns(F, coeffs_by_col, targs, z, g, n, extra_points=(),
                 extra_cols=None):
    """Open the committed columns at z*g^off for each (col, off) in targs
    (plus extra points).

    coeffs_by_col: dict col -> [n, L] device coefficient arrays
    targs: iterable of (col, offset)
    extra_cols: optional per-extra-point column-key lists (default: all)
    Returns (values dict {(col, off): int}, extra list of {col: int}).

    The Pallas path evaluates exactly the requested pairs in one fused
    dispatch; the dense fallback evaluates every column per point (one
    dispatch per point).
    """
    from ..ntt import powers_host
    p = F.MODULUS
    pb = F.BASE_MODULUS
    cols = sorted(coeffs_by_col)
    col_pos = {c: i for i, c in enumerate(cols)}
    col_arrays = tuple(coeffs_by_col[c] for c in cols)
    offsets = sorted({off for (_, off) in targs})
    zs = F.s(z)
    pts = [int(zs * pow(g, off % n, pb)) for off in offsets] \
        + [int(F.s(e)) for e in extra_points]
    pair_list = sorted({(offsets.index(off), col_pos[c])
                        for (c, off) in targs})
    for j in range(len(extra_points)):
        ecs = cols if extra_cols is None else extra_cols[j]
        pair_list += [(len(offsets) + j, col_pos[c]) for c in ecs]
    from ..fields.fp252 import _use_pallas
    values, extra = {}, [{} for _ in extra_points]
    if _use_pallas() and n % 1024 == 0 and n >= 4096 \
            and getattr(F, "NAME", "") == "fp252":
        pv = _open_pairs_pallas(F, col_arrays, pts, n, pair_list)
        by_pair = {pr: int(v) for pr, v in zip(pair_list, pv)}
        for (c, off) in targs:
            values[(c, off)] = by_pair[(offsets.index(off), col_pos[c])]
        for j in range(len(extra_points)):
            ecs = cols if extra_cols is None else extra_cols[j]
            for c in ecs:
                extra[j][c] = by_pair[(len(offsets) + j, col_pos[c])]
        return values, extra
    b = 1 << ((n.bit_length() - 1) // 2)
    a = n // b
    outs = []
    for pt in pts:
        lo = powers_host(F, pt % p, b)
        hi = powers_host(F, int(pow(F.s(pt), b, p)), a)
        outs.append(_open_all_at_point(F, col_arrays, hi, lo))
    vals = F.decode(jnp.stack(outs, axis=0))  # [K, C]; ONE host transfer
    for k, off in enumerate(offsets):
        for ci, c in enumerate(cols):
            values[(c, off)] = int(vals[k][ci])
    extra = [{c: int(vals[len(offsets) + j][ci])
              for ci, c in enumerate(cols)}
             for j in range(len(extra_points))]
    return values, extra
