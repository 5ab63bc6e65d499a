"""Pallas TPU kernel for batched Fp252 Montgomery multiplication.

The plain-XLA montmul (fp252.py:_dmul_loose/_redc) operates on [n, 16]
digit-minor arrays: the 16-wide minor dimension occupies 16 of the VPU's
128 lanes, wasting ~8x of both compute and HBM bandwidth, and the loose
convolution materializes [n, 32] temporaries across ~16 fused passes.

This kernel flips the tile layout to digit-MAJOR ([16, T] blocks: digits
in sublanes, elements in lanes) so every vector op uses all 128 lanes, and
keeps the entire multiply -- 16x16 digit convolution, sparse-prime REDC,
carry propagation, conditional subtract -- in VMEM registers.  One HBM
read per operand, one write for the result; everything else is VPU work.

The digit arithmetic is identical to fp252.py (16-bit digits, Montgomery
R = 2^256, sparse REDC exploiting p's three nonzero base-2^16 digits);
correctness is cross-checked against the XLA path in tests/test_fields.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

M16 = np.uint32(0xFFFF)

NDIGITS = 16
P = (1 << 251) + 17 * (1 << 192) + 1
# default element tile (lanes): 8 sublane-groups of 128 lanes
TILE = 1024


def _montmul_tile(a, b):
    """Digit-major montgomery multiply on [16, T] u32 register arrays.

    a, b: lists of 16 [1, T] digit vectors. Returns list of 16 [1, T].
    Same arithmetic as fp252._dmul_loose + _redc, but with per-digit
    registers instead of padded-concat array surgery.
    """
    T = a[0].shape[-1]
    zero = jnp.zeros_like(a[0])

    # -- 16x16 digit convolution -> 32 loose digits (< 2^21) --------------
    loose = [zero] * (2 * NDIGITS)
    for j in range(NDIGITS):
        bj = b[j]
        for i in range(NDIGITS):
            prod = a[i] * bj
            loose[i + j] = loose[i + j] + (prod & M16)
            loose[i + j + 1] = loose[i + j + 1] + (prod >> 16)

    # -- Montgomery REDC (sparse prime: digits 1@0, 17@12, 0x800@15) ------
    t = loose + [zero]  # 33 digits
    c = zero
    for i in range(NDIGITS):
        ti = t[i] + c
        m = (zero - ti) & M16  # (-t_i) mod 2^16
        c = (ti + m) >> 16
        m17 = m * np.uint32(17)
        t[i + 12] = t[i + 12] + (m17 & M16)
        t[i + 13] = t[i + 13] + (m17 >> 16)
        t[i + 15] = t[i + 15] + ((m << 11) & M16)
        t[i + 16] = t[i + 16] + (m >> 5)

    # -- carry propagate digits 16..32 (+ c at digit 16) ------------------
    digits = [t[16 + k] for k in range(17)]
    digits[0] = digits[0] + c
    res = []
    carry = zero
    for k in range(17):
        v = digits[k] + carry
        res.append(v & M16)
        carry = v >> 16
    # result < 2p < 2^253 => res[16] == 0 after propagation

    return _cond_sub_p_tile(res[:NDIGITS], zero)


P_DIGITS = [(P >> (16 * k)) & 0xFFFF for k in range(NDIGITS)]


def _cond_sub_p_tile(res, zero):
    """digits (< 2^16, value < 2p) -> value mod p, digit-register lists."""
    diff = []
    borrow = zero
    for k in range(NDIGITS):
        v = res[k] - np.uint32(P_DIGITS[k]) - borrow
        diff.append(v & M16)
        borrow = v >> 31
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, r, d) for r, d in zip(res, diff)]


def _field_add_tile(a, b):
    """Field add of two digit-register lists (both < p)."""
    zero = jnp.zeros_like(a[0])
    out = []
    carry = zero
    for k in range(NDIGITS):
        v = a[k] + b[k] + carry
        out.append(v & M16)
        carry = v >> 16
    # a + b < 2p < 2^253: no carry out of digit 15
    return _cond_sub_p_tile(out, zero)


def _field_sub_tile(a, b):
    """Field subtract of two digit-register lists (both < p)."""
    zero = jnp.zeros_like(a[0])
    out = []
    borrow = zero
    for k in range(NDIGITS):
        v = a[k] - b[k] - borrow
        out.append(v & M16)
        borrow = v >> 31  # digits < 2^16 so v > -2^17: sign bit = borrow
    addp = []
    carry = zero
    for k in range(NDIGITS):
        v = out[k] + np.uint32(P_DIGITS[k]) + carry
        addp.append(v & M16)
        carry = v >> 16
    neg = borrow.astype(jnp.bool_)
    return [jnp.where(neg, ap, o) for ap, o in zip(addp, out)]


def _dbl_tile(a):
    return _field_add_tile(a, a)


def _ec_madd_tile(X, Y, Z, x2, y2):
    """Mixed Jacobian+affine point add (madd-2007-bl; 7M + 4S) on
    digit-register lists.  The curve parameter a only enters doubling
    formulas, so the subset-sum walk (hashing/pedersen_tpu.py) is exact
    for the Starkware curve.  Returns (X3, Y3, Z3)."""
    Z1Z1 = _montmul_tile(Z, Z)
    U2 = _montmul_tile(x2, Z1Z1)
    S2 = _montmul_tile(y2, _montmul_tile(Z, Z1Z1))
    H = _field_sub_tile(U2, X)
    HH = _montmul_tile(H, H)
    I = _dbl_tile(_dbl_tile(HH))
    J = _montmul_tile(H, I)
    r = _dbl_tile(_field_sub_tile(S2, Y))
    V = _montmul_tile(X, I)
    X3 = _field_sub_tile(_field_sub_tile(_montmul_tile(r, r), J),
                         _dbl_tile(V))
    Y3 = _field_sub_tile(_montmul_tile(r, _field_sub_tile(V, X3)),
                         _dbl_tile(_montmul_tile(Y, J)))
    ZH = _field_add_tile(Z, H)
    Z3 = _field_sub_tile(_field_sub_tile(_montmul_tile(ZH, ZH), Z1Z1), HH)
    return X3, Y3, Z3


def _ec_madd_kernel(x_ref, y_ref, z_ref, x2_ref, y2_ref, skip_ref,
                    ox_ref, oy_ref, oz_ref):
    """One fused window step of the Pedersen subset-sum walk: the whole
    11-montmul mixed add runs in VMEM (the per-op XLA formulation paid a
    dispatch + two layout transposes per montmul)."""
    X = [x_ref[i] for i in range(NDIGITS)]
    Y = [y_ref[i] for i in range(NDIGITS)]
    Z = [z_ref[i] for i in range(NDIGITS)]
    x2 = [x2_ref[i] for i in range(NDIGITS)]
    y2 = [y2_ref[i] for i in range(NDIGITS)]
    X3, Y3, Z3 = _ec_madd_tile(X, Y, Z, x2, y2)
    skip = skip_ref[0] != 0
    for i in range(NDIGITS):
        ox_ref[i] = jnp.where(skip, X[i], X3[i])
        oy_ref[i] = jnp.where(skip, Y[i], Y3[i])
        oz_ref[i] = jnp.where(skip, Z[i], Z3[i])


# madd kernel sublane block: the 11 chained montmuls keep ~2MB of digit
# temporaries live per 32-sublane block; 32 keeps the whole working set
# comfortably inside VMEM
SB_EC = 32


@functools.partial(jax.jit, static_argnames=("interpret",))
def ec_madd_digitmajor(X, Y, Z, x2, y2, skip, interpret=False):
    """Batched mixed add on digit-major [16, n] u32 arrays (Montgomery);
    n a multiple of 1024 (rows=n/128 a multiple of SB_EC, or <= SB_EC and
    a multiple of 8); skip: [n] nonzero -> keep (X, Y, Z)."""
    n = X.shape[1]
    npad = _pad_to(n, 8 * 128)
    if npad > SB_EC * 128:
        npad = _pad_to(n, SB_EC * 128)  # grid steps need rows % sb == 0
    if npad != n:
        pad = ((0, 0), (0, npad - n))
        X, Y, Z, x2, y2 = (jnp.pad(a, pad) for a in (X, Y, Z, x2, y2))
        # padding lanes take the skip branch (copy X through unchanged)
        skip = jnp.pad(skip.astype(jnp.uint32), (0, npad - n),
                       constant_values=1)
    rows = npad // 128
    sb = rows if rows <= SB_EC else SB_EC
    grid = (rows // sb,)
    spec = pl.BlockSpec((NDIGITS, sb, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, sb, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    shaped = [a.reshape(NDIGITS, rows, 128) for a in (X, Y, Z, x2, y2)]
    sk = skip.astype(jnp.uint32).reshape(1, rows, 128)
    out_shape = [jax.ShapeDtypeStruct((NDIGITS, rows, 128), X.dtype)] * 3
    ox, oy, oz = pl.pallas_call(
        _ec_madd_kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[spec] * 5 + [sspec],
        out_specs=[spec] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*shaped, sk)
    return (ox.reshape(NDIGITS, npad)[:, :n],
            oy.reshape(NDIGITS, npad)[:, :n],
            oz.reshape(NDIGITS, npad)[:, :n])


def _montmul_kernel(a_ref, b_ref, o_ref):
    """a_ref/b_ref/o_ref: [16, SB, 128] digit-major blocks.

    Digit slices are [SB, 128] — SB sublanes x 128 lanes — so the VPU
    runs at full 8-sublane occupancy (the earlier [1, T] digit rows used
    one sublane of eight: ~5x slower end to end).
    """
    a = [a_ref[i] for i in range(NDIGITS)]
    b = [b_ref[i] for i in range(NDIGITS)]
    out = _montmul_tile(a, b)
    for i in range(NDIGITS):
        o_ref[i] = out[i]


# sublane-block height: 64 rows x 128 lanes = 8192 elements per grid step
SB = 64


@functools.partial(jax.jit, static_argnames=("sb",))
def montmul_digitmajor(a, b, sb: int = SB):
    """Montgomery product of digit-major [16, n] u32 arrays
    (n % (sb*128) == 0)."""
    n = a.shape[1]
    rows = n // 128
    a3 = a.reshape(NDIGITS, rows, 128)
    b3 = b.reshape(NDIGITS, rows, 128)
    grid = (rows // sb,)
    spec = pl.BlockSpec((NDIGITS, sb, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _montmul_kernel,
        out_shape=jax.ShapeDtypeStruct((NDIGITS, rows, 128), a.dtype),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
    )(a3, b3)
    return out.reshape(NDIGITS, n)


def _pad_to(n, m):
    return -(-n // m) * m


@jax.jit
def montmul_rows(a, b):
    """Drop-in montmul for [..., 16] digit-minor arrays via one transpose
    each way.  Small batches shrink the sublane block to one grid step."""
    shape = a.shape
    a2 = a.reshape(-1, NDIGITS)
    b2 = jnp.broadcast_to(b, shape).reshape(-1, NDIGITS)
    n = a2.shape[0]
    # Mosaic block rule: the sublane block dim must be a multiple of 8 or
    # equal the whole array dim — small batches take one whole-array block
    rows = _pad_to(n, 128) // 128
    sb = rows if rows <= SB else SB
    npad = _pad_to(n, sb * 128)
    if npad != n:
        pad = ((0, npad - n), (0, 0))
        a2 = jnp.pad(a2, pad)
        b2 = jnp.pad(b2, pad)
    at = a2.T  # [16, npad]
    bt = b2.T
    ot = montmul_digitmajor(at, bt, sb=sb)
    out = ot.T[:n]
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Fused multi-point multi-column polynomial opening (the OODS hot kernel)
# ---------------------------------------------------------------------------

def _open_pairs_kernel(kidx_ref, cidx_ref, cols_ref, lo_ref, hi_ref,
                       out_ref):
    """Pair-indexed opener: out[p] += cols[cidx[p]] * (hi[kidx[p], i] *
    lo[kidx[p]]) for each requested (point, column) pair.

    The dense K x C variant (_open_kernel) evaluated every column at every
    point; the AIR only needs its trace arguments (~133 of ~876 pairs for
    the recursive layout), so the pair list arrives as scalar-prefetch
    index vectors and the kernel does 2 montmuls per PAIR per tile
    (zp recomputed per pair — caching it per distinct point would need
    data-dependent control flow for a <2x op saving)."""
    K = lo_ref.shape[0]
    P = out_ref.shape[0]
    SBt = cols_ref.shape[2]
    A = hi_ref.shape[2]
    i = pl.program_id(0)
    lane_is_i = jax.lax.broadcasted_iota(jnp.int32, (1, A), 1) == i

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def pair_body(p, _):
        k = kidx_ref[p]
        c = cidx_ref[p]
        hi_k = [jnp.sum(jnp.where(lane_is_i,
                                  hi_ref[k, d:d + 1, :].astype(jnp.int32),
                                  0),
                        axis=1, keepdims=True).astype(jnp.uint32)
                for d in range(NDIGITS)]
        lo_k = [lo_ref[k, d] for d in range(NDIGITS)]
        zp = _montmul_tile(
            [jnp.broadcast_to(h[:, :, None], (1, SBt, 128)).reshape(SBt, 128)
             for h in hi_k], lo_k)
        col = [cols_ref[c, d] for d in range(NDIGITS)]
        prod = _montmul_tile(col, zp)
        acc = [out_ref[p, d] for d in range(NDIGITS)]
        new = _field_add_tile(acc, prod)
        out_ref[p] = jnp.stack(new, axis=0)
        return 0

    jax.lax.fori_loop(0, P, pair_body, 0)


@functools.partial(jax.jit, static_argnames=("num_pairs", "interpret"))
def open_pairs_partials(cols_dm, lo_dm, hi_dm, kidx, cidx, num_pairs,
                        interpret=False):
    """cols [C, 16, n], lo [K, 16, T], hi [K, 16, n//T] (Montgomery,
    digit-major, T = SBT*128), kidx/cidx [P] i32 -> [P, 16, SBT, 128]
    partial field sums of sum_i cols[cidx[p], :, i] * pt_{kidx[p]}^i."""
    C, _, n = cols_dm.shape
    K, _, T = lo_dm.shape
    assert T == SBT * 128
    A = n // T
    cols4 = cols_dm.reshape(C, NDIGITS, n // 128, 128)
    lo4 = lo_dm.reshape(K, NDIGITS, SBT, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(A,),
        in_specs=[
            pl.BlockSpec((C, NDIGITS, SBT, 128), lambda i, *_: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NDIGITS, SBT, 128), lambda i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NDIGITS, A), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_pairs, NDIGITS, SBT, 128),
                               lambda i, *_: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _open_pairs_kernel,
        out_shape=jax.ShapeDtypeStruct((num_pairs, NDIGITS, SBT, 128),
                                       cols_dm.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(kidx, cidx, cols4, lo4, hi_dm)


# opener tile: 8 sublanes x 128 lanes
SBT = 8


