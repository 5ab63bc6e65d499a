"""Pallas TPU NTT: VMEM-resident butterfly stages + four-step recursion.

The scan-based NTT (ntt.py:_ntt_core) pays ~6 HBM round trips of the full
[n, 16] array per butterfly stage (two gathers, the twiddle read, and the
montmul kernel's in/out traffic) x log2(n) stages.  This module replaces it
for Fp252 on TPU with the classic four-step (Bailey) decomposition, the
same structure ministark-gpu uses to fit NTTs into Metal threadgroup
memory (SURVEY.md §2.7 "FFT/LDE"):

    n = R * C, input index j = r*C + c, output index k = k_c*R + k_r:
      1. C column NTTs of length R        (VMEM-resident Pallas kernel)
      2. elementwise twiddle by w_n^(r*c) (existing Pallas montmul)
      3. transpose, R row NTTs of length C (same kernel, recursing if big)

The leaf kernel keeps a [16, M, 128] digit-major block in VMEM and runs
ALL log2(M) DIT stages on it before writing back: one HBM read + write for
the whole transform instead of one per stage.  Butterflies use an explicit
add/sub pair, halving the montmuls of the uniform-stage scan form.  The
per-stage twiddle vectors ride along as a small [S, M/2, 16] input (big
tables must be runtime args, never compile-time constants — see
ntt.py:_ntt_core).

Stage s (m = 2^s, half = m/2) pairs rows g*m + j and g*m + j + half:
    t        = w_M^((M >> s) * j) * x[g*m + j + half]
    out_top  = x[g*m + j] + t
    out_bot  = x[g*m + j] - t
which is the standard natural-output DIT network over bit-reversed input.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.fp252_pallas import (M16, NDIGITS, P_DIGITS, _field_add_tile,
                                   _field_sub_tile, _montmul_tile)

# leaf transform cap: block [16, M, TB] u32 = M*8KB; M=256 keeps the
# montmul's ~33 loose digit temporaries ([M/2, TB] each) well inside VMEM
M_MAX = 256
TB = 128


def _tile_ops(fname: str):
    """(ndigits, mul, add, sub) digit-register tile ops per field."""
    if fname == "fp252":
        return (NDIGITS, _montmul_tile, _field_add_tile, _field_sub_tile)
    if fname == "goldilocks":
        from ..fields.gl_pallas import gl_mul_tile, gl_add_tile, gl_sub_tile
        return (2, gl_mul_tile, gl_add_tile, gl_sub_tile)
    raise KeyError(fname)


@functools.lru_cache(maxsize=None)
def _mk_ntt_kernel(fname: str):
    nd, mul, add, sub = _tile_ops(fname)

    def kernel(x_ref, tw_ref, o_ref):
        """All log2(M) DIT stages on a [nd, M, TB] digit-major VMEM block.

        tw_ref: [S, M/2, nd] per-stage twiddle vectors (group-flattened:
        entry i = g*half + j holds w_M^((M >> s) * j), in the field's mul
        domain)."""
        M = x_ref.shape[1]
        T = x_ref.shape[2]
        S = tw_ref.shape[0]
        x = [x_ref[d] for d in range(nd)]
        for s in range(1, S + 1):
            m = 1 << s
            half = m >> 1
            G = M // m
            tw = [jnp.broadcast_to(tw_ref[s - 1, :, d].reshape(M // 2, 1),
                                   (M // 2, T))
                  for d in range(nd)]
            top = [v.reshape(G, m, T)[:, :half].reshape(M // 2, T)
                   for v in x]
            bot = [v.reshape(G, m, T)[:, half:].reshape(M // 2, T)
                   for v in x]
            t = mul(bot, tw)
            nt = add(top, t)
            nb = sub(top, t)
            x = [jnp.concatenate(
                [a.reshape(G, half, T), b.reshape(G, half, T)],
                axis=1).reshape(M, T) for a, b in zip(nt, nb)]
        for d in range(nd):
            o_ref[d] = x[d]
    return kernel


def _interpret() -> bool:
    import os
    if os.environ.get("SANDSTORM_TPU_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("fname", "interpret"))
def _ntt_leaf_call(x_dm, tw, fname="fp252", interpret=False):
    """x_dm [nd, M, B] (B % TB == 0), tw [S, M/2, nd] -> [nd, M, B]."""
    nd, M, B = x_dm.shape
    grid = (B // TB,)
    return pl.pallas_call(
        _mk_ntt_kernel(fname),
        out_shape=jax.ShapeDtypeStruct((nd, M, B), x_dm.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nd, M, TB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tw.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nd, M, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        # the 8 unrolled butterfly stages keep ~45MB of digit temporaries
        # live; the default 16MB scoped-vmem cap rejects the kernel on a
        # real chip (v5e has 128MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_dm, tw)


# -- twiddle tables (host-derived, device-cached) ---------------------------

@functools.lru_cache(maxsize=None)
def _wpow_ints(F, M: int, inverse: bool):
    """numpy object array of w_M^0 .. w_M^(M-1) as python ints."""
    w = F.root_of_unity_int(M)
    if inverse:
        w = pow(w, -1, F.BASE_MODULUS)
    vals = np.empty(M, dtype=object)
    x = 1
    for i in range(M):
        vals[i] = x
        x = F.host_mul(x, w)
    return vals


@functools.lru_cache(maxsize=None)
def _stage_tables_np(F, M: int, inverse: bool):
    """[S, M/2, 16] stage twiddle vectors (numpy, Montgomery encoded)."""
    wp = _wpow_ints(F, M, inverse)
    S = M.bit_length() - 1
    out = np.empty((S, M // 2, F.NLIMBS), dtype=np.uint32)
    for s in range(1, S + 1):
        half = 1 << (s - 1)
        stride = M >> s
        pat = F.encode_ints_np([wp[stride * j] for j in range(half)])
        out[s - 1] = np.tile(pat, (M // (2 * half), 1))
    return out


import collections

_DEV_CACHE = collections.OrderedDict()
# twiddle-table HBM budget.  Tables re-upload through the ~13MB/s tunnel
# when evicted, and one prove alternates transform sizes every phase
# (intt n <-> fwd N <-> intt N): evicting by size cost ~2.5s of re-upload
# PER PHASE.  LRU within a byte budget keeps a whole prove's working set
# resident (recursive scale ~80MB, starknet ~800MB; HBM is 16GB).
_DEV_BUDGET_BYTES = 4 << 30


def _dev(key, build):
    if key in _DEV_CACHE:
        _DEV_CACHE.move_to_end(key)
        return _DEV_CACHE[key]
    val = jnp.asarray(build())
    _DEV_CACHE[key] = val
    total = sum(v.size * 4 for v in _DEV_CACHE.values())
    while total > _DEV_BUDGET_BYTES and len(_DEV_CACHE) > 1:
        _, old = _DEV_CACHE.popitem(last=False)
        total -= old.size * 4
    return val


def _stage_tables_dev(F, M: int, inverse: bool):
    return _dev(("stage", F.NAME, M, inverse),
                lambda: _stage_tables_np(F, M, inverse))


def _rc_twiddle_dev(F, M: int, R: int, inverse: bool):
    """[R, C, 1, 16] table of w_M^(r*c) (Montgomery) for the four-step."""
    def build():
        C = M // R
        wp = _wpow_ints(F, M, inverse)
        exps = (np.outer(np.arange(R, dtype=np.int64),
                         np.arange(C, dtype=np.int64)) % M).ravel()
        flat = F.encode_ints_np(list(wp[exps]))
        return flat.reshape(R, C, 1, F.NLIMBS)
    return _dev(("rc", F.NAME, M, R, inverse), build)


@functools.lru_cache(maxsize=None)
def _bitrev_idx(M: int):
    from .ntt import bit_reverse_perm
    return bit_reverse_perm(M)


# -- drivers -----------------------------------------------------------------

def _gl3_view(c):
    """[n, 6] GF(p^3) column -> [n, 3, 2] base-field coordinate batch.

    The NTT is linear over the BASE field and its twiddles are base-field,
    so a cubic-extension transform is exactly three Goldilocks transforms
    with the coordinate axis on the four-step's batch axis."""
    return c.reshape(c.shape[0], 3, 2)


def batched_ntt_cols(F, cols, inverse: bool):
    """NTT over axis 0 of each same-length column; returns the list.

    Columns transform INDIVIDUALLY (each as a [n, 1, L] four-step).  Two
    rejected alternatives, for the record: stacking columns on the batch
    axis ([n, C, L]) let XLA place the tiny C dim in the 128-lane position
    ([2^21, 9, 16] padded 14.2x to 16GB, past HBM); interleaving via flat
    2-D gathers avoided the layout but TPU row-gathers of millions of
    64-byte rows ran ~10x slower than the reshape path.  Per-column
    transforms use only [M, B, L] shapes with B large-or-1 (both
    layout-stable across every scale this engine runs), and dispatch
    amortization no longer matters (~6 dispatches per transform).
    """
    if getattr(F, "NAME", "") == "gl3":
        from ..fields.goldilocks import GL
        return [_batched_ntt_axis0(GL, _gl3_view(c), inverse)
                .reshape(c.shape) for c in cols]
    return [_batched_ntt_axis0(F, c[:, None, :], inverse)[:, 0, :]
            for c in cols]


def _ntt_leaf(F, x, inverse: bool):
    """x [M, B, L] natural order -> NTT over axis 0 (M <= M_MAX)."""
    M, B = x.shape[0], x.shape[1]
    x = jnp.take(x, jnp.asarray(_bitrev_idx(M)), axis=0)
    x = x.transpose(2, 0, 1)  # [L, M, B]
    Bp = -(-B // TB) * TB
    if Bp != B:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Bp - B)))
    tw = _stage_tables_dev(F, M, inverse)
    out = _ntt_leaf_call(x, tw, fname=F.NAME, interpret=_interpret())
    if Bp != B:
        out = out[:, :, :B]
    return out.transpose(1, 2, 0)  # [M, B, L]


def _batched_ntt_axis0(F, x, inverse: bool):
    """NTT over axis 0 of [M, B, L] (natural in / natural out)."""
    M, B, L = x.shape
    if M <= M_MAX:
        return _ntt_leaf(F, x, inverse)
    # balanced split keeps both factors' leaf transforms wide
    R = min(M_MAX, 1 << ((M.bit_length() - 1 + 1) // 2))
    C = M // R
    x = x.reshape(R, C * B, L)
    x = _batched_ntt_axis0(F, x, inverse)          # [k_r, (c, B)]
    x = x.reshape(R, C, B, L)
    x = F.mul(x, _rc_twiddle_dev(F, M, R, inverse))
    x = x.transpose(1, 0, 2, 3).reshape(C, R * B, L)
    x = _batched_ntt_axis0(F, x, inverse)          # [k_c, (k_r, B)]
    return x.reshape(C * R, B, L)                  # k = k_c*R + k_r


def ntt_fourstep(F, a, inverse: bool = False):
    """Drop-in replacement for ntt.py's single-device transform (Fp252).

    a: [n, 16] natural order -> [n, 16] evaluations (or inverse incl. the
    1/n scale)."""
    n = a.shape[0]
    out = batched_ntt_cols(F, [a], inverse)[0]
    if inverse:
        n_inv = F.encode_int(pow(n, -1, F.BASE_MODULUS))
        out = F.mul(out, jnp.broadcast_to(n_inv, out.shape))
    return out


def pallas_ntt_ok(F, n: int) -> bool:
    """The four-step path handles fp252, Goldilocks, and GF(p^3) columns
    (as three coordinate-batched GL transforms) on TPU, >= 4096."""
    if getattr(F, "NAME", "") not in ("fp252", "goldilocks", "gl3") \
            or n < 4096:
        return False
    from ..fields.fp252 import _use_pallas
    return _use_pallas()
