"""Radix-2 NTT / inverse NTT / coset LDE over limb-array fields.

This is the engine's hottest kernel family (the reference offloads it to
Metal shaders in ministark-gpu; see SURVEY.md §2.7 "FFT/LDE").  Here the
butterflies are expressed as whole-array JAX ops so XLA maps them onto the
TPU VPU; a multi-chip four-step variant with `all_to_all` stage exchange
lives in sandstorm_tpu.parallel.

Conventions:
- Arrays are [n, L] (element index, limbs), natural evaluation order
  (index i holds the value at w^i, or c*w^i for a coset).
- `F` is a field class (GL or Fp252): see sandstorm_tpu.fields.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


def bit_reverse_perm(n: int) -> np.ndarray:
    """Bit-reversal permutation indices for size-n (power of two)."""
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


def powers(F, base, count: int):
    """[count, L] array of base^0 .. base^(count-1) via a prefix scan.

    For a *python-int* base prefer powers_host (zero compile cost)."""
    from ..fields.scan import prefix_mul
    base = jnp.asarray(base)
    seq = jnp.concatenate(
        [F.ones((1,)), jnp.broadcast_to(base, (count - 1,) + base.shape)], axis=0)
    return prefix_mul(F, seq)


@functools.lru_cache(maxsize=256)
def powers_host(F, base: int, count: int):
    """[count, L] device array of base^0..base^(count-1), computed host-side.

    Static twiddle/power tables are python-int chains + one bulk encode;
    this keeps XLA graphs free of log-depth scan towers (compile time).
    Cached per (field, base, count).
    """
    vals = [1] * count
    x = 1
    for i in range(1, count):
        x = F.host_mul(x, base)
        vals[i] = x
    return F.encode_ints_np(vals)  # numpy: safe to cache across jit traces


@functools.lru_cache(maxsize=None)
def _wpow_table(F, n: int, inverse: bool):
    """Full power table w^0..w^(n-1) (or of w^-1), on device.

    Computed eagerly even when first requested inside a jit trace (the table
    is a compile-time constant of the NTT kernel).
    """
    w = F.root_of_unity_int(n)
    if inverse:
        # domain points live in the base field (extension fields expose
        # BASE_MODULUS for root/coset exponentiations)
        w = pow(w, -1, F.BASE_MODULUS)
    return powers_host(F, w, n)


@functools.lru_cache(maxsize=None)
def _bitrev(n: int):
    return bit_reverse_perm(n)  # numpy; becomes a per-trace constant


@functools.partial(jax.jit, static_argnums=(0, 3))
def _ntt_core(F, a, wpow, inverse: bool):
    """Uniform-stage radix-2 DIT butterfly network.

    Every stage is expressed in the SAME shape —
        out[k] = x[idxA[k]] + w^twexp[k] * x[idxB[k]]
    (the minus branch is folded into the exponent via w^(n/2) = -1) — so the
    whole NTT compiles as ONE lax.scan body instead of log2(n) distinct
    unrolled stages.  The per-stage gather indices are computed ON DEVICE
    from the stage number (they're formulaic), and the twiddle table is a
    runtime ARGUMENT: big arrays must never be compile-time constants —
    each constant is baked into the HLO, blowing up compile time, the
    persistent-cache entries, and (through the axon tunnel) the compile
    request itself.
    """
    n = a.shape[0]
    logn = n.bit_length() - 1
    k = jnp.arange(n, dtype=jnp.int32)

    def stage(x, s):
        m = jnp.int32(1) << s
        half = m >> 1
        j = k & (m - 1)
        lower = j < half
        ia = jnp.where(lower, k, k - half)
        ib = jnp.where(lower, k + half, k)
        te = (jnp.int32(n) >> s) * (j & (half - 1)) \
            + jnp.where(lower, 0, n // 2).astype(jnp.int32)
        return F.add(x[ia], F.mul(x[ib], wpow[te])), None

    a, _ = jax.lax.scan(stage, a, jnp.arange(1, logn + 1, dtype=jnp.int32))
    if inverse:
        n_inv = F.encode_int(pow(n, -1, F.BASE_MODULUS))
        a = F.mul(a, jnp.broadcast_to(n_inv, a.shape))
    return a


_DEVICE_TABLES = {}


def _wpow_table_dev(F, n: int, inverse: bool):
    """Device-resident twiddle table, cached per (field, n, direction).

    Without this every NTT call re-uploads the [n, L] numpy table through
    the host->device tunnel (256MB per call at starknet scale).  Tables for
    at most two sizes stay live at a time; older sizes are evicted.
    """
    key = (F.NAME, n, inverse)
    if key not in _DEVICE_TABLES:
        # evict tables of other sizes to bound residency
        for k in [k for k in _DEVICE_TABLES if k[1] not in (n, n // 2, 2 * n)]:
            del _DEVICE_TABLES[k]
        _DEVICE_TABLES[key] = jnp.asarray(_wpow_table(F, n, inverse))
    return _DEVICE_TABLES[key]


def ntt(F, a, inverse: bool = False, local: bool = False):
    """In-order radix-2 NTT of a [n, L] array; returns evaluations at w^i.

    If inverse, computes the inverse NTT (including the 1/n scale).
    Under an active mesh (parallel/runtime.py) the transform routes to the
    multi-chip four-step `all_to_all` kernel; `local=True` forces the
    single-device path (used by the four-step kernel's per-shard NTTs).
    """
    n = a.shape[0]
    assert n & (n - 1) == 0, "size must be a power of two"
    if n == 1:
        return a
    if not local:
        from ..parallel import runtime
        mesh = runtime.active_mesh()
        if mesh is not None and runtime.four_step_ok(n, mesh):
            from ..parallel.dist import dist_ntt
            return dist_ntt(F, mesh, runtime.shard0(a, mesh), inverse)
        from .ntt_pallas import ntt_fourstep, pallas_ntt_ok
        if pallas_ntt_ok(F, n):
            # eager-only: inside traced contexts (local=True per-shard NTTs)
            # the four-step driver's device-cached tables would be captured
            # as HLO constants — the exact hazard _ntt_core's docstring bans
            return ntt_fourstep(F, a, inverse)
    wpow = _wpow_table_dev(F, n, inverse)  # runtime arg, not constant
    a = jnp.take(a, jnp.asarray(_bitrev(n)), axis=0)
    return _ntt_core(F, a, wpow, inverse)


def intt(F, a):
    return ntt(F, a, inverse=True)


def coset_lde(F, evals, blowup: int, coset: int):
    """Low-degree extend evaluations from the size-n domain to a coset domain.

    evals: [n, L] values of a degree-<n polynomial on {w_n^i}.
    Returns [n*blowup, L] values on {coset * w_N^i} (natural order).

    Mirrors the engine capability the reference gets from ministark-gpu's
    GPU NTT (SURVEY.md §2.7): interpolate + scale + forward NTT on the
    larger domain.
    """
    n = evals.shape[0]
    N = n * blowup
    coeffs = intt(F, evals)
    return coset_eval_from_coeffs(F, coeffs, N, coset)


def coset_eval_from_coeffs(F, coeffs, N: int, coset: int):
    """Evaluate a polynomial (coeff form, [n, L]) on {coset * w_N^i}."""
    n = coeffs.shape[0]
    assert N >= n
    scaled = F.mul(coeffs, powers_host(F, coset, n))
    if N > n:
        scaled = jnp.concatenate(
            [scaled, jnp.zeros((N - n,) + scaled.shape[1:], dtype=scaled.dtype)],
            axis=0)
    return ntt(F, scaled)


def field_sum(F, a, axis: int = 0):
    """Tree-reduction sum of field elements along an axis."""
    a = jnp.moveaxis(a, axis, 0)
    n = a.shape[0]
    while n > 1:
        if n % 2 == 1:
            a = jnp.concatenate(
                [a, F.zeros(a.shape[1:-1])[None]], axis=0)
            n += 1
        a = F.add(a[0::2], a[1::2])
        n = a.shape[0]
    return a[0]


def poly_eval(F, coeffs, z):
    """Evaluate a polynomial at a point z ([L] array) via a powers table."""
    n = coeffs.shape[0]
    zp = powers(F, z, n)
    return field_sum(F, F.mul(coeffs, zp), axis=0)


# NOTE: the public entry points are deliberately NOT jit-wrapped as whole
# functions — they stage big tables (twiddles, coset powers) as runtime
# arguments into the jitted cores so no large compile-time constants are
# baked into the HLO (see _ntt_core's docstring).  The field ops they call
# are individually jitted.
