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
    p = F.MODULUS
    vals = [1] * count
    x = 1
    for i in range(1, count):
        x = x * base % p
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
        w = pow(w, -1, F.MODULUS)
    return powers_host(F, w, n)


@functools.lru_cache(maxsize=None)
def _bitrev(n: int):
    return bit_reverse_perm(n)  # numpy; becomes a per-trace constant


@functools.lru_cache(maxsize=None)
def _stage_tables(n: int):
    """Per-stage gather indices + twiddle exponents for the uniform-stage
    radix-2 DIT butterfly network.

    Every stage is expressed in the SAME shape —
        out[k] = x[idxA[k]] + w^twexp[k] * x[idxB[k]]
    (the minus branch is folded into the exponent via w^(n/2) = -1) — so the
    whole NTT compiles as ONE lax.scan body instead of log2(n) distinct
    unrolled stages.  Compile time is O(1) in n; this is what makes the
    2^20-point NTT compile in seconds rather than tens of minutes.
    """
    logn = n.bit_length() - 1
    k = np.arange(n, dtype=np.int64)
    idxA = np.zeros((logn, n), dtype=np.int32)
    idxB = np.zeros((logn, n), dtype=np.int32)
    twexp = np.zeros((logn, n), dtype=np.int32)
    for s in range(1, logn + 1):
        m = 1 << s
        half = m >> 1
        j = k % m
        lower = j < half
        idxA[s - 1] = np.where(lower, k, k - half)
        idxB[s - 1] = np.where(lower, k + half, k)
        twexp[s - 1] = (n // m) * (j % half) + np.where(lower, 0, n // 2)
    return idxA, idxB, twexp


def ntt(F, a, inverse: bool = False):
    """In-order radix-2 NTT of a [n, L] array; returns evaluations at w^i.

    If inverse, computes the inverse NTT (including the 1/n scale).
    """
    n = a.shape[0]
    assert n & (n - 1) == 0, "size must be a power of two"
    if n == 1:
        return a
    wpow = jnp.asarray(_wpow_table(F, n, inverse))  # constant per trace
    idxA, idxB, twexp = _stage_tables(n)

    a = a[_bitrev(n)]

    def stage(x, inputs):
        ia, ib, te = inputs
        tw = wpow[te]
        return F.add(x[ia], F.mul(x[ib], tw)), None

    a, _ = jax.lax.scan(
        stage, a, (jnp.asarray(idxA), jnp.asarray(idxB), jnp.asarray(twexp)))
    if inverse:
        n_inv = F.encode_int(pow(n, -1, F.MODULUS))
        a = F.mul(a, jnp.broadcast_to(n_inv, a.shape))
    return a


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


# jit-wrap the public entry points (field class / sizes / scalars are static)
import jax as _jax  # noqa: E402

ntt = _jax.jit(ntt, static_argnums=(0, 2))
intt = _jax.jit(intt, static_argnums=(0,))
coset_lde = _jax.jit(coset_lde, static_argnums=(0, 2, 3))
coset_eval_from_coeffs = _jax.jit(coset_eval_from_coeffs, static_argnums=(0, 2, 3))
powers = _jax.jit(powers, static_argnums=(0, 2))
field_sum = _jax.jit(field_sum, static_argnums=(0, 2))
poly_eval = _jax.jit(poly_eval, static_argnums=(0,))
