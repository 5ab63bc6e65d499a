"""Shared layout helpers: public-memory quotient, diluted-check math,
periodic columns, pools.

Capability parity with /root/reference layouts/src/utils.rs (quotient
:14-46, diluted cumulative :48-110, pools :156-393) — recomputed here with
host python ints (verifier-side scalars) and numpy vectorization
(prover-side pools).
"""

import functools

import numpy as np


# -- verifier-side scalar helpers ---------------------------------------------

def compute_public_memory_quotient(z, alpha, trace_len, public_memory,
                                   padding_entry, public_memory_step, p):
    """z^S / (prod_i (z - (a_i + α v_i)) · pad^(S-N))  (utils.rs:14-46)."""
    s = trace_len // public_memory_step
    numerator = pow(z, s, p)
    denominator = 1
    for e in public_memory:
        denominator = denominator * (z - (e.address + alpha * e.value)) % p
    padding = pow(z - (padding_entry.address + alpha * padding_entry.value) % p,
                  s - len(public_memory), p)
    return numerator * pow(denominator * padding % p, p - 2, p) % p


def compute_diluted_cumulative_value(z, alpha, n_bits, spacing, p):
    """Log-time recursion for the diluted-check aggregate terminal
    (utils.rs:83-110; formula documented there)."""
    diff_multiplier = 1 << spacing
    diff_x = (1 << spacing) - 2
    p_acc = (z + 1) % p
    q_acc = 1
    x = 1
    for _ in range(1, n_bits):
        x = (x + diff_x) % p
        diff_x = diff_x * diff_multiplier % p
        xp = x * p_acc % p
        y = (p_acc + z * xp) % p
        q_acc = (q_acc + q_acc * y + x * xp) % p
        p_acc = p_acc * y % p
    return (p_acc + q_acc * alpha) % p


# -- pools (numpy-vectorized; reference loops in utils.rs:238-393) ------------

def ordered_with_padding(values: np.ndarray, lo=None, hi=None):
    """Sort values and compute the gap-filling padding making them
    continuous over [lo, hi] (defaults: min/max of the values).

    Returns (ordered_incl_padding, padding) — both ascending uint32/uint64.
    """
    ordered = np.sort(values)
    lo = int(ordered[0]) if lo is None else int(lo)
    hi = int(ordered[-1]) if hi is None else int(hi)
    assert lo <= int(ordered[0]) and int(ordered[-1]) <= hi
    full = np.arange(lo, hi + 1, dtype=values.dtype)
    present = np.zeros(hi - lo + 1, dtype=bool)
    present[(ordered - lo).astype(np.int64)] = True
    padding = full[~present]
    merged = np.sort(np.concatenate([ordered, padding]))
    return merged, padding


# -- dilution (vectorized; builtins/src/bitwise/mod.rs:127-133) ---------------

@functools.lru_cache(maxsize=4)
def _dilute8_table(spacing: int):
    tbl = np.zeros(256, dtype=np.uint64)
    for v in range(256):
        out = 0
        for i in range(8):
            out |= ((v >> i) & 1) << (i * spacing)
        tbl[v] = out
    return tbl


def dilute_u16(values: np.ndarray, spacing: int = 4) -> np.ndarray:
    """Dilute uint16 values: bit i -> position i*spacing (fits in u64)."""
    tbl = _dilute8_table(spacing)
    v = values.astype(np.uint64)
    return tbl[(v & np.uint64(0xFF)).astype(np.int64)] | (
        tbl[(v >> np.uint64(8)).astype(np.int64)] << np.uint64(8 * spacing))


# -- periodic columns ---------------------------------------------------------

def intt_host(values, p, root):
    """Inverse NTT of python-int values over the given root's domain."""
    n = len(values)
    assert n & (n - 1) == 0
    inv_root = pow(root, -1, p)
    coeffs = _ntt_rec(list(values), p, inv_root)
    n_inv = pow(n, -1, p)
    return [c * n_inv % p for c in coeffs]


def _ntt_rec(a, p, w):
    n = len(a)
    if n == 1:
        return a
    even = _ntt_rec(a[0::2], p, w * w % p)
    odd = _ntt_rec(a[1::2], p, w * w % p)
    out = [0] * n
    x = 1
    for k in range(n // 2):
        t = x * odd[k] % p
        out[k] = (even[k] + t) % p
        out[k + n // 2] = (even[k] - t) % p
        x = x * w % p
    return out


class PeriodicColumn:
    """A column that repeats every `interval` trace rows.

    `coeffs` (python ints, power-of-two count) define the polynomial P over
    the len(coeffs)-th roots of unity; the column's value on trace row i is
    P(g^(i·n/interval)) — i.e. entry (i % interval)/(interval/len(coeffs))
    of the table P interpolates.  Mirrors ministark's
    PeriodicColumn::new(&COEFFS, INTERVAL_SIZE) (recursive/air.rs:38-50).
    """

    def __init__(self, coeffs, interval: int):
        self.coeffs = [int(c) for c in coeffs]
        self.interval = interval

    @classmethod
    def from_table(cls, table, interval: int, p: int, root512):
        """Interpolate a value table over its canonical radix-2 domain
        (the analog of builtins/src/utils.rs:32-46 gen_periodic_table)."""
        coeffs = intt_host(table, p, root512)
        return cls(coeffs, interval)

    def bind(self, trace_len: int):
        return BoundPeriodicColumn(self, trace_len)


class BoundPeriodicColumn:
    """A periodic column bound to a trace length (fixes x -> x^(n/interval))."""

    def __init__(self, column: PeriodicColumn, trace_len: int):
        assert trace_len % column.interval == 0
        self.column = column
        self.exponent = trace_len // column.interval

    def lde_fn(self, F, dom):
        """Callable returning [period, L] evaluations over the LDE domain.

        The map x -> x^e makes the column periodic over the LDE with period
        N/e = blowup·interval; evaluate P once on that short coset domain.
        """
        col = self.column
        e = self.exponent

        def fn():
            import jax.numpy as jnp
            from ..ntt import coset_eval_from_coeffs
            period = dom.N // e
            assert period >= len(col.coeffs)
            cs = jnp.asarray(F.encode_ints_np(col.coeffs))
            coset_e = pow(dom.coset, e, F.MODULUS)
            return coset_eval_from_coeffs(F, cs, period, coset_e)

        return fn

    def eval_int(self, x: int, p: int) -> int:
        xe = pow(x, self.exponent, p)
        acc = 0
        for c in reversed(self.column.coeffs):
            acc = (acc * xe + c) % p
        return acc


def upload_base_columns(F, cols_dict):
    """Canonical base columns (dict idx -> numpy [n, 4] u64 LE words) ->
    dict idx -> device [n, L] arrays in the field's mul domain.

    Trims each column to its populated word count before the transfer when
    the field supports the mixed-width upload (fp252's
    encode_canonical_mixed): most base columns are narrow (flags/rc cells
    < 2^16, diluted pools < 2^62), and the tunneled host->device link is
    the base-commit phase's bottleneck."""
    keys = sorted(cols_dict)
    if hasattr(F, "encode_canonical_mixed"):
        packed = []
        for i in keys:
            c = np.asarray(cols_dict[i], dtype=np.uint64)
            k = c.shape[1]
            while k > 1 and not c[:, k - 1].any():
                k -= 1
            packed.append(c[:, :k])
        return dict(zip(keys, F.encode_canonical_mixed(packed)))
    if hasattr(F, "encode_canonical_u64_many"):
        return dict(zip(keys, F.encode_canonical_u64_many(
            [cols_dict[i] for i in keys])))
    return {i: F.encode_canonical_u64(cols_dict[i]) for i in keys}
