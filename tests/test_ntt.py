"""NTT tests vs naive python DFT (the reference validates its FFT against
arkworks' Radix2EvaluationDomain; our oracle is direct evaluation)."""

import random

import pytest

from sandstorm_tpu.fields.goldilocks import GL
from sandstorm_tpu.fields.fp252 import Fp252
from sandstorm_tpu.ntt import ntt, intt, coset_lde, poly_eval, powers


def naive_dft(coeffs, w, p):
    n = len(coeffs)
    return [
        sum(c * pow(w, i * k, p) for k, c in enumerate(coeffs)) % p
        for i in range(n)
    ]


@pytest.mark.parametrize("F", [GL, Fp252], ids=["goldilocks", "fp252"])
def test_ntt_matches_naive_dft(F):
    rng = random.Random(10)
    n = 16
    p = F.MODULUS
    coeffs = [rng.randrange(p) for _ in range(n)]
    w = F.root_of_unity_int(n)
    expected = naive_dft(coeffs, w, p)
    got = F.decode_ints(ntt(F, F.encode_ints(coeffs)))
    assert got == expected


@pytest.mark.parametrize("F", [GL, Fp252], ids=["goldilocks", "fp252"])
def test_intt_roundtrip(F):
    rng = random.Random(11)
    n = 64
    p = F.MODULUS
    vals = [rng.randrange(p) for _ in range(n)]
    arr = F.encode_ints(vals)
    assert F.decode_ints(intt(F, ntt(F, arr))) == vals
    assert F.decode_ints(ntt(F, intt(F, arr))) == vals


@pytest.mark.parametrize("F", [GL, Fp252], ids=["goldilocks", "fp252"])
def test_coset_lde(F):
    rng = random.Random(12)
    n, blowup = 8, 4
    p = F.MODULUS
    coeffs = [rng.randrange(p) for _ in range(n)]
    w_n = F.root_of_unity_int(n)
    evals = naive_dft(coeffs, w_n, p)
    coset = F.GENERATOR
    lde = F.decode_ints(coset_lde(F, F.encode_ints(evals), blowup, coset))
    N = n * blowup
    w_N = F.root_of_unity_int(N)
    for i in range(N):
        x = coset * pow(w_N, i, p) % p
        expected = sum(c * pow(x, k, p) for k, c in enumerate(coeffs)) % p
        assert lde[i] == expected, f"mismatch at {i}"


def test_powers_and_poly_eval():
    F = Fp252
    p = F.MODULUS
    rng = random.Random(13)
    base = rng.randrange(p)
    pw = F.decode_ints(powers(F, F.encode_int(base), 20))
    assert pw == [pow(base, i, p) for i in range(20)]

    coeffs = [rng.randrange(p) for _ in range(10)]
    z = rng.randrange(p)
    got = F.decode_ints(poly_eval(F, F.encode_ints(coeffs), F.encode_int(z)))[0]
    assert got == sum(c * pow(z, k, p) for k, c in enumerate(coeffs)) % p


class _MockRef:
    """Eager stand-in for a pallas VMEM Ref (CPU validation of the kernel
    body without Mosaic — the real pallas_call path needs TPU hardware)."""

    def __init__(self, arr):
        self.arr = arr
        self.shape = arr.shape

    def __getitem__(self, k):
        return self.arr[k]

    def __setitem__(self, k, v):
        self.arr = self.arr.at[k].set(v)


@pytest.mark.parametrize("field", ["fp252", "goldilocks"])
def test_pallas_fourstep_kernel_math(field):
    """The VMEM-resident DIT butterfly kernel (ntt_pallas._mk_ntt_kernel)
    and the four-step driver reproduce the scan NTT bit-for-bit, forward
    and inverse (the 1/n scale included), for both Pallas fields."""
    import jax.numpy as jnp
    import numpy as np
    from sandstorm_tpu.ntt import ntt_pallas as mod
    from sandstorm_tpu.ntt.ntt import ntt as ntt_ref
    if field == "fp252":
        from sandstorm_tpu.fields.fp252 import Fp252 as F
    else:
        from sandstorm_tpu.fields.goldilocks import GL as F

    def eager_leaf_call(x_dm, tw, fname=field, interpret=False):
        TB = mod.TB
        kernel = mod._mk_ntt_kernel(fname)
        outs = []
        for i in range(x_dm.shape[2] // TB):
            xi = _MockRef(x_dm[:, :, i * TB:(i + 1) * TB])
            oi = _MockRef(jnp.zeros_like(xi.arr))
            kernel(xi, tw, oi)
            outs.append(oi.arr)
        return jnp.concatenate(outs, axis=2)

    orig = mod._ntt_leaf_call
    mod._ntt_leaf_call = eager_leaf_call
    try:
        rng = random.Random(3)
        n = 512
        vals = [rng.randrange(F.MODULUS) for _ in range(n)]
        a = jnp.asarray(F.encode_ints_np(vals))
        ref = np.asarray(ntt_ref(F, a, local=True))
        got = np.asarray(mod._batched_ntt_axis0(F, a[:, None, :], False)[:, 0, :])
        assert np.array_equal(ref, got)
        refi = np.asarray(ntt_ref(F, a, inverse=True, local=True))
        goti = np.asarray(mod.ntt_fourstep(F, a, inverse=True))
        assert np.array_equal(refi, goti)
    finally:
        mod._ntt_leaf_call = orig


def test_batched_lde_matches_per_column():
    """The prover's batched multi-column LDE (one four-step transform for
    the whole column set) must equal per-column intt+coset_lde."""
    import jax.numpy as jnp
    import numpy as np
    from sandstorm_tpu.fields.fp252 import Fp252 as F
    from sandstorm_tpu.ntt import ntt_pallas as mod
    from sandstorm_tpu.stark.prover import (_lde_and_coeffs,
                                            _lde_and_coeffs_batched)

    def eager_leaf_call(x_dm, tw, fname="fp252", interpret=False):
        TB = mod.TB
        kernel = mod._mk_ntt_kernel(fname)
        outs = []
        for i in range(x_dm.shape[2] // TB):
            xi = _MockRef(x_dm[:, :, i * TB:(i + 1) * TB])
            oi = _MockRef(jnp.zeros_like(xi.arr))
            kernel(xi, tw, oi)
            outs.append(oi.arr)
        return jnp.concatenate(outs, axis=2)

    orig = mod._ntt_leaf_call
    mod._ntt_leaf_call = eager_leaf_call
    try:
        rng = random.Random(5)
        n, blowup, coset = 256, 2, F.GENERATOR
        cols = {i: jnp.asarray(F.encode_ints_np(
            [rng.randrange(F.MODULUS) for _ in range(n)]))
            for i in range(3)}
        bc, bl = _lde_and_coeffs_batched(F, cols, blowup, coset)
        for i in cols:
            rc, rl = _lde_and_coeffs(F, cols[i], blowup, coset)
            assert np.array_equal(np.asarray(rc), np.asarray(bc[i]))
            assert np.array_equal(np.asarray(rl), np.asarray(bl[i]))
    finally:
        mod._ntt_leaf_call = orig


@pytest.mark.parametrize("F", [GL, Fp252], ids=["goldilocks", "fp252"])
@pytest.mark.parametrize("f", [2, 4, 8])
def test_fri_fold_device_matches_host(F, f):
    """The halving-cascade device fold equals the verifier's per-row
    inverse-DFT + Horner fold (stark/fri.py conventions)."""
    import jax.numpy as jnp
    import numpy as np
    from sandstorm_tpu.stark.fri import fri_fold_device, fri_fold_host

    rng = random.Random(7)
    p = F.BASE_MODULUS
    N = 64
    coset = F.GENERATOR
    beta = rng.randrange(2, p)
    vals = [rng.randrange(p) for _ in range(N)]
    evals = F.encode_ints(vals)
    folded = F.decode_ints(fri_fold_device(F, evals, coset, N, f, beta))
    w = F.root_of_unity_int(N)
    for i in range(N // f):
        row = [vals[t * (N // f) + i] for t in range(f)]
        want = fri_fold_host(p, row, i, N, coset, w, f, beta)
        assert folded[i] == want, (f, i)
