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
