"""The chunked LDE constraint evaluator must match the full-domain path
bit-for-bit (sandstorm_tpu/air/expr.py::_evaluate_lde_chunked) — same DAG,
same domain, evaluated in B-row windows with short-period value reuse.
"""

import random

import jax.numpy as jnp
import pytest

from sandstorm_tpu.air.expr import (LdeContext, Trace, Challenge, Hint,
                                    Periodic, X, evaluate_lde)
from sandstorm_tpu.fields.goldilocks import GL as F
from sandstorm_tpu.layouts.utils import PeriodicColumn
from sandstorm_tpu.stark.prover import _DomainCache


@pytest.mark.parametrize("chunk", [16, 32])
def test_chunked_matches_full(chunk):
    p = F.MODULUS
    rng = random.Random(7)
    n, blowup = 32, 2
    N = n * blowup
    coset = F.GENERATOR
    dom = _DomainCache(F, N, coset)

    cols = {i: F.encode_ints([rng.randrange(p) for _ in range(N)])
            for i in range(3)}
    challenges = [F.encode_int(rng.randrange(1, p)) for _ in range(2)]
    hints = [F.encode_int(rng.randrange(1, p))]

    # an 8-periodic column over the trace domain
    pvals = [rng.randrange(p) for _ in range(8)]
    pc = PeriodicColumn.from_table(
        pvals, 8, p, F.root_of_unity_int(8)).bind(n)

    exprs = [
        (Trace(0, 0) * Trace(1, 1) - Challenge(0)) * X
        + (X.pow(n // 8) - 1) * Trace(2, 3),
        (Trace(0, 2) + Hint(0)) / (X.pow(n) - 1) * Periodic(0),
        X.pow(3) * Trace(1, 0) - Trace(2, 5) * Challenge(1)
        + (Trace(0, 1) - Trace(1, 2)).pow(2) / (X.pow(n // 4) - 1),
    ]
    weights = [rng.randrange(1, p) for _ in exprs]

    def make_ctx():
        return LdeContext(
            F, columns=cols, blowup=blowup, domain_fn=dom.domain,
            x_pow_fn=dom.x_pow, challenges=challenges, hints=hints,
            periodic=[pc.lde_fn(F, dom)], coset=coset)

    def fold(acc, cv, i):
        w = F.encode_int(weights[i])
        term = F.mul(cv, jnp.broadcast_to(w, cv.shape))
        return term if acc is None else F.add(acc, term)

    full = evaluate_lde(exprs, make_ctx(), domain_size=N, fold=fold)
    chunked = evaluate_lde(exprs, make_ctx(), domain_size=N, fold=fold,
                           chunk_size=chunk)
    assert (jnp.asarray(full) == jnp.asarray(chunked)).all()


def test_grouped_folded_matches_eager():
    """evaluate_lde_folded (the TPU grouped-jit composition fold) ==
    the eager per-node walk with the same coefficients."""
    import jax.numpy as jnp
    from sandstorm_tpu.air import expr as E
    from sandstorm_tpu.fields.fp252 import Fp252 as F
    from sandstorm_tpu.ntt import powers_host

    N, blowup = 32, 2
    rng = random.Random(11)
    cols = {i: F.encode_ints([rng.randrange(F.MODULUS) for _ in range(N)])
            for i in range(2)}
    w = F.root_of_unity_int(N)
    coset = F.GENERATOR

    def x_pow(e, period=None):
        period = period or N
        we = pow(w, e, F.MODULUS)
        tbl = powers_host(F, we, period)
        ce = F.encode_int(pow(coset, e, F.MODULUS))
        return F.mul(jnp.asarray(tbl), jnp.broadcast_to(ce, tbl.shape))

    ch = [F.encode_int(rng.randrange(F.MODULUS))]
    t0, t1 = E.Trace(0, 0), E.Trace(1, 1)
    exprs = [
        t0 * t1 - E.Challenge(0),
        (t0.pow(2) - t1) / (E.X.pow(N // 4) - 1),
        E.X * t1 + t0,
        t1 - 3,
        (t0 - t1).pow(3),
    ]
    coeffs = [rng.randrange(F.MODULUS) for _ in exprs]

    def mk_ctx():
        return E.LdeContext(F, dict(cols), blowup, lambda: x_pow(1, N),
                            x_pow, challenges=list(ch), coset=coset)

    eager = E.evaluate_lde(exprs, mk_ctx(), domain_size=N)
    want = None
    for c, v in zip(coeffs, eager):
        term = F.mul(v, jnp.broadcast_to(F.encode_int(c), v.shape))
        want = term if want is None else F.add(want, term)
    got = E.evaluate_lde_folded(exprs, mk_ctx(), N, coeffs, group_size=2)
    assert F.decode_ints(got) == F.decode_ints(want)


def test_grouped_chunked_matches_eager():
    """evaluate_lde_folded_chunked (the starknet-scale grouped path) ==
    the eager walk, including shared zerofier inverses and trace rolls."""
    import jax.numpy as jnp
    from sandstorm_tpu.air import expr as E
    from sandstorm_tpu.fields.fp252 import Fp252 as F
    from sandstorm_tpu.ntt import powers_host

    N, blowup, B = 64, 2, 16
    rng = random.Random(13)
    cols = {i: F.encode_ints([rng.randrange(F.MODULUS) for _ in range(N)])
            for i in range(2)}
    w = F.root_of_unity_int(N)
    coset = F.GENERATOR

    def x_pow(e, period=None):
        period = period or N
        we = pow(w, e, F.MODULUS)
        tbl = powers_host(F, we, period)
        ce = F.encode_int(pow(coset, e, F.MODULUS))
        return F.mul(jnp.asarray(tbl), jnp.broadcast_to(ce, tbl.shape))

    ch = [F.encode_int(rng.randrange(F.MODULUS))]
    t0, t1 = E.Trace(0, 0), E.Trace(1, 1)
    zer_short = E.X.pow(N // 8) - 1      # period 8 <= B: invariant seed
    zer_long = E.X.pow(3) - 7            # period N: chunk-variant
    exprs = [
        (t0 * t1 - E.Challenge(0)) / zer_short,
        (t0.pow(2) - t1) / zer_short,
        E.X * t1 + t0 / zer_long,
        t1.pow(3) - t0,
    ]
    coeffs = [rng.randrange(F.MODULUS) for _ in exprs]

    def mk_ctx():
        return E.LdeContext(F, dict(cols), blowup, lambda: x_pow(1, N),
                            x_pow, challenges=list(ch), coset=coset)

    eager = E.evaluate_lde(exprs, mk_ctx(), domain_size=N)
    want = None
    for c, v in zip(coeffs, eager):
        term = F.mul(v, jnp.broadcast_to(F.encode_int(c), v.shape))
        want = term if want is None else F.add(want, term)
    got = E.evaluate_lde_folded_chunked(exprs, mk_ctx(), N, coeffs, B,
                                        group_size=2)
    assert F.decode_ints(got) == F.decode_ints(want)
