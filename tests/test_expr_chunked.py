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
