"""Proof-scheme layer tests: each commitment scheme must round-trip
(commit -> prove -> verify_row) through the engine-facing adapter with the
wire format's fixed 32-byte path entries, and the claim coins must seed
deterministically from the aux input (src/claims.rs:12-33 parity).
"""

import os
import random

import pytest

from sandstorm_tpu.fields.fp252 import Fp252 as F
from sandstorm_tpu.stark.scheme import (GenericScheme, EthVerifierScheme,
                                        CairoVerifierScheme, get_scheme)

EXAMPLE = "/root/reference/example"


def _columns(ncols, nrows=16, seed=3):
    rng = random.Random(seed)
    p = F.MODULUS
    cols_int = [[rng.randrange(p) for _ in range(nrows)]
                for _ in range(ncols)]
    return cols_int, [F.encode_ints(c) for c in cols_int]


@pytest.mark.parametrize("scheme_name", ["generic", "eth", "cairo"])
@pytest.mark.parametrize("ncols", [1, 3])
def test_commit_roundtrip(scheme_name, ncols):
    if scheme_name == "cairo" and ncols == 1:
        # single-column friendly tree = all-algebraic felt leaves
        pass
    scheme = get_scheme(scheme_name)
    cols_int, cols_dev = _columns(ncols)
    tree = scheme.commit(F, cols_dev)
    assert isinstance(tree.root, bytes) and len(tree.root) == 32
    for idx in (0, 7, 15):
        row = [cols_int[c][idx] for c in range(ncols)]
        path = tree.prove(idx)
        assert all(isinstance(s, bytes) and len(s) == 32 for s in path)
        assert scheme.verify_row(F, tree.root, idx, row, path)
        # tampered value must fail
        bad = list(row)
        bad[0] = (bad[0] + 1) % F.MODULUS
        assert not scheme.verify_row(F, tree.root, idx, bad, path)
        # wrong index must fail
        assert not scheme.verify_row(F, tree.root, idx ^ 1, row, path)


def test_friendly_low_high_boundary():
    """With n_friendly < tree height the lower merges are Blake2s, upper
    algebraic; the depth-tag reconstruction must agree with the builder."""
    scheme = CairoVerifierScheme(n_friendly_layers=2)
    cols_int, cols_dev = _columns(3, nrows=32)
    tree = scheme.commit(F, cols_dev)
    for idx in (0, 13, 31):
        row = [cols_int[c][idx] for c in range(3)]
        assert scheme.verify_row(F, tree.root, idx, row, tree.prove(idx))


needs_example = pytest.mark.skipif(
    not os.path.exists(EXAMPLE), reason="reference example artifacts absent")


@needs_example
def test_claim_coins_seed_from_aux_input():
    from sandstorm_tpu.examples import load_artifacts
    from sandstorm_tpu.stark.options import ProofOptions
    program, pub, witness = load_artifacts(
        os.path.join(EXAMPLE, "array-sum.json"),
        os.path.join(EXAMPLE, "air-public-input.json"),
        os.path.join(EXAMPLE, "air-private-input.json"),
        base_dir=EXAMPLE)
    opts = ProofOptions()
    n = pub.n_steps * 16
    for scheme in (EthVerifierScheme(), CairoVerifierScheme()):
        c1 = scheme.make_coin(pub, opts, n)
        c2 = scheme.make_coin(pub, opts, n)
        a, b = c1.draw_felt(F.MODULUS), c2.draw_felt(F.MODULUS)
        assert a == b and 0 < a < F.MODULUS


def test_eth_single_column_unhashed_leaves():
    """The LeafVariant tree commits single-column matrices as raw felts
    (crypto/src/merkle/mod.rs:240+ 'Unhashed')."""
    scheme = EthVerifierScheme()
    cols_int, cols_dev = _columns(1, nrows=8)
    tree = scheme.commit(F, cols_dev)
    path = tree.prove(3)
    assert scheme.verify_row(F, tree.root, 3, [cols_int[0][3]], path)
