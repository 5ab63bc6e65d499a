"""FRI low-degree proof: device-side folding, host-side per-query checks.

Engine parity with miniSTARK's FRI (fold factor 8, remainder cap — proof
options at /root/reference cli/src/main.rs:51-60).  The fold of a factor-f
layer is an f-point inverse DFT per coset expressed as f^2 scalar-array
multiply-adds plus a Horner combine — whole-array ops that XLA fuses and,
later, an MXU-shaped f x f matmul.

Math: with P(x) = sum_j x^j Q_j(x^f), the committed layer rows are the
cosets {x_i * mu^t} (mu = w^(N/f) the order-f root).  Then

    Q_j(y_i) = x_i^{-j} * sum_t mu^{-tj} P(x_i mu^t)
    P'(y_i)  = sum_j beta^j Q_j(y_i)        (y_i = x_i^f, next-layer domain)

Note the missing 1/f: this is StarkWare's unnormalized fold (each binary
halving computes (P(x)+P(-x)) + (beta/x)(P(x)-P(-x)) without dividing by
2, evm-verifier FriLayer.sol), so one f=8 fold equals 8x the interpolated
DRP value.  Recovered from /root/reference/bootloader-proof.bin and
verified against every opened row (see PARITY.md "Reference proof-format
facts"); fri_folding_factor 2 and 4 use the same formula (scale f).

Layer l lives on the coset c^(f^l) * <w_N^(f^l)>.  Commitments use the
reference's bit-reversed storage order: leaf b of a size-N_l layer holds
the f coset values of natural coset index rev(b) with slot t holding the
mu^rev3(t) member, i.e. stored[8b+t] = P(c * w^bitrev(8b+t)).  A drawn
query index is a *stored* index; it collapses q -> q // f per layer.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields._jit import fuse_unless_unsafe
from ..ntt import intt, powers_host


@functools.partial(jax.jit, static_argnums=(0, 1))
def _fold_halvings(F, stages: int, evals, xinv, scals):
    """`stages` unnormalized binary halvings in ONE dispatch.

    evals: [N, L] natural order; xinv: [N/2, L] table of w_N^{-i}
    (Montgomery); scals: [stages, L] stage scalars beta^(2^s)*coset^(-2^s).
    Halving s pairs index i with i + half (x and -x since w^{N/2} = -1):
        out[i] = (f(x)+f(-x)) + beta_s/x * (f(x)-f(-x))
    with 1/x_i = coset^(-2^s) * w^(-(2^s) i) = scals[s] * xinv[(2^s) i].
    """
    cur = evals
    for s in range(stages):
        half = cur.shape[0] // 2
        top, bot = cur[:half], cur[half:]
        binv = F.mul(xinv[:: 1 << s][:half],
                     jnp.broadcast_to(scals[s], (half,) + scals.shape[1:]))
        t = F.mul(F.sub(top, bot), binv)
        cur = F.add(F.add(top, bot), t)
    return cur


def fri_fold_device(F, evals, coset: int, layer_size: int, f: int,
                    beta_int: int):
    """One FRI fold: [N, L] -> [N/f, L].

    The factor-f fold is log2(f) unnormalized binary halvings with beta,
    beta^2, beta^4 (StarkWare's evm-verifier FriLayer.sol convention —
    see module docstring): 7N/8 montmuls total for f=8, fused into one
    jitted dispatch.  Equivalent to the f-point inverse-DFT + Horner form
    (tests/test_ntt.py cross-checks against fri_fold_host).
    """
    p = F.BASE_MODULUS  # fold geometry (roots, coset) is base-field
    N = layer_size
    assert evals.shape[0] == N
    stages = f.bit_length() - 1
    assert 1 << stages == f
    w_inv = pow(F.root_of_unity_int(N), -1, p)

    from ..ntt.ntt_pallas import _dev
    xinv = _dev(("fri_xinv2", F.NAME, w_inv % p, N // 2),
                lambda: powers_host(F, w_inv, N // 2))
    c_inv = pow(coset, -1, p)
    bs = F.s(beta_int)
    # base-field scalars embed via their packed form (coordinate 0)
    scals = jnp.stack([
        F.encode_int(int((bs ** (1 << s)) * F.s(pow(c_inv, 1 << s, p))))
        for s in range(stages)])
    return _fold_halvings(F, stages, evals, xinv, scals)


def fri_fold_host(p: int, row, i: int, layer_size: int, coset: int,
                  w: int, f: int, beta: int) -> int:
    """Verifier-side fold of one committed row (python ints).

    row: the f values [P(x_i mu^t)]_t at reduced index i of the layer.
    """
    mu_inv = pow(w, -(layer_size // f), p)
    x_inv = pow(coset * pow(w, i, p) % p, -1, p)
    acc = 0
    bx = beta * x_inv % p
    for j in range(f - 1, -1, -1):
        q_j = sum(pow(mu_inv, t * j, p) * row[t] for t in range(f)) % p
        acc = (acc * bx + q_j) % p
    return acc


def bitrev_perm(n: int):
    """perm[b] = bit-reverse of b over log2(n) bits (shared ntt helper)."""
    from ..ntt.ntt import bit_reverse_perm
    return bit_reverse_perm(n).astype(np.int64)


def bitrev_int(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def layer_rows(evals, f: int):
    """[N, L] natural-order evals -> [N/f, f, L] rows in the reference's
    bit-reversed leaf order: row b slot t = P(coset * w^bitrev(f*b+t))."""
    N = evals.shape[0]
    E = evals.reshape(f, N // f, -1)
    rows = jnp.transpose(E, (1, 0, 2))  # natural: row i slot t = P(x_i mu^t)
    rows = jnp.take(rows, jnp.asarray(bitrev_perm(N // f)), axis=0)
    return jnp.take(rows, jnp.asarray(bitrev_perm(f)), axis=1)


class FriProver:
    """Drives commit-then-fold layers; the transcript lives in the caller."""

    def __init__(self, F, options, domain_size: int, coset: int,
                 scheme=None):
        self.F = F
        self.options = options
        self.N0 = domain_size
        self.coset0 = coset
        if scheme is None:
            from .scheme import GenericScheme
            scheme = GenericScheme()
        self.scheme = scheme
        self.layers = []        # list of (tree, rows_canonical_words, layer_size, coset)
        self.remainder = None   # list of python ints (coefficients)

    def num_layers(self):
        """Layer sizes chosen like the engine: fold while the degree bound
        exceeds fri_max_remainder_coeffs."""
        sizes = []
        N = self.N0
        f = self.options.fri_folding_factor
        b = self.options.lde_blowup_factor
        while N // b > self.options.fri_max_remainder_coeffs and N >= f:
            sizes.append(N)
            N //= f
        return sizes

    def commit_layer(self, evals, layer_size, coset):
        F = self.F
        f = self.options.fri_folding_factor
        rows = layer_rows(evals, f)  # [N/f, f, L] bit-reversed leaf order
        # commit the f coset values of each row as f matrix columns — for
        # the generic scheme this hashes the identical byte stream as one
        # concatenated row
        tree = self.scheme.commit(F, [rows[:, t, :] for t in range(f)])
        self.layers.append((tree, rows, layer_size, coset))
        return tree.root

    def fold(self, evals, layer_size, coset, beta_int):
        F = self.F
        f = self.options.fri_folding_factor
        return fri_fold_device(F, evals, coset, layer_size, f, beta_int)

    def finalize_remainder(self, evals, layer_size, coset):
        """Interpolate the last layer into remainder coefficients.

        Reference convention (PARITY.md): the remainder polynomial R is
        over the offset-FREE domain — the final codeword value at natural
        index j is R(w^j) — so no coset power unscaling is applied.
        """
        F = self.F
        coeffs = intt(F, evals)
        ints = F.decode_ints(coeffs)
        bound = layer_size // self.options.lde_blowup_factor
        assert all(v == 0 for v in ints[bound:]), \
            "FRI remainder has degree above the bound"
        self.remainder = ints[:bound]
        return self.remainder

    def open_ark_plan(self, indices, plan):
        """Queue every layer's row gather + tree sibling gather on `plan`
        (merkle.FetchPlan); returns finish(results) -> [(values, views)]
        per layer in the ark wire form (miniSTARK FriProof layers: values
        + MerkleViews per sorted unique folded leaf —
        crypto/src/merkle/mod.rs:86-166's sharing, realized as leaf-level
        dedup exactly like the reference's checked-in proofs)."""
        from .ark import MerkleView
        F = self.F
        f = self.options.fri_folding_factor
        cur = sorted({int(i) for i in indices})
        metas = []
        for tree, rows, layer_size, coset in self.layers:
            leaves = sorted({i // f for i in cur})
            h = plan.add(F.to_canonical_dev(
                jnp.take(rows, jnp.asarray(leaves), axis=0)))
            fin = tree.plan_paths(leaves, plan) \
                if hasattr(tree, "plan_paths") else None
            metas.append((leaves, h, fin, tree))
            cur = leaves

        def finish(res):
            out = []
            for leaves, h, fin, tree in metas:
                vals = F.decode_np(res[h])
                paths = fin(res) if fin is not None \
                    else [tree.prove(b) for b in leaves]
                values, views = [], []
                for bi in range(len(leaves)):
                    row = [int(v) for v in vals[bi]]
                    values.extend(row)
                    views.append(MerkleView(
                        hashed=True, nodes=list(paths[bi][1:]),
                        initial_leaf=paths[bi][0],
                        sibling_leaf=self.scheme.hash_row(F, row)))
                out.append((values, views))
            return out
        return finish

    def open_ark(self, indices):
        from ..merkle import FetchPlan
        plan = FetchPlan()
        finish = self.open_ark_plan(indices, plan)
        return finish(plan.run())
