"""The STARK prover pipeline.

Engine parity with miniSTARK's Stark::prove as driven by the reference
(call stack documented in SURVEY.md §3.1):

  1. trace build (layout-specific, done by the caller)
  2. interpolate + coset-LDE base columns (device NTT), Merkle-commit
  3. draw challenges; build challenge-dependent extension columns
     (associative-scan permutation products), LDE + commit
  4. evaluate the symbolic constraint DAG over the CE domain (device),
     fold into the composition polynomial with powers of one coefficient
     (SHARP convention, src/lib.rs:102-116), split, commit
  5. OODS point z: open trace polys at z*g^k and composition columns at
     z^m; DEEP-compose with powers of a single draw
  6. FRI commit/fold layers (device) + remainder
  7. proof-of-work grind, query draw, Merkle/FRI decommits

All heavy arrays live on device; the transcript and query assembly are
host-side python ints.
"""

import functools
import math
import os
import time

import jax
import jax.numpy as jnp

from ..air.expr import LdeContext, evaluate_lde, trace_arguments
from ..ntt import intt, powers, powers_host, coset_eval_from_coeffs, field_sum
from .openings import open_columns
from .fri import FriProver
from .options import ProofOptions
from .proof import Proof, QueryOpening
from .scheme import get_scheme


def _phase_logger():
    """Wall-clock phase prints, enabled with SANDSTORM_TPU_TRACE_PHASES=1."""
    if not os.environ.get("SANDSTORM_TPU_TRACE_PHASES"):
        return lambda msg: None
    t0 = time.time()

    def log(msg):
        print(f"[prove +{time.time()-t0:7.1f}s] {msg}", flush=True)
    return log


def constraint_chunk_size(F, N):
    """Evaluation-chunk size: full domain while one [N, L] u32 array stays
    under ~32MB, else B rows capping intermediates at that size — at
    starknet scale (N=2^22, L=16) full-length intermediates are 256MB each
    and the live set exhausts HBM."""
    budget_words = 1 << 23
    B = max(1 << 14, budget_words // F.NLIMBS)
    return None if N <= B else B


def _lde_and_coeffs(F, column, blowup, coset):
    """[n, L] trace column -> (coeffs [n, L], lde [N, L])."""
    coeffs = intt(F, column)
    lde = coset_eval_from_coeffs(F, coeffs, column.shape[0] * blowup, coset)
    return coeffs, lde




class _DomainCache:
    def __init__(self, F, N, coset):
        self.F = F
        self.N = N
        self.coset = coset
        p = F.MODULUS
        self.w = F.root_of_unity_int(N)
        self._cache = {}

    def domain(self):
        return self.x_pow(1, self.N)

    def x_pow(self, e, period=None):
        """[period, L] array of (coset * w^i)^e; period = N/gcd(N, e)."""
        F, p = self.F, self.F.MODULUS
        if period is None:
            period = self.N // math.gcd(self.N, e)
        key = (e % (p - 1), period)
        if key not in self._cache:
            we = pow(self.w, e, p)
            ce = F.encode_int(pow(self.coset, e, p))
            tbl = powers_host(F, we, max(period, 1))
            self._cache[key] = F.mul(tbl, jnp.broadcast_to(ce, tbl.shape))
        return self._cache[key]


def prove(F, air_config, trace, options: ProofOptions = None,
          scheme=None) -> Proof:
    options = options or ProofOptions()
    scheme = get_scheme(scheme)
    p = F.MODULUS
    n = trace.trace_len
    blowup = options.lde_blowup_factor
    N = n * blowup
    coset = F.GENERATOR
    g = F.root_of_unity_int(n)
    pub = trace.public_input

    dom = _DomainCache(F, N, coset)
    coin = scheme.make_coin(pub, options, n)
    log = _phase_logger()

    # -- 1/2: base trace commit -------------------------------------------
    base_cols = trace.base_columns()
    base_coeffs, base_lde = {}, {}
    for i, col in base_cols.items():
        base_coeffs[i], base_lde[i] = _lde_and_coeffs(F, col, blowup, coset)
    log("base columns interpolated + extended")
    base_tree = scheme.commit(F, [base_lde[i] for i in sorted(base_lde)])
    coin.reseed_with_digest(base_tree.root)
    log("base commit")

    # -- 3: challenges + extension columns --------------------------------
    challenges = coin.draw_felts(p, air_config.NUM_CHALLENGES)
    ext_cols = trace.build_extension_columns(challenges)
    ext_coeffs, ext_lde = {}, {}
    for i, col in ext_cols.items():
        ext_coeffs[i], ext_lde[i] = _lde_and_coeffs(F, col, blowup, coset)
    ext_tree = scheme.commit(F, [ext_lde[i] for i in sorted(ext_lde)])
    coin.reseed_with_digest(ext_tree.root)
    # the committed LDEs + coefficient arrays supersede the raw trace
    # columns; free them (at starknet scale they hold >1GB of HBM)
    del base_cols, ext_cols
    trace._device_cols = None
    log("extension commit")

    # -- 4: constraint evaluation + composition ----------------------------
    hints = air_config.gen_hints(n, pub, challenges, p)
    alpha_comp = coin.draw_felt(p)
    constraints = air_config.constraints(n, p, g)
    periodic_cols = (air_config.periodic_columns(n)
                     if hasattr(air_config, "periodic_columns") else [])
    ctx = LdeContext(
        F,
        columns={**base_lde, **ext_lde},
        blowup=blowup,
        domain_fn=dom.domain,
        x_pow_fn=dom.x_pow,
        challenges=[F.encode_int(c) for c in challenges],
        hints=[F.encode_int(h) for h in hints],
        periodic=[pc.lde_fn(F, dom) for pc in periodic_cols],
        coset=coset,
    )

    # composition = sum_i alpha^i C_i, folded as constraint values stream
    # out of the evaluator (keeps peak memory at the live set)
    def fold_composition(acc, cv, i):
        coeff = F.encode_int(pow(alpha_comp, i, p))
        term = F.mul(cv, jnp.broadcast_to(coeff, cv.shape))
        return term if acc is None else F.add(acc, term)

    comp = evaluate_lde(constraints, ctx, domain_size=N,
                        fold=fold_composition,
                        chunk_size=constraint_chunk_size(F, N))
    log("constraint evaluation")

    # split C(x) = C0(x^2) + x*C1(x^2); commit [C0, C1] on the LDE domain
    m = air_config.CE_BLOWUP_FACTOR
    assert m == blowup == 2, "round-1 engine assumes ce blowup == lde blowup == 2"
    comp_coeffs_all = intt(F, comp)
    del comp
    comp_coeffs_all = F.mul(comp_coeffs_all, powers_host(F, pow(coset, -1, p), N))
    comp_col_coeffs = [comp_coeffs_all[j::m] for j in range(m)]
    del comp_coeffs_all
    comp_lde = [coset_eval_from_coeffs(F, cc, N, coset)
                for cc in comp_col_coeffs]
    comp_tree = scheme.commit(F, comp_lde)
    coin.reseed_with_digest(comp_tree.root)
    log("composition commit")

    # -- 5: OODS openings --------------------------------------------------
    z = coin.draw_felt(p)
    targs = trace_arguments(constraints)
    # batched openings: all columns (trace + composition) at all points
    # in ONE device round trip (stark/openings.py)
    z_m = pow(z, m, p)
    comp_base = 1000  # key offset for composition columns in the stack
    coeffs_all = {**base_coeffs, **ext_coeffs}
    stack = dict(coeffs_all)
    for l, cc in enumerate(comp_col_coeffs):
        stack[comp_base + l] = cc
    oods_values, extra = open_columns(
        F, stack, targs, z, g, n, extra_points=[z_m])
    oods_trace_values = [oods_values[a] for a in targs]
    oods_comp_values = [extra[0][comp_base + l] for l in range(m)]
    coin.reseed_with_field_elements(p, oods_trace_values + oods_comp_values)
    # coefficient arrays served their last purpose (the openings); the
    # query phase only reads LDE rows — free ~1.5GB before DEEP/FRI
    del stack, coeffs_all, base_coeffs, ext_coeffs, comp_col_coeffs
    log("OODS openings")

    # -- DEEP composition --------------------------------------------------
    alpha_deep = coin.draw_felt(p)
    deep = _deep_compose(
        F, dom, targs, {**base_lde, **ext_lde}, comp_lde,
        oods_trace_values, oods_comp_values, z, g, n, alpha_deep)
    dom._cache.clear()  # drops the cached [N, L] domain + zerofier tables

    # -- 6: FRI ------------------------------------------------------------
    fri = FriProver(F, options, N, coset, scheme=scheme)
    fri_roots = []
    evals = deep
    layer_sizes = fri.num_layers()
    f = options.fri_folding_factor
    layer_coset = coset
    for layer_size in layer_sizes:
        root = fri.commit_layer(evals, layer_size, layer_coset)
        fri_roots.append(root)
        coin.reseed_with_digest(root)
        beta = coin.draw_felt(p)
        evals = fri.fold(evals, layer_size, layer_coset, beta)
        layer_coset = pow(layer_coset, f, p)
    log("FRI layers")
    remainder = fri.finalize_remainder(
        evals, layer_sizes[-1] // f if layer_sizes else N, layer_coset)
    coin.reseed_with_field_elements(p, remainder)

    # -- 7: PoW + queries --------------------------------------------------
    log("FRI remainder")
    nonce = coin.grind_proof_of_work(options.proof_of_work_bits)
    coin.reseed_with_int(nonce)
    indices = coin.draw_queries(options.num_queries, N)
    log("PoW + queries")

    base_lde_list = [base_lde[i] for i in sorted(base_lde)]
    ext_lde_list = [ext_lde[i] for i in sorted(ext_lde)]
    openings = []
    for idx in indices:
        base_row = [int(F.decode(c[idx])) for c in base_lde_list]
        ext_row = [int(F.decode(c[idx])) for c in ext_lde_list]
        comp_row = [int(F.decode(c[idx])) for c in comp_lde]
        fri_openings = fri.open_query(idx)
        openings.append(QueryOpening(
            base_row=base_row, ext_row=ext_row, comp_row=comp_row,
            base_path=base_tree.prove(idx),
            ext_path=ext_tree.prove(idx),
            comp_path=comp_tree.prove(idx),
            fri_rows=[r for r, _ in fri_openings],
            fri_paths=[pth for _, pth in fri_openings],
        ))

    return Proof(
        options=options, trace_len=n,
        base_root=base_tree.root, ext_root=ext_tree.root,
        comp_root=comp_tree.root,
        oods_trace_values=oods_trace_values,
        oods_comp_values=oods_comp_values,
        fri_roots=fri_roots, fri_remainder=remainder,
        pow_nonce=nonce, openings=openings,
    )


def _deep_compose(F, dom, targs, trace_lde, comp_lde, oods_trace_values,
                  oods_comp_values, z, g, n, alpha_deep):
    """DEEP polynomial evaluations over the LDE domain (device).

    D(x) = sum_j a^j (T_j(x) - t_j)/(x - z g^{k_j})
         + sum_l a^{T+l} (C_l(x) - c_l)/(x - z^m)

    Terms sharing a denominator point are grouped; points are processed one
    at a time (sum terms, one batch inversion, accumulate) so peak memory
    stays at a few domain-length arrays regardless of the trace-argument
    count.
    """
    p = F.MODULUS
    m = len(comp_lde)
    offsets = sorted({off for (_, off) in targs})
    points = [z * pow(g, off % n, p) % p for off in offsets] + [pow(z, m, p)]
    domain = dom.domain()

    # (point index, lde array, oods value, deep coefficient) per term, in
    # transcript order for the alpha powers
    terms = []
    coeff = 1
    for j, (col, off) in enumerate(targs):
        terms.append((offsets.index(off), trace_lde[col],
                      oods_trace_values[j], coeff))
        coeff = coeff * alpha_deep % p
    for l, c_lde in enumerate(comp_lde):
        terms.append((len(points) - 1, c_lde, oods_comp_values[l], coeff))
        coeff = coeff * alpha_deep % p

    acc = None
    for k, pt in enumerate(points):
        numer = None
        for (ki, lde, oods_val, cf) in terms:
            if ki != k:
                continue
            t = F.encode_int(oods_val)
            term = F.sub(lde, jnp.broadcast_to(t, lde.shape))
            cdev = F.encode_int(cf)
            term = F.mul(term, jnp.broadcast_to(cdev, term.shape))
            numer = term if numer is None else F.add(numer, term)
        den = F.sub(domain, jnp.broadcast_to(F.encode_int(pt), domain.shape))
        term = F.mul(numer, F.batch_inv(den, 0))
        acc = term if acc is None else F.add(acc, term)
    return acc
