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

from ..air.expr import (LdeContext, evaluate_lde,
                        evaluate_lde_folded, trace_arguments)
from ..fields._jit import fuse_unless_unsafe
from ..ntt import intt, powers, powers_host, coset_eval_from_coeffs, field_sum
from .openings import open_columns
from .ark import ArkProof, ArkQueries, FriLayer, MerkleView
from .fri import FriProver, bitrev_perm, bitrev_int
from .options import ProofOptions
from .scheme import get_scheme


# wall-clock of each phase of the most recent prove(), as (label, seconds)
# deltas — consumed by bench.py's detail and the profiling docs
LAST_PHASES = []


def _phase_logger():
    """Per-phase wall clock: always recorded into LAST_PHASES; printed
    when SANDSTORM_TPU_TRACE_PHASES=1.

    log(msg, sync=arr) first forces the device stream by fetching one
    element of arr — on the tunneled axon platform block_until_ready
    returns before execution finishes, so without a fetch a phase's queued
    device work would be charged to whichever later phase first pulls a
    value to the host."""
    verbose = bool(os.environ.get("SANDSTORM_TPU_TRACE_PHASES"))
    t0 = time.time()
    last = [t0]
    LAST_PHASES.clear()

    def log(msg, sync=None):
        if sync is not None:
            jax.device_get(jnp.ravel(sync)[:1])
        now = time.time()
        LAST_PHASES.append((msg, round(now - last[0], 3)))
        last[0] = now
        if verbose:
            print(f"[prove +{now - t0:7.1f}s] {msg}", flush=True)
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
    """[n, L] trace column -> (coeffs [n, L], lde [N, L]).

    Under an active mesh the column is committed to axis-0 sharding and
    both transforms run as four-step all_to_all NTTs (parallel/dist.py)."""
    from ..parallel import runtime
    column = runtime.shard0(column)
    coeffs = intt(F, column)
    lde = coset_eval_from_coeffs(F, coeffs, column.shape[0] * blowup, coset)
    return coeffs, lde


def _ntt_col_batch(F, n: int) -> int:
    """Columns per batched transform: the four-step holds ~4 transient
    copies of the batch, so cap the batch at ~1GB of column data (all
    columns at recursive scale; 4 at a time at starknet's 2^22)."""
    per_col = n * F.NLIMBS * 4
    return max(1, (1 << 30) // per_col)


def _lde_and_coeffs_batched(F, cols: dict, blowup, coset):
    """All columns through batched transforms (the Pallas four-step NTT's
    batch axis carries the column set: ~C x fewer dispatches and full
    leaf-lane occupancy), sub-batched to bound transient HBM."""
    from ..ntt.ntt_pallas import batched_ntt_cols
    keys = sorted(cols)
    n = cols[keys[0]].shape[0]
    N = n * blowup
    n_inv = F.encode_int(pow(n, -1, F.BASE_MODULUS))
    coset_pow = _coset_pow_dev(F, coset, n)
    coeffs, ldes = [], []
    G = _ntt_col_batch(F, N)
    for s in range(0, len(keys), G):
        raw = batched_ntt_cols(F, [cols[i] for i in keys[s:s + G]], True)
        cfs = [_scale_pad(F, c, n_inv, 0) for c in raw]
        del raw
        scaled = [_scale_pad(F, c, coset_pow, N - n) for c in cfs]
        ldes.extend(batched_ntt_cols(F, scaled, False))
        del scaled
        coeffs.extend(cfs)
    return (dict(zip(keys, coeffs)), dict(zip(keys, ldes)))


def _coset_pow_dev(F, coset: int, n: int):
    """Device-resident [n, L] coset power table (powers_host returns a
    numpy array: passing it straight into per-column jitted ops re-uploads
    ~16MB per column per prove through the tunnel)."""
    from ..ntt.ntt_pallas import _dev
    return _dev(("cosetpow", F.NAME, coset, n),
                lambda: powers_host(F, coset, n))


@jax.jit
def _gather_stack(cols, idx):
    """tuple of [N, L] -> [C, Q, L] row gather (query assembly)."""
    return jnp.stack([jnp.take(c, idx, axis=0) for c in cols])


@functools.partial(jax.jit, static_argnums=(0, 3))
def _scale_pad(F, col, scale, pad_rows: int):
    """col * scale, zero-padded to pad_rows extra rows (one dispatch)."""
    out = F.mul(col, scale)
    if pad_rows:
        out = jnp.concatenate(
            [out, jnp.zeros((pad_rows,) + out.shape[1:], dtype=out.dtype)],
            axis=0)
    return out


def _coset_eval_multi(F, col_coeffs: list, N: int, coset: int):
    """Evaluate several same-degree coefficient columns on the coset
    domain with ONE batched forward NTT (single-chip Pallas path), else
    per-column."""
    from ..parallel import runtime
    from ..ntt.ntt_pallas import pallas_ntt_ok, batched_ntt_cols
    n = col_coeffs[0].shape[0] if col_coeffs else 0
    if (runtime.active_mesh() is None and len(col_coeffs) > 1
            and pallas_ntt_ok(F, N)):
        coset_pow = _coset_pow_dev(F, coset, n)
        scaled = [_scale_pad(F, cc, coset_pow, N - n) for cc in col_coeffs]
        return batched_ntt_cols(F, scaled, False)
    return [coset_eval_from_coeffs(F, cc, N, coset) for cc in col_coeffs]


def _lde_and_coeffs_multi(F, cols: dict, blowup, coset):
    """Dispatch: batched single-chip Pallas path, else per-column."""
    from ..parallel import runtime
    from ..ntt.ntt_pallas import pallas_ntt_ok
    keys = sorted(cols)
    n = cols[keys[0]].shape[0] if keys else 0
    if (runtime.active_mesh() is None and len(keys) > 1
            and pallas_ntt_ok(F, n) and pallas_ntt_ok(F, n * blowup)):
        return _lde_and_coeffs_batched(F, cols, blowup, coset)
    out_c, out_l = {}, {}
    for i in keys:
        out_c[i], out_l[i] = _lde_and_coeffs(F, cols[i], blowup, coset)
    return out_c, out_l




class _DomainCache:
    def __init__(self, F, N, coset):
        self.F = F
        self.N = N
        self.coset = coset
        self.w = F.root_of_unity_int(N)
        self._cache = {}

    def domain(self):
        return self.x_pow(1, self.N)

    def x_pow(self, e, period=None):
        """[period, L] array of (coset * w^i)^e; period = N/gcd(N, e)."""
        # the domain lives in the base field
        F = self.F
        p = F.BASE_MODULUS
        if period is None:
            period = self.N // math.gcd(self.N, e)
        key = (e % (p - 1), period)
        if key not in self._cache:
            we = pow(self.w, e, p)
            ce = F.encode_int(pow(self.coset, e, p))
            if period > (1 << 16):
                # big tables: upload once per PROCESS (LRU device cache) —
                # uploading per prove cost ~1.2s/32MB, and computing them
                # with an on-device scan gave the arrays a different
                # layout, invalidating the persistent compile cache of
                # every consumer graph
                from ..ntt.ntt_pallas import _dev
                tbl = _dev(("xpow", F.NAME, we, period),
                           lambda: powers_host(F, we, period))
            else:
                tbl = powers_host(F, we, max(period, 1))
            self._cache[key] = F.mul(tbl, jnp.broadcast_to(ce, tbl.shape))
        return self._cache[key]


def prove(F, air_config, trace, options: ProofOptions = None,
          scheme=None, mesh=None) -> ArkProof:
    """Prove a trace.  With `mesh` (a jax.sharding.Mesh), the pipeline runs
    SPMD over the mesh: trace columns are sharded on the row axis, every
    interpolate/LDE is the four-step all_to_all NTT, and the constraint
    evaluation, DEEP composition, FRI folds, and Merkle leaf hashing stay
    sharded through XLA's sharding propagation.  The transforms are
    bit-identical to single-chip, so the proof verifies unchanged."""
    if mesh is not None:
        from ..parallel import runtime
        with runtime.mesh_scope(mesh):
            return prove(F, air_config, trace, options, scheme)
    options = options or ProofOptions()
    scheme = get_scheme(scheme)
    if hasattr(scheme, "prewarm"):
        scheme.prewarm(F)
    p = F.MODULUS          # field order (draw bound, Fermat exponents)
    pb = F.BASE_MODULUS    # domain (root-of-unity / coset) arithmetic
    n = trace.trace_len
    blowup = options.lde_blowup_factor
    N = n * blowup
    coset = F.GENERATOR
    g = F.root_of_unity_int(n)
    pub = trace.public_input

    dom = _DomainCache(F, N, coset)
    coin = scheme.make_coin(pub, options, n)
    log = _phase_logger()

    # trees commit rows in the reference's bit-reversed position order:
    # leaf q holds the row at natural LDE index bitrev(q) (PARITY.md)
    from ..ntt.ntt_pallas import _dev
    brev = _dev(("bitrev", N), lambda: bitrev_perm(N))

    def commit_bitrev(lde_cols):
        return scheme.commit(F, [jnp.take(c, brev, axis=0)
                                 for c in lde_cols])

    # -- 1/2: base trace commit -------------------------------------------
    base_cols = trace.base_columns()
    base_coeffs, base_lde = _lde_and_coeffs_multi(F, base_cols, blowup,
                                                  coset)
    log("base columns interpolated + extended",
        sync=base_lde[sorted(base_lde)[0]])
    base_tree = commit_bitrev([base_lde[i] for i in sorted(base_lde)])
    coin.reseed_with_digest(base_tree.root)
    log("base commit")

    # -- 3: challenges + extension columns --------------------------------
    challenges = coin.draw_felts(p, air_config.NUM_CHALLENGES)
    ext_cols = trace.build_extension_columns(challenges)
    log("extension columns built", sync=ext_cols[sorted(ext_cols)[0]])
    ext_coeffs, ext_lde = _lde_and_coeffs_multi(F, ext_cols, blowup, coset)
    log("extension columns interpolated + extended",
        sync=ext_lde[sorted(ext_lde)[0]])
    ext_tree = commit_bitrev([ext_lde[i] for i in sorted(ext_lde)])
    coin.reseed_with_digest(ext_tree.root)
    # the committed LDEs + coefficient arrays supersede the raw trace
    # columns; free them (at starknet scale they hold >1GB of HBM)
    del base_cols, ext_cols
    trace._device_cols = None
    log("extension commit")

    # -- 4: constraint evaluation + composition ----------------------------
    # hints are transcript-derived field values: compute through the host
    # scalar (extension-aware), carry as canonical packed ints
    hints = [int(F.s(h)) for h in
             air_config.gen_hints(n, pub, [F.s(c) for c in challenges], p)]
    alpha_comp = coin.draw_felt(p)
    constraints = air_config.constraints(n, p, g, base_modulus=pb)
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
    alpha_comp_s = F.s(alpha_comp)
    chunk = constraint_chunk_size(F, N)
    grouped_ok = jax.default_backend() == "tpu"  # XLA:CPU compile time
    # explodes on fused multiply-chain graphs (see fields pow_static)
    if grouped_ok:
        # grouped-jit evaluation: one dispatch per ~8 constraints (per
        # chunk at starknet scale) instead of per DAG node — the eager
        # walk was dispatch-latency-bound through the tunnel
        coeff_ints = [int(alpha_comp_s ** i) for i in range(len(constraints))]
        if chunk is None:
            comp = evaluate_lde_folded(constraints, ctx, N, coeff_ints)
        else:
            from ..air.expr import evaluate_lde_folded_chunked
            comp = evaluate_lde_folded_chunked(constraints, ctx, N,
                                               coeff_ints, chunk)
    else:
        def fold_composition(acc, cv, i):
            coeff = F.encode_int(int(alpha_comp_s ** i))
            term = F.mul(cv, jnp.broadcast_to(coeff, cv.shape))
            return term if acc is None else F.add(acc, term)

        comp = evaluate_lde(constraints, ctx, domain_size=N,
                            fold=fold_composition, chunk_size=chunk)
    log("constraint evaluation", sync=comp)

    # split C(x) = sum_j x^j C_j(x^m); commit the m columns on the LDE
    # domain.  The constraint quotients have degree < m*n (m = CE blowup,
    # fixed per layout), so any lde_blowup_factor >= m works; the columns
    # C_j have degree < n and live on the same N-sized domain as the trace.
    m = air_config.CE_BLOWUP_FACTOR
    assert blowup >= m, (
        f"lde blowup {blowup} below the layout's CE blowup {m}: "
        f"the composition polynomial would not fit the LDE domain")
    comp_coeffs_all = intt(F, comp)
    del comp
    # coset-inverse power table cached on DEVICE: powers_host returns
    # numpy, and feeding it straight to F.mul re-uploaded 32MB through the
    # tunnel (~0.4s) every prove
    comp_coeffs_all = F.mul(comp_coeffs_all,
                            _coset_pow_dev(F, pow(coset, -1, pb), N))
    # each split column C_j has degree < n (composition degree < m*n), so
    # slots n.. of the N/m-length stride slice are zero; trim them so the
    # batched opener sees uniform [n, L] arrays even when blowup > m
    comp_col_coeffs = [comp_coeffs_all[j::m][:n] for j in range(m)]
    del comp_coeffs_all
    comp_lde = _coset_eval_multi(F, comp_col_coeffs, N, coset)
    log("composition interpolated + split + extended", sync=comp_lde[-1])
    comp_tree = commit_bitrev(comp_lde)
    coin.reseed_with_digest(comp_tree.root)
    log("composition commit")

    # -- 5: OODS openings --------------------------------------------------
    z = coin.draw_felt(p)
    targs = trace_arguments(constraints)
    # batched openings: all columns (trace + composition) at all points
    # in ONE device round trip (stark/openings.py)
    z_m = int(F.s(z) ** m)
    comp_base = 1000  # key offset for composition columns in the stack
    coeffs_all = {**base_coeffs, **ext_coeffs}
    stack = dict(coeffs_all)
    for l, cc in enumerate(comp_col_coeffs):
        stack[comp_base + l] = cc
    oods_values, extra = open_columns(
        F, stack, targs, z, g, n, extra_points=[z_m],
        extra_cols=[[comp_base + l for l in range(m)]])
    oods_trace_values = [oods_values[a] for a in targs]
    oods_comp_values = [extra[0][comp_base + l] for l in range(m)]
    coin.reseed_with_field_element_vector(
        p, oods_trace_values + oods_comp_values)
    # coefficient arrays served their last purpose (the openings); the
    # query phase only reads LDE rows — free ~1.5GB before DEEP/FRI
    del stack, coeffs_all, base_coeffs, ext_coeffs, comp_col_coeffs
    log("OODS openings")

    # -- DEEP composition --------------------------------------------------
    alpha_deep = coin.draw_felt(p)
    deep = _deep_compose(
        F, dom, targs, {**base_lde, **ext_lde}, comp_lde,
        oods_trace_values, oods_comp_values, z, g, n, alpha_deep)
    log("DEEP composition", sync=deep)
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
        layer_coset = pow(layer_coset, f, pb)
    log("FRI layers")
    remainder = fri.finalize_remainder(
        evals, layer_sizes[-1] // f if layer_sizes else N, layer_coset)
    coin.reseed_with_field_element_vector(p, remainder)

    # -- 7: PoW + queries --------------------------------------------------
    log("FRI remainder")
    nonce = coin.grind_proof_of_work(options.proof_of_work_bits)
    coin.reseed_with_int(nonce)
    indices = coin.draw_queries(options.num_queries, N)
    log("PoW + queries")

    # batched query assembly: every row gather, tree sibling gather, and
    # FRI opening is queued on ONE FetchPlan and resolved with a single
    # device->host transfer — each separate fetch pays a ~24ms tunnel
    # round trip and the eager structure made ~16 of them.
    # drawn indices are stored (bit-reversed) positions; the LDE arrays
    # are natural-order, so gather at bitrev(idx)
    kN = N.bit_length() - 1
    idx_dev = jnp.asarray([bitrev_int(q, kN) for q in indices])

    from ..merkle import FetchPlan
    plan = FetchPlan()

    def plan_rows(cols):
        return plan.add(
            F.to_canonical_dev(_gather_stack(tuple(cols), idx_dev)))

    h_base = plan_rows([base_lde[i] for i in sorted(base_lde)])
    h_ext = plan_rows([ext_lde[i] for i in sorted(ext_lde)])
    h_comp = plan_rows(comp_lde)
    tree_fins = [tree.plan_paths(indices, plan)
                 if hasattr(tree, "plan_paths") else None
                 for tree in (base_tree, ext_tree, comp_tree)]
    fri_finish = fri.open_ark_plan(indices, plan)
    res = plan.run()

    def rows_from(h):
        vals = F.decode_np(res[h])  # [C, Q] object array
        return [[int(vals[c][q]) for c in range(vals.shape[0])]
                for q in range(len(indices))]

    base_rows = rows_from(h_base)
    ext_rows = rows_from(h_ext)
    comp_rows = rows_from(h_comp)

    def views(tree, fin, rows):
        """ark MerkleViews: sibling leaf + nodes above the leaf pair, plus
        the queried row's own digest (ministark field order, stark/ark.py)."""
        paths = fin(res) if fin is not None \
            else [tree.prove(i) for i in indices]
        return [MerkleView(hashed=True, nodes=list(pth[1:]),
                           initial_leaf=pth[0],
                           sibling_leaf=scheme.hash_row(F, row))
                for pth, row in zip(paths, rows)]

    base_views = views(base_tree, tree_fins[0], base_rows)
    ext_views = views(ext_tree, tree_fins[1], ext_rows)
    comp_views = views(comp_tree, tree_fins[2], comp_rows)
    fri_ark = fri_finish(res)
    log("query assembly")

    def flat(rows):
        return [v for row in rows for v in row]

    return ArkProof(
        options=(options.num_queries, options.lde_blowup_factor,
                 options.proof_of_work_bits, options.fri_folding_factor,
                 options.fri_max_remainder_coeffs),
        trace_len=n,
        base_commitment=base_tree.root,
        ext_commitment=ext_tree.root,
        comp_commitment=comp_tree.root,
        fri_layers=[FriLayer(values=vals, proofs=vws, commitment=root)
                    for (vals, vws), root in zip(fri_ark, fri_roots)],
        fri_remainder=remainder,
        pow_nonce=nonce,
        queries=ArkQueries(
            base_values=flat(base_rows), ext_values=flat(ext_rows),
            comp_values=flat(comp_rows), base_proofs=base_views,
            ext_proofs=ext_views, comp_proofs=comp_views),
        execution_ood_evals=oods_trace_values,
        composition_ood_evals=oods_comp_values,
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _deep_den_fwd(F, x, pts):
    """Exclusive prefix products of the DEEP denominators along the
    points axis: returns (total [B, L], pref_excl [K, B, L])."""
    def fwd(carry, pt):
        nxt = F.mul(carry, F.sub(x, jnp.broadcast_to(pt, x.shape)))
        return nxt, carry          # ys[k] = prefix_{k-1} (exclusive)
    return jax.lax.scan(fwd, F.ones(x.shape[:-1]), pts)


@functools.partial(jax.jit, static_argnums=(0,))
def _deep_den_bwd(F, x, pts, pref_excl, inv_total):
    """Backward sweep recovering every 1/(x - pts[k]): [K, B, L]."""
    def bwd(carry, kx):
        pk_prev, pt = kx
        inv_k = F.mul(carry, pk_prev)
        nxt = F.mul(carry, F.sub(x, jnp.broadcast_to(pt, x.shape)))
        return nxt, inv_k
    _, invs = jax.lax.scan(bwd, inv_total, (pref_excl, pts), reverse=True)
    return invs


def _deep_den_scans(F, x, pts):
    """All DEEP denominator inverses for a domain chunk, with ONE
    elementwise inversion total: Montgomery's trick along the POINTS axis.

    x: [B, L] domain chunk; pts: [K, L].  Returns [K, B, L] of
    1/(x - pts[k]).  A per-point batch inversion runs two log2(N)-stage
    scans over the full domain PER POINT (~190 points x 44 passes at
    starknet scale — hours of HBM traffic); this does 3 linear sweeps
    over the K axis instead.  The three pieces are jitted separately so
    the (already cached) batch_inv/Fermat kernel isn't re-inlined into a
    scan graph — one fused graph sent XLA:CPU compile time unbounded.
    """
    total, pref_excl = _deep_den_fwd(F, x, pts)
    inv_total = F.batch_inv(total, 0)
    return _deep_den_bwd(F, x, pts, pref_excl, inv_total)


@fuse_unless_unsafe
def _deep_apply_point(F, acc, ldes, tv, cv, inv_k):
    """acc += inv_k * sum_j cv[j]*(ldes[j] - tv[j]) for one point's terms."""
    numer = None
    for j, lde in enumerate(ldes):
        term = F.sub(lde, jnp.broadcast_to(tv[j], lde.shape))
        term = F.mul(term, jnp.broadcast_to(cv[j], term.shape))
        numer = term if numer is None else F.add(numer, term)
    term = F.mul(numer, inv_k)
    return term if acc is None else F.add(acc, term)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _deep_apply_group(F, col_groups, k0, cols, tvs, cvs, invs, acc):
    """One fused dispatch applying a GROUP of DEEP points.

    col_groups: static tuple (per point) of tuples of column keys;
    cols: dict col-key -> [B, L]; tvs/cvs: tuples of [G_k, L] stacks;
    invs: [K, B, L] denominator inverses (indexed at k0+i); acc: [B, L]
    or None (passed as a zeros array by the caller for pytree stability).
    """
    for i, grp in enumerate(col_groups):
        ldes = [cols[c] for c in grp]
        acc = _deep_apply_point.__wrapped__(
            F, acc, ldes, tvs[i], cvs[i], invs[k0 + i])
    return acc


def _deep_compose(F, dom, targs, trace_lde, comp_lde, oods_trace_values,
                  oods_comp_values, z, g, n, alpha_deep):
    """DEEP polynomial evaluations over the LDE domain (device).

    D(x) = sum_j a^j (T_j(x) - t_j)/(x - z g^{k_j})
         + sum_l a^{T+l} (C_l(x) - c_l)/(x - z^m)

    The domain is processed in chunks; per chunk, all ~K denominator
    inverses come from one fused pair of K-axis scans (_deep_den_scans)
    and each point's terms fold in with one fused dispatch.
    """
    pb = F.BASE_MODULUS
    m = len(comp_lde)
    N = next(iter(trace_lde.values())).shape[0]
    offsets = sorted({off for (_, off) in targs})
    zs = F.s(z)
    points = [int(zs * pow(g, off % n, pb)) for off in offsets] \
        + [int(zs ** m)]
    K = len(points)
    domain = dom.domain()

    # group terms by point, in transcript order for the alpha powers
    groups = [[] for _ in range(K)]
    alpha_s = F.s(alpha_deep)
    coeff = F.s(1)
    for j, (col, off) in enumerate(targs):
        groups[offsets.index(off)].append(
            (trace_lde[col], oods_trace_values[j], int(coeff)))
        coeff = coeff * alpha_s
    for l, c_lde in enumerate(comp_lde):
        groups[K - 1].append((c_lde, oods_comp_values[l], int(coeff)))
        coeff = coeff * alpha_s
    # ONE encode + upload for all per-point scalar stacks (the per-group
    # jnp.stack-of-encode_int form made ~2*sum(G_k) tiny device puts)
    flat_t = F.encode_ints(
        [t for grp in groups for (_, t, _) in grp]
        + [c for grp in groups for (_, _, c) in grp]
        + points)
    tv, cv = [], []
    pos = 0
    for grp in groups:
        tv.append(flat_t[pos:pos + len(grp)])
        pos += len(grp)
    for grp in groups:
        cv.append(flat_t[pos:pos + len(grp)])
        pos += len(grp)
    pts_dev = flat_t[pos:pos + K]

    # chunk size: keep the two [K, B, L] scan stacks ~3GB each (HBM is
    # ~15.6GB; a single chunk at recursive scale avoids the per-chunk
    # queue drain + concat)
    B = N
    while K * B * F.NLIMBS * 4 > (3 << 30):
        B //= 2

    # column identity per term (trace cols by key, comp cols offset past
    # them) so point-groups can be applied in ONE fused dispatch each —
    # the per-point eager loop was dispatch-latency-bound on the tunnel
    comp_ids = {id(c): 10000 + l for l, c in enumerate(comp_lde)}
    all_cols = {**{k: v for k, v in trace_lde.items()},
                **{10000 + l: c for l, c in enumerate(comp_lde)}}

    def col_key(arr):
        got = comp_ids.get(id(arr))
        if got is not None:
            return got
        for k, v in trace_lde.items():
            if v is arr:
                return k
        raise KeyError("unknown DEEP column")

    group_keys = [tuple(col_key(lde) for (lde, _, _) in grp)
                  for grp in groups]
    PG = 8  # points per fused dispatch (bounds graph size for the
    # remote compiler; see fri.py on oversized fused graphs)
    # TPU-gated like the grouped constraint fold: XLA:CPU compile time
    # explodes on fused multiply-chain graphs (SANDSTORM_TPU_FUSE_DEEP
    # overrides for tests)
    ov = os.environ.get("SANDSTORM_TPU_FUSE_DEEP")
    # fuse on TPU for every field (the unfused-for-GL3 rule is an XLA:CPU
    # compile-time pathology, see fields/_jit.py)
    fuse = ov == "1" if ov is not None \
        else jax.default_backend() == "tpu"

    acc_chunks = []
    for s in range(0, N, B):
        invs = _deep_den_scans(F, domain[s:s + B], pts_dev)  # [K, B, L]
        cols_chunk = {k: v[s:s + B] for k, v in all_cols.items()}
        if fuse:
            acc = F.zeros((min(B, N - s),))
            for k0 in range(0, K, PG):
                grp_struct = tuple(group_keys[k0:k0 + PG])
                acc = _deep_apply_group(
                    F, grp_struct, k0, cols_chunk,
                    tuple(tv[k0:k0 + PG]), tuple(cv[k0:k0 + PG]), invs, acc)
        else:
            acc = None
            for k in range(K):
                ldes = [cols_chunk[ck] for ck in group_keys[k]]
                acc = _deep_apply_point(F, acc, ldes, tv[k], cv[k], invs[k])
        jax.block_until_ready(acc)
        acc_chunks.append(acc)
        del invs
    return jnp.concatenate(acc_chunks, axis=0) if len(acc_chunks) > 1 \
        else acc_chunks[0]
