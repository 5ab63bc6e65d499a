"""Symbolic AIR constraint expressions, traced to JAX for evaluation.

Capability parity with miniSTARK's Expr<AlgebraicItem> constraint DAG
(SURVEY.md §2.7; used throughout /root/reference layouts/src/*/air.rs):
leaves are X, Constant, Trace(col, offset), Challenge(i), Hint(i),
Periodic(i); ops are +, -, *, /, pow.  The same DAG serves:

- batched evaluation over the LDE/constraint-evaluation domain (the hot
  prover kernel, GPU-evaluated in the reference) — here each node maps to
  whole-array field ops that XLA fuses on the TPU;
- scalar evaluation at the OODS point (verifier and prover both), via the
  same walker with [L]-shaped arrays.

Hash-consing interns structurally-identical nodes, which both deduplicates
the DAG (the analog of miniSTARK's reuse_shared_nodes,
recursive/air.rs:1184-1200) and makes evaluation memoization effective.

Division is represented as multiplication by an Inv node; inverses of
full-domain denominators are batch-inverted with associative scans, and
X^k-style zerofiers are evaluated on their short period and tiled.
"""

import functools
import math

import jax
import jax.numpy as jnp


_INTERN = {}


def _intern(node):
    got = _INTERN.get(node.key)
    if got is not None:
        return got
    _INTERN[node.key] = node
    return node


class Expr:
    """Base class. Subclasses define .key (structural identity) and .args."""

    __slots__ = ("key", "args")

    def __init__(self, key, args=()):
        self.key = key
        self.args = args

    # -- operator sugar ----------------------------------------------------

    def __add__(self, other):
        return Add(self, _coerce(other))

    def __radd__(self, other):
        return Add(_coerce(other), self)

    def __sub__(self, other):
        return Sub(self, _coerce(other))

    def __rsub__(self, other):
        return Sub(_coerce(other), self)

    def __mul__(self, other):
        return Mul(self, _coerce(other))

    def __rmul__(self, other):
        return Mul(_coerce(other), self)

    def __truediv__(self, other):
        return Mul(self, Inv(_coerce(other)))

    def __rtruediv__(self, other):
        return Mul(_coerce(other), Inv(self))

    def __neg__(self):
        return Neg(self)

    def pow(self, e: int):
        return Pow(self, int(e))

    __pow__ = pow

    def __hash__(self):
        return hash(self.key)

    def __eq__(self, other):
        return self is other or (isinstance(other, Expr) and self.key == other.key)


def _coerce(v):
    if isinstance(v, Expr):
        return v
    if isinstance(v, int):
        return Constant(v)
    raise TypeError(f"cannot coerce {type(v)} to Expr")


def constant(v: int):
    return Constant(v)


# -- leaves -----------------------------------------------------------------

class _X(Expr):
    def __init__(self):
        super().__init__(("X",))


X = _intern(_X())


def Constant(value: int):
    node = Expr.__new__(Expr)
    Expr.__init__(node, ("const", int(value)))
    node = _intern(node)
    return node


def Trace(col: int, offset: int):
    node = Expr.__new__(Expr)
    Expr.__init__(node, ("trace", int(col), int(offset)))
    return _intern(node)


def Challenge(index: int):
    node = Expr.__new__(Expr)
    Expr.__init__(node, ("challenge", int(index)))
    return _intern(node)


def Hint(index: int):
    node = Expr.__new__(Expr)
    Expr.__init__(node, ("hint", int(index)))
    return _intern(node)


def Periodic(index: int):
    """A periodic column (see recursive/air.rs:38-50); index into the
    layout's periodic-column registry."""
    node = Expr.__new__(Expr)
    Expr.__init__(node, ("periodic", int(index)))
    return _intern(node)


# -- interior nodes ----------------------------------------------------------

def _binop(name, a, b):
    node = Expr.__new__(Expr)
    Expr.__init__(node, (name, a.key, b.key), (a, b))
    return _intern(node)


def Add(a, b):
    return _binop("add", a, b)


def Sub(a, b):
    return _binop("sub", a, b)


def Mul(a, b):
    return _binop("mul", a, b)


def Neg(a):
    node = Expr.__new__(Expr)
    Expr.__init__(node, ("neg", a.key), (a,))
    return _intern(node)


def Pow(a, e: int):
    node = Expr.__new__(Expr)
    Expr.__init__(node, ("pow", a.key, int(e)), (a,))  # exponent = key[2]
    return _intern(node)


def Inv(a):
    node = Expr.__new__(Expr)
    Expr.__init__(node, ("inv", a.key), (a,))
    return _intern(node)


# -- analysis ----------------------------------------------------------------

def walk(exprs):
    """Yield every unique node reachable from exprs (post-order)."""
    seen = set()
    out = []

    def rec(n):
        if id(n) in seen:
            return
        seen.add(id(n))
        for a in n.args:
            rec(a)
        out.append(n)

    for e in exprs:
        rec(e)
    return out


def trace_arguments(exprs):
    """Sorted set of (column, offset) pairs used by the expressions.

    The analog of miniSTARK Air::trace_arguments() (src/lib.rs:105-110):
    determines which out-of-domain trace evaluations the proof must supply.
    """
    args = set()
    for n in walk(exprs):
        if n.key[0] == "trace":
            args.add((n.key[1], n.key[2]))
    return sorted(args)


# -- evaluation --------------------------------------------------------------

class LdeContext:
    """Everything needed to evaluate constraints over the LDE domain.

    - F: field class
    - columns: dict col_index -> [N, L] LDE evaluations (natural order)
    - blowup: LDE blowup factor (trace offset k => array roll by k*blowup)
    - domain: callable () -> [N, L] domain points (coset * w^i); evaluated
      lazily since many constraint sets only need X through powers
    - x_pow: callable (e) -> [N, L] array of domain^e, expected to exploit
      periodicity
    - challenges / hints: lists of [L] arrays
    - periodic: list of callables () -> [N, L] evaluations
    """

    def __init__(self, F, columns, blowup, domain_fn, x_pow_fn,
                 challenges=(), hints=(), periodic=(), coset=None):
        self.F = F
        self.columns = columns
        self.blowup = blowup
        self.domain_fn = domain_fn
        self.x_pow_fn = x_pow_fn
        self.challenges = challenges
        self.hints = hints
        self.periodic = periodic
        self.coset = coset  # required for chunked evaluation
        self.memo = {}


@functools.lru_cache(maxsize=None)
def _gather_kernel(B: int, shift: int):
    """Jitted wrap-around row gather: rows [start+shift, start+shift+B) mod n
    of a device-resident [n, L] column.  One kernel per (B, shift) pair —
    shift is the static trace-offset roll, start the dynamic chunk base."""
    @jax.jit
    def f(arr, start):
        n = arr.shape[0]
        idx = (start + jnp.uint32(shift)
               + jnp.arange(B, dtype=jnp.uint32)) % jnp.uint32(n)
        return jnp.take(arr, idx, axis=0)
    return f


def evaluate_lde(exprs, ctx: LdeContext, domain_size: int = None,
                 fold=None, chunk_size: int = None):
    """Evaluate expressions over the whole LDE domain; returns list of [N, L].

    Memoized over the hash-consed DAG.  Values are tracked as
    (array, period) pairs: zerofier-style subexpressions built from X^e are
    periodic over the domain (period = N/gcd(N, e), a power of two), so they
    are computed — and crucially batch-INVERTED — on their short period and
    only tiled up when they meet a full-length value.  period=0 denotes a
    scalar ([L]-shaped) value.

    Interior values are reference-counted and evicted from the memo once
    their last consumer has run, so peak memory is the live set (shared
    zerofiers + the current expression path), not the whole DAG — this is
    what makes evaluating ~100-constraint AIRs over multi-million-point
    domains feasible (SURVEY.md §7 hard part 5).

    With `fold=(combine_fn)`, the expression values are combined pairwise
    as they stream out — `acc = combine_fn(acc, value, index)` — and the
    single accumulator is returned instead of the full list (used for the
    composition polynomial sum).
    """
    F = ctx.F
    memo = ctx.memo
    N = domain_size
    if N is None:
        N = next(iter(ctx.columns.values())).shape[0]
    if chunk_size is not None and chunk_size < N:
        return _evaluate_lde_chunked(exprs, ctx, N, fold, chunk_size)

    # reference counts over the hash-consed DAG (+1 per root occurrence)
    refs = {}
    for node in walk(exprs):
        for child in node.args:
            refs[id(child)] = refs.get(id(child), 0) + 1
    for e in exprs:
        refs[id(e)] = refs.get(id(e), 0) + 1

    def tile_to(val, period, target):
        if period == target:
            return val
        if period == 0:
            return jnp.broadcast_to(val, (target,) + val.shape)
        return jnp.tile(val, (target // period, 1))

    def combine(op_fn, a, pa, b, pb):
        p = max(pa, pb)
        return op_fn(tile_to(a, pa, p), tile_to(b, pb, p)), p

    def consume(n):
        """Fetch n's value and release one reference to it.

        Trace leaves are never memoized (see ev) — recompute the roll.
        """
        if id(n) not in memo:
            return ev(n)
        r = memo[id(n)]
        refs[id(n)] -= 1
        if refs[id(n)] == 0:
            del memo[id(n)]
        return r

    def ev(n):
        r = memo.get(id(n))
        if r is not None:
            return r
        k = n.key
        op = k[0]
        if op == "X":
            r = (ctx.domain_fn(), N)
        elif op == "const":
            r = (F.encode_int(k[1]), 0)
        elif op == "trace":
            # NOT memoized: a rolled view is a full domain-length array and
            # dozens of distinct (col, offset) leaves stay live across the
            # whole constraint set if cached — rolls are bandwidth-cheap, so
            # recompute per consumer instead (memory beats compute here)
            col, off = k[1], k[2]
            arr = ctx.columns[col]
            shift = (off * ctx.blowup) % arr.shape[0]
            return (jnp.roll(arr, -shift, axis=0) if shift else arr, N)
        elif op == "challenge":
            r = (ctx.challenges[k[1]], 0)
        elif op == "hint":
            r = (ctx.hints[k[1]], 0)
        elif op == "periodic":
            arr = ctx.periodic[k[1]]()
            r = (arr, arr.shape[0])
        elif op in ("add", "sub", "mul"):
            ev(n.args[0])
            ev(n.args[1])
            a, pa = consume(n.args[0])
            b, pb = consume(n.args[1])
            r = combine(getattr(F, op), a, pa, b, pb)
        elif op == "neg":
            ev(n.args[0])
            a, pa = consume(n.args[0])
            r = (F.neg(a), pa)
        elif op == "pow":
            e = k[2]
            base = n.args[0]
            if base.key[0] == "X":
                import math
                period = N // math.gcd(N, e)
                r = (ctx.x_pow_fn(e, period), period)
            else:
                ev(base)
                a, pa = consume(base)
                r = (F.pow_static(a, e), pa)
        elif op == "inv":
            ev(n.args[0])
            v, pv = consume(n.args[0])
            if pv == 0:
                r = (F.inv(v), 0)
            else:
                r = (F.batch_inv(v, axis=0), pv)
        else:  # pragma: no cover
            raise ValueError(f"unknown node {op}")
        memo[id(n)] = r
        return r

    acc = None
    out = []
    for i, e in enumerate(exprs):
        ev(e)
        v, p = consume(e)
        v = tile_to(v, p, N)
        if fold is None:
            out.append(v)
        else:
            acc = fold(acc, v, i)
            # bound the async dispatch queue: without a sync, dozens of
            # queued constraint evaluations pre-allocate their full-length
            # output buffers simultaneously and exhaust HBM
            jax.block_until_ready(acc)
    return out if fold is None else acc


def _evaluate_lde_chunked(exprs, ctx: LdeContext, N: int, fold, B: int):
    """Chunked constraint evaluation: process the LDE domain in B-row
    windows so every live intermediate is [B, L] instead of [N, L]
    (SURVEY.md §7 hard part 5 — the 195-constraint starknet AIR over a
    2^22-point domain exhausts HBM with full-length intermediates).

    Key fact making this cheap: chunks are aligned (B | s) and every
    short-period value — periodic columns, X^e with period N/gcd(N,e) <= B,
    and anything composed solely of them (zerofier inverses!) — is
    IDENTICAL in every chunk.  Those values are computed once and cached
    across chunks; only chunk-variant values (trace-column gathers, X^e
    with long period, and their compositions) are recomputed per chunk,
    with the same refcount eviction as the full-domain path.

    Requires `fold`; returns the [N, L] folded accumulator assembled from
    per-chunk [B, L] results.
    """
    assert fold is not None, "chunked evaluation requires a fold"
    assert N % B == 0 and ctx.coset is not None
    F = ctx.F
    p = getattr(F, "BASE_MODULUS", F.MODULUS)  # domain powers are base-field
    w = F.root_of_unity_int(N)
    nodes = walk(exprs)

    # chunk-variance analysis over the hash-consed DAG
    variant = {}
    for n_ in nodes:
        k = n_.key
        op = k[0]
        if op == "X" or op == "trace":
            variant[id(n_)] = True
        elif op == "pow" and n_.args[0].key[0] == "X":
            variant[id(n_)] = (N // math.gcd(N, k[2])) > B
        elif op in ("const", "challenge", "hint", "periodic"):
            variant[id(n_)] = False
        else:
            variant[id(n_)] = any(variant[id(a)] for a in n_.args)

    refs = {}
    for node in nodes:
        for child in node.args:
            refs[id(child)] = refs.get(id(child), 0) + 1
    for e in exprs:
        refs[id(e)] = refs.get(id(e), 0) + 1

    inv_memo = {}        # invariant nodes: persists across chunks
    var_tbl = {}         # e -> [B, L] powers of w^e (variant X^e base table)

    def tile_to(val, period, target):
        if period == target:
            return val
        if period == 0:
            return jnp.broadcast_to(val, (target,) + val.shape)
        return jnp.tile(val, (target // period, 1))

    def long_xpow(e, s):
        """x^e on the chunk for period > B: (coset^e w^{se}) * w^{ie}."""
        if e not in var_tbl:
            from ..ntt import powers_host
            var_tbl[e] = powers_host(F, pow(w, e, p), B)
        scal = pow(ctx.coset, e, p) * pow(w, e * s % N, p) % p
        return F.mul(var_tbl[e],
                     jnp.broadcast_to(F.encode_int(scal), var_tbl[e].shape))

    out_chunks = []
    for s in range(0, N, B):
        s_dev = jnp.asarray(s, dtype=jnp.uint32)
        var_memo = {}
        var_refs = dict(refs)

        def consume(n_):
            if variant[id(n_)]:
                if id(n_) not in var_memo:
                    return ev(n_)  # unmemoized trace leaf
                r = var_memo[id(n_)]
                var_refs[id(n_)] -= 1
                if var_refs[id(n_)] == 0:
                    del var_memo[id(n_)]
                return r
            return ev(n_)

        def ev(n_):
            vid = id(n_)
            if not variant[vid]:
                r = inv_memo.get(vid)
                if r is not None:
                    return r
            else:
                r = var_memo.get(vid)
                if r is not None:
                    return r
            k = n_.key
            op = k[0]
            if op == "X":
                r = (long_xpow(1, s), B)
            elif op == "const":
                r = (F.encode_int(k[1]), 0)
            elif op == "trace":
                # not memoized (same rationale as the full-domain path)
                col, off = k[1], k[2]
                arr = ctx.columns[col]
                shift = (off * ctx.blowup) % arr.shape[0]
                return (_gather_kernel(B, shift)(arr, s_dev), B)
            elif op == "challenge":
                r = (ctx.challenges[k[1]], 0)
            elif op == "hint":
                r = (ctx.hints[k[1]], 0)
            elif op == "periodic":
                arr = ctx.periodic[k[1]]()
                assert B % arr.shape[0] == 0, "periodic column period > chunk"
                r = (arr, arr.shape[0])
            elif op in ("add", "sub", "mul"):
                ev(n_.args[0])
                ev(n_.args[1])
                a, pa = consume(n_.args[0])
                b, pb = consume(n_.args[1])
                pr = max(pa, pb)
                r = (getattr(F, op)(tile_to(a, pa, pr), tile_to(b, pb, pr)),
                     pr)
            elif op == "neg":
                ev(n_.args[0])
                a, pa = consume(n_.args[0])
                r = (F.neg(a), pa)
            elif op == "pow":
                e = k[2]
                base = n_.args[0]
                if base.key[0] == "X":
                    period = N // math.gcd(N, e)
                    if period > B:
                        r = (long_xpow(e, s), B)
                    else:
                        r = (ctx.x_pow_fn(e, period), period)
                else:
                    ev(base)
                    a, pa = consume(base)
                    r = (F.pow_static(a, e), pa)
            elif op == "inv":
                ev(n_.args[0])
                v, pv = consume(n_.args[0])
                if pv == 0:
                    r = (F.inv(v), 0)
                else:
                    r = (F.batch_inv(v, axis=0), pv)
            else:  # pragma: no cover
                raise ValueError(f"unknown node {op}")
            (var_memo if variant[vid] else inv_memo)[vid] = r
            return r

        acc = None
        for i, e in enumerate(exprs):
            ev(e)
            v, pv = consume(e)
            v = tile_to(v, pv, B)
            acc = fold(acc, v, i)
        # bound the async dispatch queue per chunk
        jax.block_until_ready(acc)
        out_chunks.append(acc)
    return jnp.concatenate(out_chunks, axis=0)


def _xpow_keys(exprs, N):
    """All (exponent, period) pairs of X-power leaves in the expressions."""
    keys = []
    for n_ in walk(exprs):
        if n_.key[0] == "X":
            keys.append((1, N))
        elif n_.key[0] == "pow" and n_.args[0].key[0] == "X":
            e = n_.key[2]
            keys.append((e, N // math.gcd(N, e)))
    return sorted(set(keys))


_DOMAIN_ONLY_OPS = {"X", "const", "pow", "add", "sub", "mul", "neg", "inv"}


def _domain_only_invs(exprs):
    """The inv nodes whose subtree is pure domain arithmetic (X/const
    leaves only) — i.e. the zerofier inverses.  Their values depend on
    (field, N, coset) but not on the trace, so they are hoisted out of the
    per-group jit and cached across groups AND proves: the boundary
    zerofiers 1/(X - g^k) have full-domain period and each cost a
    length-N batch inversion (two log-N scans + one Fermat chain, ~50ms at
    N=2^19) when recomputed inside every constraint group."""
    dom = {}

    def is_dom(n_):
        got = dom.get(id(n_))
        if got is not None:
            return got
        ok = n_.key[0] in _DOMAIN_ONLY_OPS and all(is_dom(a)
                                                   for a in n_.args)
        dom[id(n_)] = ok
        return ok

    out, seen = [], set()
    for n_ in walk(exprs):
        if n_.key[0] == "inv" and n_.key not in seen and is_dom(n_):
            seen.add(n_.key)
            out.append(n_)
    return out


def _eval_domain_node(F, n_, x_pow_fn, N, memo):
    """Eager (non-jit) evaluation of a domain-only subtree -> (arr, period).
    X-powers come from the caller's cached tables; everything else is a
    handful of short-period device ops."""
    r = memo.get(id(n_))
    if r is not None:
        return r
    k = n_.key
    op = k[0]
    if op == "X":
        r = (x_pow_fn(1, N), N)
    elif op == "const":
        r = (F.encode_int(k[1]), 0)
    elif op == "pow" and n_.args[0].key[0] == "X":
        e = k[2]
        period = N // math.gcd(N, e)
        r = (x_pow_fn(e, period), period)
    elif op in ("add", "sub", "mul"):
        a, pa = _eval_domain_node(F, n_.args[0], x_pow_fn, N, memo)
        b, pb = _eval_domain_node(F, n_.args[1], x_pow_fn, N, memo)
        pr = max(pa, pb)

        def t(v, p):
            if p == pr:
                return v
            if p == 0:
                return jnp.broadcast_to(v, (pr,) + v.shape)
            return jnp.tile(v, (pr // p, 1))

        r = (getattr(F, op)(t(a, pa), t(b, pb)), pr)
    elif op == "neg":
        a, pa = _eval_domain_node(F, n_.args[0], x_pow_fn, N, memo)
        r = (F.neg(a), pa)
    elif op == "pow":
        a, pa = _eval_domain_node(F, n_.args[0], x_pow_fn, N, memo)
        r = (F.pow_static(a, k[2]), pa)
    elif op == "inv":
        a, pa = _eval_domain_node(F, n_.args[0], x_pow_fn, N, memo)
        r = (F.inv(a), 0) if pa == 0 else (F.batch_inv(a, axis=0), pa)
    else:  # pragma: no cover
        raise ValueError(f"non-domain node {op}")
    memo[id(n_)] = r
    return r


def _domain_period(n_, N):
    """Structural period of a domain-only subtree (all periods divide N,
    so max == lcm; 0 = scalar)."""
    k = n_.key
    op = k[0]
    if op == "X":
        return N
    if op == "const":
        return 0
    if op == "pow" and n_.args[0].key[0] == "X":
        return N // math.gcd(N, k[2])
    return max((_domain_period(a, N) for a in n_.args), default=0)


def _hoisted_zinvs(F, exprs, ctx, N):
    """{node key -> (arr, period)} for every domain-only inv node, served
    from the per-process device LRU (ntt/ntt_pallas._dev) so a steady-state
    prove pays zero zerofier-inversion work."""
    from ..ntt.ntt_pallas import _dev
    out = {}
    memo = {}
    fname = getattr(F, "NAME", F.__class__.__name__)
    for n_ in _domain_only_invs(exprs):
        key = ("zinv", fname, n_.key, N, ctx.coset)
        arr = _dev(key, lambda n_=n_: _eval_domain_node(
            F, n_, ctx.x_pow_fn, N, memo)[0])
        out[n_.key] = (arr, _domain_period(n_, N))
    return out


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def _group_eval_jit(F, exprs, N, blowup, xkeys, zkeys, zperiods, columns,
                    challenges, hints, periodic, xpows, zvals, coeffs):
    """One fused device dispatch: evaluate a tuple of constraint
    expressions over the full domain and return sum_i coeffs[i] * C_i.

    exprs/xkeys are static (Expr hashes by structural key); every array —
    trace columns, challenge/hint scalars, periodic LDEs, X-power tables,
    fold coefficients — is a runtime argument, so no big compile-time
    constants reach the HLO.  Periods are tracked exactly like the eager
    evaluator so zerofiers invert on their short period.
    """
    memo = {}

    def tile_to(val, period, target):
        if period == target:
            return val
        if period == 0:
            return jnp.broadcast_to(val, (target,) + val.shape)
        return jnp.tile(val, (target // period, 1))

    def ev(n_):
        r = memo.get(id(n_))
        if r is not None:
            return r
        k = n_.key
        op = k[0]
        if op == "X":
            r = (xpows[xkeys.index((1, N))], N)
        elif op == "const":
            r = (F.encode_int(k[1]), 0)
        elif op == "trace":
            col, off = k[1], k[2]
            arr = columns[col]
            shift = (off * blowup) % arr.shape[0]
            r = (jnp.roll(arr, -shift, axis=0) if shift else arr, N)
        elif op == "challenge":
            r = (challenges[k[1]], 0)
        elif op == "hint":
            r = (hints[k[1]], 0)
        elif op == "periodic":
            arr = periodic[k[1]]
            r = (arr, arr.shape[0])
        elif op in ("add", "sub", "mul"):
            a, pa = ev(n_.args[0])
            b, pb = ev(n_.args[1])
            pr = max(pa, pb)
            r = (getattr(F, op)(tile_to(a, pa, pr), tile_to(b, pb, pr)), pr)
        elif op == "neg":
            a, pa = ev(n_.args[0])
            r = (F.neg(a), pa)
        elif op == "pow":
            e = k[2]
            base = n_.args[0]
            if base.key[0] == "X":
                period = N // math.gcd(N, e)
                r = (xpows[xkeys.index((e, period))], period)
            else:
                a, pa = ev(base)
                r = (F.pow_static(a, e), pa)
        elif op == "inv":
            if k in zkeys:
                i = zkeys.index(k)
                r = (zvals[i], zperiods[i])  # hoisted zerofier inverse
            else:
                v, pv = ev(n_.args[0])
                r = (F.inv(v), 0) if pv == 0 \
                    else (F.batch_inv(v, axis=0), pv)
        else:  # pragma: no cover
            raise ValueError(f"unknown node {op}")
        memo[id(n_)] = r
        return r

    acc = None
    for i, e in enumerate(exprs):
        v, pv = ev(e)
        v = tile_to(v, pv, N)
        term = F.mul(v, jnp.broadcast_to(coeffs[i], v.shape))
        acc = term if acc is None else F.add(acc, term)
    return acc


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 14))
def _group_eval_chunk_jit(F, exprs, blowup, pre_nodes, pre_periods,
                          long_keys, columns, s, pre_vals, long_tbls,
                          long_scals, challenges, hints, coeffs, B):
    """One fused dispatch: evaluate a constraint group on the B-row chunk
    starting at (traced) row s, returning sum_i coeffs[i] * C_i [B, L].

    Chunk-INVARIANT subexpressions (zerofier inverses, periodic columns,
    short X-powers — identical in every aligned chunk) arrive precomputed
    in pre_vals (periods static in pre_periods) and seed the memo, so the
    graph contains only chunk-variant work: trace-column wrap-around
    gathers at s, long-period X^e = table * per-chunk scalar, and the
    constraint arithmetic.
    """
    memo = {}
    for node, val, period in zip(pre_nodes, pre_vals, pre_periods):
        memo[id(node)] = (val, period)

    def tile_to(val, period, target):
        if period == target:
            return val
        if period == 0:
            return jnp.broadcast_to(val, (target,) + val.shape)
        return jnp.tile(val, (target // period, 1))

    def ev(n_):
        r = memo.get(id(n_))
        if r is not None:
            return r
        k = n_.key
        op = k[0]
        if op == "X":
            i = long_keys.index(1)
            r = (F.mul(long_tbls[i], jnp.broadcast_to(
                long_scals[i], long_tbls[i].shape)), B)
        elif op == "const":
            r = (F.encode_int(k[1]), 0)
        elif op == "trace":
            col, off = k[1], k[2]
            arr = columns[col]
            shift = (off * blowup) % arr.shape[0]
            # contiguous wrap-around window via a dynamic roll (two
            # dynamic slices + concat): the explicit [B]-index gather read
            # millions of 64-byte rows per leaf and dominated the whole
            # starknet constraint-evaluation phase (~385 leaf windows x 8
            # chunks of 32MB each)
            r = (jnp.roll(arr, -(s + jnp.uint32(shift)), axis=0)[:B], B)
        elif op == "challenge":
            r = (challenges[k[1]], 0)
        elif op == "hint":
            r = (hints[k[1]], 0)
        elif op in ("add", "sub", "mul"):
            a, pa = ev(n_.args[0])
            b, pb = ev(n_.args[1])
            pr = max(pa, pb)
            r = (getattr(F, op)(tile_to(a, pa, pr), tile_to(b, pb, pr)), pr)
        elif op == "neg":
            a, pa = ev(n_.args[0])
            r = (F.neg(a), pa)
        elif op == "pow":
            e = k[2]
            if n_.args[0].key[0] == "X":
                i = long_keys.index(e)
                r = (F.mul(long_tbls[i], jnp.broadcast_to(
                    long_scals[i], long_tbls[i].shape)), B)
            else:
                a, pa = ev(n_.args[0])
                r = (F.pow_static(a, e), pa)
        elif op == "inv":
            v, pv = ev(n_.args[0])
            r = (F.inv(v), 0) if pv == 0 else (F.batch_inv(v, axis=0), pv)
        else:  # pragma: no cover
            raise ValueError(f"unknown node {op}")
        memo[id(n_)] = r
        return r

    acc = None
    for i, e in enumerate(exprs):
        v, pv = ev(e)
        v = tile_to(v, pv, B)
        term = F.mul(v, jnp.broadcast_to(coeffs[i], v.shape))
        acc = term if acc is None else F.add(acc, term)
    return acc


def evaluate_lde_folded_chunked(exprs, ctx: LdeContext, N: int, fold_coeffs,
                                B: int, group_size: int = 8):
    """Chunked + grouped composition fold: the starknet-scale variant of
    evaluate_lde_folded (B-row windows bound live intermediates; jitted
    constraint groups bound dispatch count).

    Chunk-invariance analysis mirrors _evaluate_lde_chunked: invariant
    boundary subtrees (everything composed solely of constants,
    challenges, hints, periodic columns, and X^e with period <= B —
    including the batch-INVERTED zerofiers) are evaluated once, eagerly,
    on their short periods and passed into every chunk dispatch.
    """
    F = ctx.F
    assert N % B == 0 and ctx.coset is not None
    p = getattr(F, "BASE_MODULUS", F.MODULUS)
    w = F.root_of_unity_int(N)
    nodes = walk(exprs)

    variant = {}
    for n_ in nodes:
        k = n_.key
        op = k[0]
        if op == "X" or op == "trace":
            variant[id(n_)] = True
        elif op == "pow" and n_.args[0].key[0] == "X":
            variant[id(n_)] = (N // math.gcd(N, k[2])) > B
        elif op in ("const", "challenge", "hint", "periodic"):
            variant[id(n_)] = False
        else:
            variant[id(n_)] = any(variant[id(a)] for a in n_.args)

    # invariant boundary nodes: invariant children of variant parents
    # (plus invariant roots) — these seed every chunk dispatch
    boundary, seen = [], set()

    def collect(n_):
        if id(n_) in seen:
            return
        seen.add(id(n_))
        if not variant[id(n_)]:
            if n_.key[0] not in ("const", "challenge", "hint"):
                boundary.append(n_)
            return
        for a in n_.args:
            collect(a)

    for e in exprs:
        collect(e)

    # evaluate the invariant boundary once, on short periods (reuse the
    # eager walker's memo/refcount machinery with tiling disabled)
    pre_pairs = _evaluate_periods(boundary, ctx, N)
    pre_nodes = tuple(boundary)
    pre_periods = tuple(pp for (_, pp) in pre_pairs)
    assert all(0 < pp <= B or pp == 0 for pp in pre_periods), \
        "invariant boundary period exceeds the chunk"
    pre_vals = tuple(v for (v, _) in pre_pairs)

    # long-period X^e leaves: x^e on the chunk = tbl_e * scalar(e, s)
    long_exps = sorted({
        (1 if n_.key[0] == "X" else n_.key[2])
        for n_ in nodes
        if variant[id(n_)] and (
            n_.key[0] == "X"
            or (n_.key[0] == "pow" and n_.args[0].key[0] == "X"))})
    long_keys = tuple(long_exps)
    long_tbls = tuple(powers_host_dev(F, pow(w, e, p), B)
                      for e in long_exps)

    challenges = tuple(ctx.challenges)
    hints = tuple(ctx.hints)
    cols_all = ctx.columns

    # full-period zerofier inverses (boundary 1/(X - g^k) terms): variant
    # per the chunk classification, but domain-only — hoist the [N, L]
    # inverse into the per-process device cache and seed each group with
    # its chunk SLICE, instead of a length-B batch inversion inside every
    # group x chunk dispatch
    from ..ntt.ntt_pallas import _dev
    fname = getattr(F, "NAME", F.__class__.__name__)
    zsel = [nd for nd in _domain_only_invs(exprs)
            if _domain_period(nd, N) > B]
    zmemo = {}
    zarr = {id(nd): _dev(("zinv", fname, nd.key, N, ctx.coset),
                         lambda nd=nd: _eval_domain_node(
                             F, nd, ctx.x_pow_fn, N, zmemo)[0])
            for nd in zsel}

    out_chunks = []
    for s in range(0, N, B):
        long_scals = tuple(
            F.encode_int(pow(ctx.coset, e, p) * pow(w, e * s % N, p) % p)
            for e in long_exps)
        s_dev = jnp.asarray(s, dtype=jnp.uint32)
        acc = None
        for g in range(0, len(exprs), group_size):
            grp = tuple(exprs[g:g + group_size])
            grp_nodes = set(id(x) for x in walk(grp))
            cols = {c: cols_all[c] for c in
                    sorted({n_.key[1] for n_ in walk(grp)
                            if n_.key[0] == "trace"})}
            # pass only the seeds this group references
            sel = [i for i, nd in enumerate(pre_nodes)
                   if id(nd) in grp_nodes]
            zg = [nd for nd in zsel if id(nd) in grp_nodes]
            coeffs = jnp.stack([F.encode_int(c)
                                for c in fold_coeffs[g:g + group_size]])
            part = _group_eval_chunk_jit(
                F, grp, ctx.blowup,
                tuple(pre_nodes[i] for i in sel) + tuple(zg),
                tuple(pre_periods[i] for i in sel) + (B,) * len(zg),
                long_keys, cols, s_dev,
                tuple(pre_vals[i] for i in sel)
                + tuple(zarr[id(nd)][s:s + B] for nd in zg),
                long_tbls, long_scals, challenges, hints, coeffs, B)
            acc = part if acc is None else F.add(acc, part)
        jax.device_get(jnp.ravel(acc)[:1])  # bound the dispatch queue
        out_chunks.append(acc)
    return jnp.concatenate(out_chunks, axis=0)


def powers_host_dev(F, base: int, count: int):
    """Device-cached powers table (see ntt_pallas._dev)."""
    from ..ntt.ntt import powers_host
    from ..ntt.ntt_pallas import _dev
    return _dev(("xpowb", F.NAME, base, count),
                lambda: powers_host(F, base, count))


def _evaluate_periods(exprs, ctx: LdeContext, N: int):
    """Eagerly evaluate expressions, returning (array, period) pairs
    WITHOUT tiling to the full domain (the seed values for the chunked
    grouped evaluator)."""
    sub = LdeContext(ctx.F, ctx.columns, ctx.blowup, ctx.domain_fn,
                     ctx.x_pow_fn, ctx.challenges, ctx.hints, ctx.periodic,
                     ctx.coset)
    out = []
    memo = sub.memo

    F = ctx.F

    def tile_to(val, period, target):
        if period == target:
            return val
        if period == 0:
            return jnp.broadcast_to(val, (target,) + val.shape)
        return jnp.tile(val, (target // period, 1))

    def ev(n_):
        r = memo.get(id(n_))
        if r is not None:
            return r
        k = n_.key
        op = k[0]
        if op == "const":
            r = (F.encode_int(k[1]), 0)
        elif op == "challenge":
            r = (ctx.challenges[k[1]], 0)
        elif op == "hint":
            r = (ctx.hints[k[1]], 0)
        elif op == "periodic":
            arr = ctx.periodic[k[1]]()
            r = (arr, arr.shape[0])
        elif op in ("add", "sub", "mul"):
            a, pa = ev(n_.args[0])
            b, pb = ev(n_.args[1])
            pr = max(pa, pb)
            r = (getattr(F, op)(tile_to(a, pa, pr), tile_to(b, pb, pr)), pr)
        elif op == "neg":
            a, pa = ev(n_.args[0])
            r = (F.neg(a), pa)
        elif op == "pow":
            e = k[2]
            if n_.args[0].key[0] == "X":
                period = N // math.gcd(N, e)
                r = (ctx.x_pow_fn(e, period), period)
            else:
                a, pa = ev(n_.args[0])
                r = (F.pow_static(a, e), pa)
        elif op == "inv":
            v, pv = ev(n_.args[0])
            r = (F.inv(v), 0) if pv == 0 else (F.batch_inv(v, axis=0), pv)
        else:  # pragma: no cover
            raise ValueError(f"invariant walker hit variant node {op}")
        memo[id(n_)] = r
        return r

    for e in exprs:
        out.append(ev(e))
    return out


def evaluate_lde_folded(exprs, ctx: LdeContext, domain_size: int,
                        fold_coeffs, group_size: int = 8):
    """Coefficient-weighted sum of constraint evaluations over the LDE
    domain (the composition polynomial), dispatched in jitted GROUPS of
    constraints instead of per DAG node.

    The eager walker pays one tunneled device dispatch per DAG op (~600
    dispatches for the 93-constraint recursive AIR); here each group of
    `group_size` constraints is one fused dispatch.  Groups are kept
    moderate because very large fused graphs have crashed the TPU
    remote-compile helper at starknet shapes (see fri.py).

    fold_coeffs: list of python ints, coefficient per constraint.
    Returns the [N, L] accumulator.
    """
    F = ctx.F
    N = domain_size
    periodic = tuple(pc() for pc in ctx.periodic)
    challenges = tuple(ctx.challenges)
    hints = tuple(ctx.hints)
    zinvs = _hoisted_zinvs(F, exprs, ctx, N)
    acc = None
    for s in range(0, len(exprs), group_size):
        grp = tuple(exprs[s:s + group_size])
        xkeys = tuple(_xpow_keys(grp, N))
        xpows = tuple(ctx.x_pow_fn(e, period) for (e, period) in xkeys)
        grp_keys = {n_.key for n_ in walk(grp)}
        zkeys = tuple(k for k in zinvs if k in grp_keys)
        zvals = tuple(zinvs[k][0] for k in zkeys)
        zperiods = tuple(zinvs[k][1] for k in zkeys)
        cols = {c: ctx.columns[c] for c in
                sorted({n_.key[1] for n_ in walk(grp)
                        if n_.key[0] == "trace"})}
        coeffs = jnp.stack([F.encode_int(c)
                            for c in fold_coeffs[s:s + group_size]])
        part = _group_eval_jit(F, grp, N, ctx.blowup, xkeys, zkeys,
                               zperiods, cols, challenges, hints, periodic,
                               xpows, zvals, coeffs)
        acc = part if acc is None else F.add(acc, part)
    return acc


class ScalarContext:
    """Evaluate constraints at a single (OODS) point.

    - x: [L] the point
    - trace_values: dict (col, offset) -> [L]
    - challenges / hints: lists of [L]
    - periodic_values: list of [L] (periodic columns evaluated at the point)
    """

    def __init__(self, F, x, trace_values, challenges=(), hints=(),
                 periodic_values=()):
        self.F = F
        self.x = x
        self.trace_values = trace_values
        self.challenges = challenges
        self.hints = hints
        self.periodic_values = periodic_values
        self.memo = {}


def evaluate_scalar(exprs, ctx: ScalarContext):
    F = ctx.F
    memo = ctx.memo

    def ev(n):
        r = memo.get(id(n))
        if r is not None:
            return r
        k = n.key
        op = k[0]
        if op == "X":
            r = ctx.x
        elif op == "const":
            r = F.encode_int(k[1])
        elif op == "trace":
            r = ctx.trace_values[(k[1], k[2])]
        elif op == "challenge":
            r = ctx.challenges[k[1]]
        elif op == "hint":
            r = ctx.hints[k[1]]
        elif op == "periodic":
            r = ctx.periodic_values[k[1]]
        elif op == "add":
            r = F.add(ev(n.args[0]), ev(n.args[1]))
        elif op == "sub":
            r = F.sub(ev(n.args[0]), ev(n.args[1]))
        elif op == "mul":
            r = F.mul(ev(n.args[0]), ev(n.args[1]))
        elif op == "neg":
            r = F.neg(ev(n.args[0]))
        elif op == "pow":
            r = F.pow_static(ev(n.args[0]), k[2])
        elif op == "inv":
            r = F.inv(ev(n.args[0]))
        else:  # pragma: no cover
            raise ValueError(f"unknown node {op}")
        memo[id(n)] = r
        return r

    return [ev(e) for e in exprs]


class IntContext:
    """Host-side scalar evaluation with python big-ints (verifier path).

    - modulus: field modulus p
    - x: the evaluation point (int)
    - trace_values: dict (col, offset) -> int
    - challenges / hints / periodic_values: lists of ints
    """

    def __init__(self, modulus, x, trace_values, challenges=(), hints=(),
                 periodic_values=(), s=None):
        self.p = modulus
        self.x = x
        self.trace_values = trace_values
        self.challenges = challenges
        self.hints = hints
        self.periodic_values = periodic_values
        # leaf wrapper: extension fields pass their host-scalar constructor
        # (F.s) so every value entering the DAG carries field semantics;
        # base fields reduce mod p
        self.s = s or (lambda v: int(v) % modulus)
        self.memo = {}


def evaluate_int(exprs, ctx: IntContext):
    """Evaluate expressions at a point using python ints (no device)."""
    p = ctx.p
    memo = ctx.memo

    s = ctx.s

    def ev(n):
        r = memo.get(id(n))
        if r is not None:
            return r
        k = n.key
        op = k[0]
        if op == "X":
            r = s(ctx.x)
        elif op == "const":
            r = s(k[1])
        elif op == "trace":
            r = s(ctx.trace_values[(k[1], k[2])])
        elif op == "challenge":
            r = s(ctx.challenges[k[1]])
        elif op == "hint":
            r = s(ctx.hints[k[1]])
        elif op == "periodic":
            r = s(ctx.periodic_values[k[1]])
        elif op == "add":
            r = (ev(n.args[0]) + ev(n.args[1])) % p
        elif op == "sub":
            r = (ev(n.args[0]) - ev(n.args[1])) % p
        elif op == "mul":
            r = ev(n.args[0]) * ev(n.args[1]) % p
        elif op == "neg":
            r = -ev(n.args[0]) % p
        elif op == "pow":
            r = pow(ev(n.args[0]), k[2], p)
        elif op == "inv":
            r = pow(ev(n.args[0]), p - 2, p)
        else:  # pragma: no cover
            raise ValueError(f"unknown node {op}")
        memo[id(n)] = r
        return r

    return [ev(e) for e in exprs]
