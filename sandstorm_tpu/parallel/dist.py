"""Multi-chip proving primitives: mesh-sharded NTT / LDE / hashing.

The reference is strictly single-process (SURVEY.md §2.8: rayon threads +
Metal kernels, no distributed backend).  The TPU-native scaling design is a
`jax.sharding.Mesh` over the chips with `shard_map`-expressed kernels:

- **Distributed NTT** (the sequence-parallel analog): the Bailey four-step
  decomposition n = n1*n2 localizes butterfly stages so inter-chip traffic
  collapses into three `all_to_all` matrix redistributions over ICI:
    1. reshard rows->cols, column NTTs (local, length n1)
    2. twiddle by w^(k1*i2) (local; the twiddle matrix arrives pre-sharded)
    3. reshard cols->rows, row NTTs (local, length n2)
    4. transpose redistribute to natural-order output shards
- **Distributed leaf hashing**: rows are hashed where they live; Merkle
  level reduction gathers only the per-shard subtree roots.
- **Distributed permutation scans** ride on jax.lax.associative_scan over
  the mesh axis (XLA inserts the cross-chip combine).

Everything here also runs on a CPU mesh (xla_force_host_platform_device_count)
for testing — the driver's dryrun uses exactly that path.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ntt import ntt, powers_host
from ..hashing.blake2s import blake2s_words


def make_mesh(n_devices: int = None, axis: str = "d") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def _batched_ntt(F, a, inverse: bool):
    """NTT along axis 0 of [n, B, L] (vmapped over the middle axis).

    local=True: these run per-shard inside shard_map — they must not
    re-enter the mesh dispatch in ntt()."""
    return jax.vmap(lambda col: ntt(F, col, inverse, local=True),
                    in_axes=1, out_axes=1)(a)


def _four_step_local(F, x_local, tw_local, n1, n2, D, inverse, axis):
    """The shard_map body: x_local [n1/D * n2, L] natural-order chunk."""
    L = x_local.shape[-1]
    A = x_local.reshape(n1 // D, n2, L)
    # reshard rows -> cols: [n1/D, n2, L] -> [n1, n2/D, L]
    A = jax.lax.all_to_all(A, axis, split_axis=1, concat_axis=0, tiled=True)
    # column NTTs (length n1, local)
    B = _batched_ntt(F, A, inverse)
    # twiddle w_n^{k1 * i2}: tw_local is the matching [n1, n2/D, L] shard
    C = F.mul(B, tw_local)
    # reshard cols -> rows: [n1, n2/D, L] -> [n1/D, n2, L]
    C = jax.lax.all_to_all(C, axis, split_axis=0, concat_axis=1, tiled=True)
    # row NTTs (length n2, local)
    Dm = jax.vmap(lambda row: ntt(F, row, inverse, local=True))(C)
    # output natural order: X[k1 + n1*k2] = Dm[k1, k2] -> transpose and
    # redistribute so each device holds a contiguous natural chunk
    T = jnp.swapaxes(Dm, 0, 1)  # [n2, n1/D, L]
    T = jax.lax.all_to_all(T, axis, split_axis=0, concat_axis=1, tiled=True)
    return T.reshape(n2 // D * n1, L)  # [n/D, L]


_TW_CACHE = {}


def _mesh_key(mesh: Mesh):
    return tuple(d.id for d in mesh.devices.flat)


def _four_step_twiddles_dev(F, mesh: Mesh, n1: int, n2: int, inverse: bool,
                            axis: str):
    """Sharded device [n1, n2, L] matrix of w_n^(k1*i2), built ON each
    shard (log2(n1) scan passes over the local block) and cached per
    (field, size, mesh).

    The previous host build looped python-int power chains over all n1
    rows and materialized the full [n1, n2, L] matrix before sharding —
    O(n) host time and memory (a ~1GB row-by-row table at the 2^24
    BASELINE scale), re-uploaded through every process."""
    key = (getattr(F, "NAME", ""), n1, n2, inverse, axis, _mesh_key(mesh))
    got = _TW_CACHE.get(key)
    if got is not None:
        return got
    p = F.BASE_MODULUS
    w = F.root_of_unity_int(n1 * n2)
    if inverse:
        w = pow(w, -1, p)
    D = mesh.shape[axis]
    chunk = n2 // D
    # local column base: row[j] = w^(d*chunk + j) = w^j * (w^chunk)^d
    pw = jnp.asarray(powers_host(F, w, chunk))             # [chunk, L]
    sc = jnp.asarray(powers_host(F, pow(w, chunk, p), D))  # [D, L]
    sc = jax.device_put(sc.reshape(D, 1, sc.shape[-1]),
                        NamedSharding(mesh, P(axis)))

    def local(pw_l, sc_l):
        row = F.mul(pw_l, jnp.broadcast_to(sc_l[0], pw_l.shape))
        seq = jnp.concatenate(
            [F.ones((1, row.shape[0])),
             jnp.broadcast_to(row[None], (n1 - 1,) + row.shape)], axis=0)
        return jax.lax.associative_scan(F.mul, seq, axis=0)  # row^k1

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P(axis)),
                   out_specs=P(None, axis))
    tw = jax.jit(fn)(pw, sc)
    _TW_CACHE[key] = tw
    return tw


NTT_CALLS = 0  # instrumentation: counts four-step dispatches (tests)


def dist_ntt(F, mesh: Mesh, x, inverse: bool = False, axis: str = "d"):
    """NTT of a sharded [n, L] array via the four-step method.

    x must be sharded over the mesh axis on dim 0 (natural-order chunks);
    the result has the same sharding.  The inverse includes the 1/n scale.
    """
    global NTT_CALLS
    NTT_CALLS += 1
    n = x.shape[0]
    D = mesh.shape[axis]
    # split n = n1*n2 as square as possible with D | n1 and D | n2
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    n2 = n // n1
    assert n1 % D == 0 and n2 % D == 0, (n1, n2, D)

    tw_sharded = _four_step_twiddles_dev(F, mesh, n1, n2, inverse, axis)

    fn = shard_map(
        functools.partial(_four_step_local, F, n1=n1, n2=n2, D=D,
                          inverse=inverse, axis=axis),
        mesh=mesh,
        in_specs=(P(axis), P(None, axis)),
        out_specs=P(axis),
    )
    # inverse scaling: the local column/row iNTTs already contribute
    # 1/n1 * 1/n2 = 1/n, so no extra global scale is needed
    return fn(x, tw_sharded)


def dist_coset_lde(F, mesh: Mesh, evals, blowup: int, coset: int,
                   axis: str = "d"):
    """Distributed interpolate + coset-evaluate of a sharded trace column."""
    n = evals.shape[0]
    N = n * blowup
    coeffs = dist_ntt(F, mesh, evals, inverse=True, axis=axis)
    # scale by coset powers (sharded elementwise) and zero-pad to N
    key = ("cosetpow", getattr(F, "NAME", ""), coset, n, axis,
           _mesh_key(mesh))
    cp = _TW_CACHE.get(key)
    if cp is None:
        cp = jax.device_put(jnp.asarray(powers_host(F, coset, n)),
                            NamedSharding(mesh, P(axis)))
        _TW_CACHE[key] = cp
    scaled = F.mul(coeffs, cp)
    pad = jnp.zeros((N - n,) + evals.shape[1:], dtype=evals.dtype)
    padded = jnp.concatenate([scaled, pad], axis=0)
    padded = jax.device_put(padded, NamedSharding(mesh, P(axis)))
    return dist_ntt(F, mesh, padded, inverse=False, axis=axis)


def dist_hash_rows(F, mesh: Mesh, cols, axis: str = "d"):
    """Hash matrix rows where they live: [N, L] cols -> [N, 8] digests."""
    def local(*local_cols):
        words = [F.to_bytes_words(c) for c in local_cols]
        return blake2s_words(jnp.concatenate(words, axis=-1))

    fn = shard_map(local, mesh=mesh,
                   in_specs=tuple(P(axis) for _ in cols),
                   out_specs=P(axis))
    return fn(*cols)


def dist_prove_step(F, mesh: Mesh, columns, blowup: int = 2,
                    challenge_ints=(3, 5), axis: str = "d"):
    """One sharded prover macro-step (the multichip dryrun workload).

    For each sharded trace column: distributed iNTT -> coset LDE; then a
    sharded permutation-style cumulative product across the mesh, the leaf
    hashes of the LDE matrix, and a tree-reduced digest. Exercises
    all_to_all (NTT), associative_scan across shards, and sharded hashing —
    the real communication patterns of the full multi-chip prover.
    """
    coset = F.GENERATOR
    ldes = [dist_coset_lde(F, mesh, c, blowup, coset, axis) for c in columns]
    # permutation-ish running product over the first LDE column:
    z = F.encode_int(challenge_ints[0])
    term = F.sub(jnp.broadcast_to(z, ldes[0].shape), ldes[0])
    cum = jax.lax.associative_scan(F.mul, term, axis=0)
    leaves = dist_hash_rows(F, mesh, ldes + [cum], axis)
    return leaves
