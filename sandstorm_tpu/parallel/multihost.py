"""Multi-host runtime: the JAX-distributed controller for multi-machine
proving.

The reference is strictly single-process (SURVEY.md §2.8: no MPI/NCCL/
socket deps anywhere in its Cargo.lock); this module is the TPU-native
scale-out axis the framework adds on top.  One python process runs per
host; `initialize()` wires them into a single JAX runtime, after which
`jax.devices()` spans every chip in the slice and the existing mesh
machinery (parallel/dist.py four-step NTTs, sharded hashing/scans,
`prove(mesh=...)`) works unchanged — XLA routes the `all_to_all`/`psum`
collectives over ICI within a host's chips and DCN between hosts.

Typical launch (same command on every host):

    from sandstorm_tpu.parallel import multihost
    multihost.initialize()                      # env-driven on TPU pods
    mesh = multihost.global_mesh()
    proof = claim.prove(witness, options, mesh=mesh)

Only process 0 returns the proof bytes to the user; every process must
execute the same `prove()` call (single-controller-per-host SPMD, the
standard jax.distributed model).

On TPU pods `jax.distributed.initialize()` discovers the coordinator
from the TPU metadata; elsewhere pass coordinator_address/num_processes/
process_id explicitly (or set JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
JAX_PROCESS_ID).
"""

import os

import numpy as np
import jax
from jax.sharding import Mesh

_INITIALIZED = False


def initialize(coordinator_address: str = None, num_processes: int = None,
               process_id: int = None) -> None:
    """Join this process to the multi-host JAX runtime (idempotent).

    Arguments default to the JAX_* environment variables; on Cloud TPU
    pods all three are discovered automatically.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    # NOTE: do not touch jax.process_count()/jax.devices() before
    # jax.distributed.initialize — they initialize the XLA backend, after
    # which joining a cluster is impossible
    # some environments set TPU_WORKER_HOSTNAMES to a literal libtpu
    # warning string ("WARNING: could not determine ...") — only a
    # comma-separated host list counts as pod metadata
    worker_hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_tpu_pod = (worker_hosts and " " not in worker_hosts.strip()) \
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
        kwargs["process_id"] = int(
            process_id or os.environ["JAX_PROCESS_ID"])
    elif not on_tpu_pod:
        # nothing to join: single-process run (the common local case) —
        # the same calling code works unchanged on one host
        _INITIALIZED = True
        return
    from jax._src import xla_bridge
    if not kwargs and xla_bridge.backends_are_initialized():
        # auto-discovery can only run before the backend exists; once a
        # single-process backend is live the only coherent semantics is
        # single-process (joining a pod now would be impossible anyway)
        _INITIALIZED = True
        return
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def global_mesh(axis: str = "d") -> Mesh:
    """One-dimensional mesh over every chip of every host.

    The prover's data decompositions (trace rows for NTT/commit shards,
    SURVEY.md §2.8 right column) are all expressible over a single axis;
    jax orders `devices()` host-major, so contiguous shards of the axis
    stay within a host and the four-step NTT's all_to_all rides ICI for
    the intra-host legs.
    """
    return Mesh(np.array(jax.devices()), (axis,))


def is_coordinator() -> bool:
    return jax.process_index() == 0


def process_grid() -> tuple:
    """(process_index, process_count) of this controller."""
    return jax.process_index(), jax.process_count()
