"""Active-mesh context: routes the engine's NTT/LDE layer to the
multi-chip four-step kernels (parallel/dist.py) without threading a mesh
argument through every call site.

Design: `prove(mesh=...)` opens a `mesh_scope`; inside it, `ntt()` (and
therefore every interpolate/LDE in the pipeline) dispatches to the
`all_to_all` four-step NTT with axis-0 sharded arrays, and all other
whole-array field ops stay sharded through XLA's sharding propagation.
The transforms are bit-identical to the single-chip path, so proofs
produced under a mesh verify unchanged.
"""

import contextlib

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE = None
AXIS = "d"


def active_mesh():
    return _ACTIVE


@contextlib.contextmanager
def mesh_scope(mesh: Mesh):
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = mesh
    try:
        yield mesh
    finally:
        _ACTIVE = prev


def shard0(x, mesh: Mesh = None):
    """Commit an array to axis-0 sharding over the mesh (no-op if none)."""
    mesh = mesh or _ACTIVE
    if mesh is None:
        return x
    return jax.device_put(x, NamedSharding(mesh, P(AXIS)))


def four_step_ok(n: int, mesh: Mesh = None) -> bool:
    """The four-step split n = n1*n2 needs D | n1 and D | n2."""
    mesh = mesh or _ACTIVE
    if mesh is None:
        return False
    D = mesh.shape[AXIS]
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    return n1 % D == 0 and n2 % D == 0
