from . import dist, multihost, runtime
from .dist import (
    make_mesh, dist_ntt, dist_coset_lde, dist_hash_rows, dist_prove_step,
)
from .runtime import active_mesh, mesh_scope, shard0

__all__ = [
    "dist", "multihost", "runtime", "make_mesh", "dist_ntt",
    "dist_coset_lde", "dist_hash_rows", "dist_prove_step", "active_mesh",
    "mesh_scope", "shard0",
]
