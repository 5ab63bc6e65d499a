from .dist import (
    make_mesh, dist_ntt, dist_coset_lde, dist_hash_rows, dist_prove_step,
)

__all__ = [
    "make_mesh", "dist_ntt", "dist_coset_lde", "dist_hash_rows",
    "dist_prove_step",
]
