"""Multi-chip / multi-host proving: mesh kernels + distributed runtime.

Submodules are imported LAZILY (PEP 562): the compute modules create jnp
scalars at import time, which initializes the XLA backend — and
`multihost.initialize()` must run `jax.distributed.initialize` BEFORE any
backend exists, so `from sandstorm_tpu.parallel import multihost` must not
drag in the kernel modules.
"""

_EXPORTS = {
    "dist": ("dist", None),
    "multihost": ("multihost", None),
    "runtime": ("runtime", None),
    "make_mesh": ("dist", "make_mesh"),
    "dist_ntt": ("dist", "dist_ntt"),
    "dist_coset_lde": ("dist", "dist_coset_lde"),
    "dist_hash_rows": ("dist", "dist_hash_rows"),
    "dist_prove_step": ("dist", "dist_prove_step"),
    "active_mesh": ("runtime", "active_mesh"),
    "mesh_scope": ("runtime", "mesh_scope"),
    "shard0": ("runtime", "shard0"),
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    got = _EXPORTS.get(name)
    if got is None:
        raise AttributeError(name)
    import importlib
    mod = importlib.import_module(f".{got[0]}", __name__)
    return mod if got[1] is None else getattr(mod, got[1])
