"""Helper to jit-wrap field classmethods after class definition.

Field primitives are called eagerly throughout the host-driven pipeline;
wrapping each public op in jax.jit turns every call into a single cached
fused kernel launch instead of hundreds of individually-dispatched XLA ops.
Larger pipeline regions (NTT, constraint evaluation) jit over these (nested
jit is inlined, so there is no double cost).
"""

import functools

import jax


def jit_class_ops(cls, names, static=()):
    for name in names:
        fn = getattr(cls, name)  # bound classmethod or plain function
        jitted = jax.jit(fn)
        setattr(cls, name, staticmethod(jitted))
    for name, argnums in static:
        fn = getattr(cls, name)
        jitted = jax.jit(fn, static_argnums=argnums)
        setattr(cls, name, staticmethod(jitted))


def jit_fn(fn=None, *, static_argnums=()):
    if fn is None:
        return functools.partial(jit_fn, static_argnums=static_argnums)
    return jax.jit(fn, static_argnums=static_argnums)


def fuse_unless_unsafe(fn):
    """Wrap fn(F, ...) so fields with XLA_FUSE_SAFE=False skip whole-graph
    fusion.

    Extension fields (fields/gl3.py) inline many multi-coordinate muls per
    op; fusing a whole pipeline stage over them sends XLA:CPU optimization
    time unbounded.  Safe fields get one fused jitted graph (F static);
    unsafe ones run the raw python, whose individually-jitted field ops
    dispatch as small cached kernels.
    """
    fused = jax.jit(fn, static_argnums=(0,))

    @functools.wraps(fn)
    def dispatch(F, *args):
        # the compile-time blowup is an XLA:CPU pathology; the TPU
        # compiler handles fused extension-field graphs fine, and eager
        # dispatch through the tunnel is latency-bound
        if getattr(F, "XLA_FUSE_SAFE", True) \
                or jax.default_backend() == "tpu":
            return fused(F, *args)
        return fn(F, *args)

    return dispatch
