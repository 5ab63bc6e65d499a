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
