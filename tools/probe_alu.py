"""Measure VPU arithmetic rates on the real chip: u32 multiply vs f32 FMA
vs u32 add, inside a Pallas kernel (VMEM-resident, no HBM traffic in the
timed loop).  Decides whether a float-based digit multiply could beat the
current int32 schoolbook montmul.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from sandstorm_tpu import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

R = 256      # ops per element per kernel pass
SB, LN = 256, 128


def mk_kernel(op):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        o = a
        for _ in range(R):
            o = op(o, b)
        o_ref[...] = o
    return kernel


@functools.partial(jax.jit, static_argnames=("name",))
def run(a, b, name):
    ops = {
        "u32 mul": lambda o, b: o * b,
        "u32 add": lambda o, b: o + b,
        "u32 mul+add": lambda o, b: o * b + o,
        "u32 shift+and": lambda o, b: (o >> 7) & b,
        "f32 mul": lambda o, b: o * b,
        "f32 fma": lambda o, b: o * b + o,
    }
    return pl.pallas_call(
        mk_kernel(ops[name]),
        out_shape=jax.ShapeDtypeStruct((SB, LN), a.dtype),
        grid=(8192,),
        in_specs=[pl.BlockSpec((SB, LN), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((SB, LN), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(a, b)


def main():
    au = jnp.ones((SB, LN), jnp.uint32) * 3
    bu = jnp.ones((SB, LN), jnp.uint32) * 5
    af = jnp.ones((SB, LN), jnp.float32) * 1.00001
    bf = jnp.ones((SB, LN), jnp.float32) * 0.99999
    for name in ["u32 mul", "u32 add", "u32 mul+add", "u32 shift+and",
                 "f32 mul", "f32 fma"]:
        a, b = (af, bf) if name.startswith("f32") else (au, bu)
        out = run(a, b, name)
        jax.device_get(out.ravel()[:1])
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            out = run(a, b, name)
            jax.device_get(out.ravel()[:1])
            best = min(best, time.time() - t0)
        total_ops = SB * LN * R * 8192
        print(f"{name:16s} {best*1e3:7.2f} ms   {total_ops/best/1e12:6.2f} Tops/s")


if __name__ == "__main__":
    main()
