"""On-TPU validation + microbench of the Pallas kernels.

Run on the real chip (no JAX_PLATFORMS override):

    python tools/tpu_validate.py [sizes...]

Checks, per transform size:
  - pallas four-step NTT == scan NTT (fwd + inv), bit-exact
  - wall-clock of both paths (warm)
plus a montmul microbench. One JSON line per check.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sandstorm_tpu import enable_compile_cache
    enable_compile_cache()
    from sandstorm_tpu.fields.fp252 import Fp252 as F
    from sandstorm_tpu.ntt.ntt import _bitrev, _ntt_core, _wpow_table_dev
    from sandstorm_tpu.ntt.ntt_pallas import ntt_fourstep

    print(json.dumps({"backend": jax.default_backend(),
                      "devices": len(jax.devices())}), flush=True)

    def scan_ntt(a, inverse):
        n = a.shape[0]
        wpow = _wpow_table_dev(F, n, inverse)
        ar = jnp.take(a, jnp.asarray(_bitrev(n)), axis=0)
        return _ntt_core(F, ar, wpow, inverse)

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        return out, time.time() - t0

    sizes = [int(s) for s in sys.argv[1:]] or [1 << 14, 1 << 18, 1 << 20]
    rng = np.random.default_rng(0)
    for n in sizes:
        lo = rng.integers(0, 1 << 62, n, dtype=np.uint64)
        hi = rng.integers(0, 1 << 62, n, dtype=np.uint64)
        vals = [(int(a) * int(b)) % F.MODULUS for a, b in zip(lo, hi)]
        x = jnp.asarray(F.encode_ints_np(vals))
        ref, t_scan = timed(scan_ntt, x, False)
        got, t_pallas = timed(ntt_fourstep, F, x, False)
        ok_f = bool(jnp.array_equal(ref, got))
        refi, t_scan_i = timed(scan_ntt, x, True)
        goti, t_pallas_i = timed(ntt_fourstep, F, x, True)
        ok_i = bool(jnp.array_equal(refi, goti))
        print(json.dumps({
            "check": "ntt", "n": n, "fwd_match": ok_f, "inv_match": ok_i,
            "scan_s": round(t_scan, 4), "pallas_s": round(t_pallas, 4),
            "speedup": round(t_scan / max(t_pallas, 1e-9), 2),
        }), flush=True)
        assert ok_f and ok_i, f"PALLAS NTT MISMATCH at n={n}"

    # montmul microbench (throughput per element)
    n = 1 << 20
    a = jnp.asarray(F.encode_ints_np(
        [int(v) % F.MODULUS for v in rng.integers(0, 1 << 63, n)]))
    _, t_mul = timed(lambda u: F.mul(u, u), a)
    print(json.dumps({"check": "montmul", "n": n, "mul_s": round(t_mul, 4),
                      "melem_per_s": round(n / t_mul / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
