"""Measure tunnel dispatch latency vs device kernel time (diagnostic)."""
import sys, time
sys.path.insert(0, "/root/repo")
from sandstorm_tpu import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
from sandstorm_tpu.fields.fp252 import Fp252 as F

print("backend:", jax.default_backend())

# 1. tiny dispatch + full round trip
f = jax.jit(lambda x: x + 1)
x = jnp.zeros((8,), jnp.uint32)
jax.device_get(f(x))
t = time.time()
for _ in range(30):
    jax.device_get(f(x))
rt = (time.time() - t) / 30
print(f"tiny dispatch+get round trip: {rt*1000:.1f} ms")

# 2. tiny dispatch enqueue only (chained, one final get)
t = time.time()
y = x
for _ in range(200):
    y = f(y)
jax.device_get(y)
enq = (time.time() - t) / 200
print(f"tiny chained dispatch (amortized): {enq*1000:.2f} ms")

# 3. full-domain montmul [2^19, 16]
a = F.encode_int(12345)
big = jnp.broadcast_to(a, (1 << 19, 16))
big = jnp.asarray(big)  # materialize
r = F.mul(big, big)
jax.device_get(jnp.ravel(r)[:1])
t = time.time()
y = big
for _ in range(50):
    y = F.mul(y, y)
jax.device_get(jnp.ravel(y)[:1])
per = (time.time() - t) / 50
print(f"montmul [2^19,16] chained: {per*1000:.2f} ms")

# 4. montmul with per-call sync
t = time.time()
for _ in range(10):
    jax.device_get(jnp.ravel(F.mul(big, big))[:1])
per = (time.time() - t) / 10
print(f"montmul [2^19,16] with sync: {per*1000:.2f} ms")

# 5. device->host transfer of a [2^19, 16] array (32MB)
t = time.time()
jax.device_get(r)
print(f"device->host 32MB: {time.time()-t:.2f} s")

# 6. host->device upload 32MB
import numpy as np
h = np.zeros((1 << 19, 16), np.uint32)
t = time.time()
d = jnp.asarray(h)
jax.device_get(jnp.ravel(d)[:1])
print(f"host->device 32MB: {time.time()-t:.2f} s")
