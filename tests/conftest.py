"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the driver separately
dry-runs the multichip path); correctness tests are all CPU-runnable.

Note: this environment imports jax at interpreter startup (sitecustomize)
and registers the 'axon' TPU platform, which ignores JAX_PLATFORMS env
vars — so the switch to CPU must go through jax.config.update BEFORE any
backend is initialized.
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

# persistent XLA compilation cache: the unrolled field kernels are slow to
# compile on this host; cache them across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402  (already imported at startup in this image)

jax.config.update("jax_platforms", "cpu")

# NOTE: because jax is pre-imported at startup, the cache env vars above
# are read too late; config.update is required for the cache to engage.
from sandstorm_tpu import enable_compile_cache  # noqa: E402

enable_compile_cache()
