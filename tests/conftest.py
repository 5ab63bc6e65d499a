"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the driver separately
dry-runs the multichip path); correctness tests are all CPU-runnable.
This must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# make the repo root importable regardless of where pytest is invoked
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
