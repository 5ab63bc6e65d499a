"""sandstorm-tpu: a TPU-native Cairo STARK prover built on JAX/XLA/Pallas.

A from-scratch reimplementation of the capabilities of andrewmilson/sandstorm
(a SHARP-compatible Cairo prover built on the miniSTARK engine), redesigned
TPU-first:

- Field arithmetic (Goldilocks 64-bit and the 252-bit Starkware prime) as
  vectorized uint32-limb kernels that run on the TPU VPU/MXU.
- Radix-2 / four-step NTTs for trace interpolation and coset LDE, sharded
  across device meshes with `shard_map` + `all_to_all` collectives.
- Device-side Blake2s / Keccak hashing of LDE rows for Merkle commitments.
- A symbolic AIR constraint DSL traced to JAX for batched evaluation over
  the constraint-evaluation domain and scalar evaluation at OODS points.
- A full STARK prove/verify pipeline (two-phase trace commit, permutation
  arguments as `associative_scan`s, DEEP composition, FRI, proof-of-work,
  query decommitment).

Reference behavior documented against /root/reference (sandstorm) file:line
in docstrings throughout.
"""

__version__ = "0.1.0"


def enable_compile_cache(path: str = None):
    """Enable JAX's persistent compilation cache.

    NOTE: this environment pre-imports jax at interpreter startup
    (sitecustomize), so the JAX_COMPILATION_CACHE_DIR env var is read too
    late — the cache must be enabled with config.update after import.
    """
    import os
    import jax
    if path is None:
        # per-backend AND per-machine cache dirs: XLA:CPU AOT entries bake
        # host CPU features in (loading one compiled on a different machine
        # SIGILLs — observed after this box migrated), and TPU executables
        # are device-kind specific
        backend = jax.default_backend()
        tag = backend
        if backend == "cpu":
            import hashlib
            try:
                with open("/proc/cpuinfo") as f:
                    flags = next((ln for ln in f if ln.startswith("flags")),
                                 "")
                tag += "_" + hashlib.md5(flags.encode()).hexdigest()[:8]
            except OSError:
                pass
        else:
            kind = jax.devices()[0].device_kind.replace(" ", "")
            tag += f"_{kind}"
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), f".jax_cache_{tag}")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def probe_tpu(timeout: int = 420) -> bool:
    """Kick the axon TPU tunnel from a SUBPROCESS before backend init.

    After a long TPU process exits, the next process's backend init can
    hang indefinitely (the tunnel session wedges rather than erroring); a
    throwaway `jax.devices()` in a subprocess revives it.  Call before
    the first device use in CLI tools/benches.  Returns False if the
    probe timed out (tunnel down)."""
    import os
    import subprocess
    import sys
    if os.environ.get("SANDSTORM_TPU_NO_PROBE") == "1":
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import os; os.environ['SANDSTORM_TPU_NO_PROBE']='1'; "
             "import jax; jax.devices()"],
            capture_output=True, timeout=timeout)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
