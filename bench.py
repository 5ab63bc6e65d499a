"""Benchmark: Cairo steps proved per second on the real example artifacts.

Proves the reference repo's example/array-sum run (16384 steps) on the
RECURSIVE layout (the SHARP-compatible configuration: 93 constraints,
pedersen/rc128/bitwise builtins, 252-bit Starkware field), self-verifies,
and prints one JSON line for the driver.

vs_baseline is measured against an estimated single-host reference (Rust
sandstorm) throughput of 10k steps/s — the reference publishes no absolute
number (BASELINE.md), so this anchor is documented here and held fixed
across rounds so the trend is comparable.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

RUST_PROVER_STEPS_PER_SEC_ESTIMATE = 10_000.0


def main():
    # the axon TPU tunnel comes and goes, and a down tunnel HANGS backend
    # init rather than raising — probe in a subprocess with a hard timeout
    # and record the outage instead of hanging/dying (the driver archives
    # this script's one JSON line either way)
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=420)
        err = None if r.returncode == 0 else (r.stderr or b"")[-300:].decode(
            "utf-8", "replace")
    except subprocess.TimeoutExpired:
        err = "backend init timed out (TPU tunnel down?)"
    if err is not None:
        print(json.dumps({
            "metric": "cairo_steps_proved_per_sec", "value": 0,
            "unit": "steps/s", "vs_baseline": 0,
            "detail": {"error": f"backend unavailable: {err}"},
        }))
        return
    from sandstorm_tpu import enable_compile_cache
    enable_compile_cache()
    from sandstorm_tpu.binary.formats import Layout
    from sandstorm_tpu.claims import CairoClaim
    from sandstorm_tpu.examples import load_artifacts
    from sandstorm_tpu.fields.fp252 import Fp252
    from sandstorm_tpu.stark.ark import serialize_proof
    from sandstorm_tpu.stark.options import ProofOptions

    smoke = os.environ.get("SANDSTORM_BENCH_SMOKE") == "1"
    if smoke:
        # CI smoke: the full bench code path on a VM-generated tiny plain
        # run (guards the driver's measurement against API drift; see
        # tests/test_cli.py::test_bench_smoke)
        from sandstorm_tpu.binary.formats import AirPrivateInput, CairoWitness
        from sandstorm_tpu.runner.vm import (CairoVM, instr_assert_eq_imm,
                                             instr_jmp_rel_imm)
        vm = CairoVM([instr_assert_eq_imm(), 10, instr_jmp_rel_imm(), 0],
                     Fp252.MODULUS)
        trace, mem = vm.run(16, initial_ap=6, extra_memory={5: 0})
        registers, memory = vm.to_witness_arrays(trace, mem)
        pub = vm.build_public_input(trace, mem, layout=Layout.PLAIN)
        witness = CairoWitness(
            air_private_input=AirPrivateInput("", "", [], [], [], [], [], []),
            register_states=registers, memory=memory)
        claim = CairoClaim(None, pub, field=Fp252, layout=Layout.PLAIN,
                           scheme="cairo")
        options = ProofOptions(num_queries=4, proof_of_work_bits=4)
    else:
        ref = "/root/reference/example"
        program, pub, witness = load_artifacts(
            os.path.join(ref, "array-sum.json"),
            os.path.join(ref, "air-public-input.json"),
            os.path.join(ref, "air-private-input.json"))

        # the reference's product for the recursive layout is
        # CairoVerifierClaim (FriendlyMerkleTree + Blake2s Cairo coin,
        # /root/reference src/claims.rs:12-33) — bench proves that scheme
        claim = CairoClaim(program, pub, field=Fp252, layout=Layout.RECURSIVE,
                           scheme="cairo")
        options = ProofOptions()  # reference CLI defaults: 65/2/16/8/16

    # warm-up run: pays one-time XLA compilation (cached to disk)
    t0 = time.time()
    proof = claim.prove(witness, options)
    warm = time.time() - t0

    # SANDSTORM_TPU_PROFILE=<dir> captures a jax.profiler (Perfetto/
    # TensorBoard) trace of the measured run; SANDSTORM_TPU_TRACE_PHASES=1
    # prints the per-phase wall-clock breakdown (stark/prover.py)
    import contextlib
    prof_dir = os.environ.get("SANDSTORM_TPU_PROFILE")
    prof_ctx = (__import__("jax").profiler.trace(prof_dir)
                if prof_dir else contextlib.nullcontext())
    t0 = time.time()
    with prof_ctx:
        proof = claim.prove(witness, options)
    elapsed = time.time() - t0

    assert claim.verify(proof, required_security_bits=0 if smoke else 80)
    steps_per_sec = pub.n_steps / elapsed
    print(json.dumps({
        "metric": "cairo_steps_proved_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(
            steps_per_sec / RUST_PROVER_STEPS_PER_SEC_ESTIMATE, 4),
        "detail": {
            "n_steps": pub.n_steps,
            "layout": "plain-smoke" if smoke else "recursive",
            "scheme": "cairo",
            "field": "fp252",
            "prove_s": round(elapsed, 3),
            "first_run_s": round(warm, 3),
            "proof_bytes": len(serialize_proof(proof)),
            "backend": __import__("jax").default_backend(),
            "phases": dict(__import__(
                "sandstorm_tpu.stark.prover", fromlist=["LAST_PHASES"]
            ).LAST_PHASES),
        },
    }))


if __name__ == "__main__":
    main()
