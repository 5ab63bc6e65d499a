"""CLI end-to-end: artifact bundle -> prove -> verify -> tamper-reject.

Mirrors the reference's user surface (`sandstorm --program ... prove/
verify`, cli/src/main.rs) in-process on generated tiny bundles, for both
the Starkware-prime and Goldilocks (Fq3 challenges) prime dispatches.
"""

import os
import runpy
import sys

import pytest

# heavy tier: CLI end-to-end proves in-process
pytestmark = pytest.mark.slow

from sandstorm_tpu.cli import main
from sandstorm_tpu.stark.verifier import VerificationError


def _make_bundle(tmp_path, field):
    outdir = str(tmp_path / field)
    argv = [sys.argv[0], outdir, "16", field]
    old = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "make_tiny_artifacts.py"),
            run_name="__main__")
    finally:
        sys.argv = old
    return outdir


@pytest.mark.parametrize("field", ["fp252", "goldilocks"])
def test_cli_prove_verify_tamper(tmp_path, field):
    outdir = _make_bundle(tmp_path, field)
    proof_path = os.path.join(outdir, "proof.bin")
    base = ["--program", os.path.join(outdir, "program.json"),
            "--air-public-input", os.path.join(outdir,
                                               "air-public-input.json")]
    main(base + ["prove",
                 "--air-private-input",
                 os.path.join(outdir, "air-private-input.json"),
                 "--output", proof_path,
                 "--num-queries", "4", "--proof-of-work-bits", "4"])
    main(base + ["verify", "--proof", proof_path,
                 "--required-security-bits", "5"])

    data = bytearray(open(proof_path, "rb").read())
    data[len(data) // 2] ^= 0x40
    bad = os.path.join(outdir, "proof_bad.bin")
    open(bad, "wb").write(bytes(data))
    with pytest.raises((VerificationError, SystemExit, AssertionError)):
        main(base + ["verify", "--proof", bad,
                     "--required-security-bits", "5"])


def test_bench_smoke(capsys):
    """The driver's bench.py code path end-to-end on a tiny workload —
    guards the measurement script against engine API drift (a field
    rename once broke it only at the very end of a full TPU run)."""
    os.environ["SANDSTORM_BENCH_SMOKE"] = "1"
    try:
        runpy.run_path(
            os.path.join(os.path.dirname(__file__), "..", "bench.py"),
            run_name="__main__")
    finally:
        del os.environ["SANDSTORM_BENCH_SMOKE"]
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json
    rec = json.loads(out)
    assert rec["metric"] == "cairo_steps_proved_per_sec"
    assert rec["value"] > 0 and rec["detail"]["proof_bytes"] > 0
