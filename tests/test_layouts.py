"""Layout-level tests on the reference's real artifacts (trace builders +
hints; CPU-only — full prove/verify e2e runs on the TPU via tools/ and the
bench).

These exercise the recursive (16384-step array-sum) and starknet (2^21-row
bootloader) trace builders end to end: every structural assertion inside
the builders (memory continuity/single-valuedness, rc/diluted pool
balance, rc_min/max against the public input) must hold on real data.
"""

import os

import numpy as np
import pytest

# heavy tier: builds real-artifact traces up to the 2^21-row bootloader
pytestmark = pytest.mark.slow

from sandstorm_tpu.examples import load_artifacts
from sandstorm_tpu.fields.fp252 import Fp252 as F

EXAMPLE = "/root/reference/example"

needs_example = pytest.mark.skipif(
    not os.path.exists(EXAMPLE), reason="reference example artifacts absent")


@pytest.fixture(scope="module")
def recursive_trace():
    program, pub, witness = load_artifacts(
        os.path.join(EXAMPLE, "array-sum.json"),
        os.path.join(EXAMPLE, "air-public-input.json"),
        os.path.join(EXAMPLE, "air-private-input.json"),
        base_dir=EXAMPLE)
    from sandstorm_tpu.layouts.recursive import RecursiveExecutionTrace
    return RecursiveExecutionTrace(F, program, pub, witness), pub


@needs_example
def test_recursive_trace_builds(recursive_trace):
    trace, pub = recursive_trace
    assert trace.trace_len == pub.n_steps * 16
    assert set(trace.base_cols_canonical) == set(range(7))
    for col in trace.base_cols_canonical.values():
        assert col.shape == (trace.trace_len, 4)


@needs_example
def test_recursive_constraint_count_and_hints(recursive_trace):
    trace, pub = recursive_trace
    from sandstorm_tpu.layouts.recursive import RecursiveAirConfig as air
    p = F.MODULUS
    g = F.root_of_unity_int(trace.trace_len)
    constraints = air.constraints(trace.trace_len, p, g)
    assert len(constraints) == 93
    hints = air.gen_hints(trace.trace_len, pub, list(range(1, 7)), p)
    assert len(hints) == air.NUM_HINTS
    assert hints[5] == 1 and hints[8] == 1 and hints[9] == 0
    pcs = air.periodic_columns(trace.trace_len)
    assert len(pcs) == 2


@needs_example
def test_recursive_diluted_permutation_balance(recursive_trace):
    """col1 (unordered) and col2 (ordered) must be equal as multisets —
    the AIR's diluted permutation argument requires exactly this."""
    trace, _ = recursive_trace
    un = np.sort(trace.base_cols_canonical[1][:, 0])
    od = np.sort(trace.base_cols_canonical[2][:, 0])
    assert (trace.base_cols_canonical[1][:, 1:] == 0).all()
    assert (un == od).all()


@needs_example
def test_recursive_rc_permutation_balance(recursive_trace):
    trace, _ = recursive_trace
    rc = trace.base_cols_canonical[5]
    unordered = np.sort(rc[0::4, 0])
    ordered = np.sort(rc[2::4, 0])
    assert (unordered == ordered).all()


@pytest.fixture(scope="module")
def starknet_trace():
    base = os.path.join(EXAMPLE, "bootloader")
    program, pub, witness = load_artifacts(
        os.path.join(base, "bootloader_compiled.json"),
        os.path.join(base, "air-public-input.json"),
        os.path.join(base, "air-private-input.json"),
        base_dir=base)
    from sandstorm_tpu.layouts.starknet import StarknetExecutionTrace
    return StarknetExecutionTrace(F, program, pub, witness), pub


@needs_example
def test_starknet_trace_builds(starknet_trace):
    trace, pub = starknet_trace
    assert trace.trace_len == pub.n_steps * 16 == 1 << 21
    assert set(trace.base_cols_canonical) == set(range(9))


@needs_example
def test_starknet_constraint_count_and_hints(starknet_trace):
    trace, pub = starknet_trace
    from sandstorm_tpu.layouts.starknet import StarknetAirConfig as air
    p = F.MODULUS
    g = F.root_of_unity_int(trace.trace_len)
    constraints = air.constraints(trace.trace_len, p, g)
    assert len(constraints) == 195
    hints = air.gen_hints(trace.trace_len, pub, list(range(1, 7)), p)
    assert len(hints) == 17
    pcs = air.periodic_columns(trace.trace_len)
    assert len(pcs) == 9


@needs_example
def test_starknet_diluted_and_rc_balance(starknet_trace):
    trace, _ = starknet_trace
    rc = trace.base_cols_canonical[7]
    un = np.sort(rc[1::8, 0])
    od = np.sort(rc[5::8, 0])
    assert (un == od).all()
    unordered = np.sort(rc[0::4, 0])
    ordered = np.sort(rc[2::4, 0])
    assert (unordered == ordered).all()


def test_poseidon_periodic_partial_key_matches_verifier_constant():
    """The interpolated partial-round key-0 polynomial must reproduce
    StarkWare's deployed verifier coefficient (the reference bakes it as
    builtins/src/poseidon/periodic.rs PARTIAL_ROUND_KEY_0_COEFFS[0])."""
    from sandstorm_tpu.layouts.starknet.air import _periodic_columns
    pcs = _periodic_columns()
    partial0 = pcs[7]
    assert partial0.coeffs[0] == int(
        "2011058453588713720249123693775956922878707212487922032862264007"
        "270822126798")
    partial1 = pcs[8]
    assert partial1.coeffs[0] == int(
        "2134335647277236274172649243940335615164845847046811650862308089"
        "928274309142")


def test_poseidon_optimized_witness_matches_permutation():
    from sandstorm_tpu.builtins.poseidon import InstanceTrace, hash_two
    t = InstanceTrace.new(0, 5, 7, 2)
    # the optimized schedule must land on the plain permutation's output
    assert t.output0 == hash_two(5, 7)
    assert len(t.partial_round_states) == 83
    assert len(t.full_round_states_1st_half) == 4
