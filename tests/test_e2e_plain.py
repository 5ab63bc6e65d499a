"""End-to-end prove + verify on the plain layout with a VM-generated trace.

The reference's e2e flow is cairo-compile/cairo-run/prove/verify
(README.md:36-77); here the built-in mini runner generates the witness.
Proofs are the engine's single ark-format type (stark/ark.py), matching
the reference's ark-CanonicalSerialize byte layout.
"""

import pytest

# heavy tier: full CPU end-to-end proves (minutes each)
pytestmark = pytest.mark.slow

from sandstorm_tpu.binary.formats import AirPrivateInput, CairoWitness, Layout
from sandstorm_tpu.claims import CairoClaim
from sandstorm_tpu.fields.fp252 import Fp252
from sandstorm_tpu.runner.vm import (
    CairoVM, instr_assert_eq_imm, instr_jmp_rel_imm)
from sandstorm_tpu.stark.ark import parse_proof, serialize_proof
from sandstorm_tpu.stark.options import ProofOptions
from sandstorm_tpu.stark.verifier import VerificationError


def _tiny_run(num_cycles=16):
    p = Fp252.MODULUS
    # [ap] = 10; ap++  then the proof-mode padding loop jmp rel 0
    words = [instr_assert_eq_imm(), 10, instr_jmp_rel_imm(), 0]
    vm = CairoVM(words, p)
    trace, mem = vm.run(num_cycles, initial_ap=6, extra_memory={5: 0})
    registers, memory = vm.to_witness_arrays(trace, mem)
    pub = vm.build_public_input(trace, mem, layout=Layout.PLAIN)
    witness = CairoWitness(
        air_private_input=AirPrivateInput("", "", [], [], [], [], [], []),
        register_states=registers, memory=memory)
    return pub, witness


OPTIONS = ProofOptions(num_queries=8, lde_blowup_factor=2,
                       proof_of_work_bits=8, fri_folding_factor=8,
                       fri_max_remainder_coeffs=16)


@pytest.fixture(scope="module")
def proof_and_claim():
    pub, witness = _tiny_run()
    claim = CairoClaim(None, pub, field=Fp252, layout=Layout.PLAIN)
    proof = claim.prove(witness, OPTIONS)
    return claim, proof


def test_prove_verify_roundtrip(proof_and_claim):
    claim, proof = proof_and_claim
    assert claim.verify(proof, required_security_bits=0)


def test_proof_serialization_roundtrip(proof_and_claim):
    claim, proof = proof_and_claim
    data = serialize_proof(proof)
    restored = parse_proof(data)
    assert serialize_proof(restored) == data
    assert claim.verify(restored, required_security_bits=0)


def test_prove_verify_goldilocks():
    """The Goldilocks plain-layout path (the reference's experimental_claims
    Goldilocks configuration, cli/src/main.rs:103-133) proves and verifies
    end-to-end; exercises the field-width-aware row hashing."""
    from sandstorm_tpu.fields.goldilocks import GL
    pub, witness = _tiny_run()
    claim = CairoClaim(None, pub, field=GL, layout=Layout.PLAIN)
    proof = claim.prove(witness, OPTIONS)
    assert claim.verify(proof, required_security_bits=0)


def test_prove_verify_goldilocks_cubic_extension():
    """The Goldilocks CUBIC-EXTENSION configuration: trace columns embed in
    GF(p), but challenges, the OODS point, and all DEEP/FRI randomness are
    GF(p^3) elements (~2^-190 per-challenge soundness) — the analog of the
    reference's `Fq3: StarkExtensionOf<Fp>` fast-field dispatch
    (cli/src/main.rs:104-133)."""
    from sandstorm_tpu.fields.gl3 import GL3, Q
    pub, witness = _tiny_run()
    claim = CairoClaim(None, pub, field=GL3, layout=Layout.PLAIN)
    options = ProofOptions(num_queries=4, lde_blowup_factor=2,
                           proof_of_work_bits=4, fri_folding_factor=8,
                           fri_max_remainder_coeffs=16)
    proof = claim.prove(witness, options)
    # every transcript draw is a full-width extension element
    restored = parse_proof(serialize_proof(proof))
    assert claim.verify(restored, required_security_bits=0)
    # the OODS evaluations genuinely live in the extension (not base-embedded)
    from sandstorm_tpu.fields.goldilocks import P as GLP
    assert any(v >= GLP for v in proof.execution_ood_evals), \
        "OODS trace values unexpectedly all in the base field"
    assert all(v < Q for v in proof.execution_ood_evals)


def test_recursive_layout_minimum_trace_diagnostic():
    """A CPU-scale recursive-layout prove is structurally impossible: the
    diluted-check pool must cover the full 16-bit range, and its padding
    can only land in the free odd cells of bitwise windows (60 per 128
    rows; recursive/trace.rs:557-592) — so traces below 2^17 rows cannot
    balance the pool (the reference has the identical bound).  Recursive
    proving is exercised end-to-end on the real 16384-step example by
    bench.py / tools/check_air.py on TPU; here we pin the failure mode so
    an undersized trace dies with the documented diagnostic, not a bogus
    proof."""
    from sandstorm_tpu.binary.formats import Segment
    p = Fp252.MODULUS
    words = [instr_assert_eq_imm(), 10, instr_jmp_rel_imm(), 0]
    vm = CairoVM(words, p)
    trace, mem = vm.run(256, initial_ap=6, extra_memory={5: 0})
    registers, memory = vm.to_witness_arrays(trace, mem)
    pub = vm.build_public_input(trace, mem, layout=Layout.RECURSIVE)
    n = 256 * 16
    base = max(max(e.address for e in pub.public_memory) + 2,
               int(registers.ap.max()) + 1)
    ped_begin, rc_begin = base, base + 3 * (n // 2048)
    bw_begin = rc_begin + n // 128
    pub.memory_segments["pedersen"] = Segment(ped_begin, ped_begin)
    pub.memory_segments["range_check"] = Segment(rc_begin, rc_begin)
    pub.memory_segments["bitwise"] = Segment(bw_begin, bw_begin)
    witness = CairoWitness(
        air_private_input=AirPrivateInput("", "", [], [], [], [], [], []),
        register_states=registers, memory=memory)
    claim = CairoClaim(None, pub, field=Fp252, layout=Layout.RECURSIVE,
                       scheme="cairo")
    with pytest.raises(AssertionError, match="diluted padding overflow"):
        claim.prove(witness, ProofOptions(num_queries=4,
                                          proof_of_work_bits=4))


@pytest.mark.parametrize("scheme", ["eth", "cairo"])
def test_prove_verify_sharp_schemes(scheme):
    """Full prove+verify under the SHARP-targeting schemes: eth
    (LeafVariant masked-Keccak tree + Solidity coin, EthVerifierClaim) and
    cairo (FriendlyMerkleTree + Cairo coin, CairoVerifierClaim) — the
    reference's actual products (src/claims.rs:12-33)."""
    pub, witness = _tiny_run()
    claim = CairoClaim(None, pub, field=Fp252, layout=Layout.PLAIN,
                       scheme=scheme)
    proof = claim.prove(witness, OPTIONS)
    restored = parse_proof(serialize_proof(proof))
    assert claim.verify(restored, required_security_bits=0)
    # cross-scheme rejection: an eth proof must not verify as cairo & v.v.
    other = CairoClaim(None, pub, field=Fp252, layout=Layout.PLAIN,
                       scheme="cairo" if scheme == "eth" else "eth")
    with pytest.raises(VerificationError):
        other.verify(restored, required_security_bits=0)


@pytest.mark.parametrize("blowup,fold", [(2, 4), (2, 16), (4, 8), (4, 16)])
def test_prove_verify_options_matrix(blowup, fold):
    """Off-default engine parameters: lde_blowup_factor and
    fri_folding_factor are real knobs (ProofOptions::new,
    cli/src/main.rs:45-61), not pinned constants."""
    pub, witness = _tiny_run()
    claim = CairoClaim(None, pub, field=Fp252, layout=Layout.PLAIN)
    options = ProofOptions(num_queries=4, lde_blowup_factor=blowup,
                           proof_of_work_bits=4, fri_folding_factor=fold,
                           fri_max_remainder_coeffs=16)
    proof = claim.prove(witness, options)
    assert claim.verify(parse_proof(serialize_proof(proof)),
                        required_security_bits=0)


# -- adversarial tamper matrix ------------------------------------------------
# Every mutation below must be caught; each targets a distinct verifier
# check (transcript replay, PoW, Merkle paths, FRI walk, OODS identity,
# felt range validation).

P = Fp252.MODULUS


def _t_pow_nonce(p):
    p.pow_nonce ^= 1


def _t_base_root(p):
    p.base_commitment = bytes([p.base_commitment[0] ^ 1]) \
        + p.base_commitment[1:]


def _t_fri_root(p):
    last = p.fri_layers[-1]
    last.commitment = bytes([last.commitment[0] ^ 1]) + last.commitment[1:]


def _t_fri_row_value(p):
    p.fri_layers[0].values[0] = (p.fri_layers[0].values[0] + 1) % P


def _t_fri_layer_dropped(p):
    p.fri_layers = p.fri_layers[:-1]


def _t_fri_row_reordered(p):
    f = p.options[3]
    row = p.fri_layers[0].values[:f]
    p.fri_layers[0].values[:f] = list(reversed(row))


def _t_fri_remainder(p):
    p.fri_remainder = list(p.fri_remainder)
    p.fri_remainder[0] = (p.fri_remainder[0] + 1) % P


def _t_fri_remainder_extended(p):
    # exceed fri_max_remainder_coeffs: degree-bound check must fire
    max_rem = p.options[4]
    p.fri_remainder = list(p.fri_remainder) + [1] * (
        max_rem + 1 - len(p.fri_remainder))


def _t_oods_comp_value(p):
    p.composition_ood_evals = list(p.composition_ood_evals)
    p.composition_ood_evals[0] = (p.composition_ood_evals[0] + 1) % P


def _t_oods_trace_value(p):
    p.execution_ood_evals = list(p.execution_ood_evals)
    p.execution_ood_evals[0] = (p.execution_ood_evals[0] + 1) % P


def _t_out_of_range_felt(p):
    # non-canonical felt in an opening: must be rejected, not reduced
    p.queries.base_values[0] = p.queries.base_values[0] + P


def _t_merkle_path_node(p):
    view = p.queries.base_proofs[0]
    if view.nodes:
        view.nodes[0] = bytes([view.nodes[0][0] ^ 1]) + view.nodes[0][1:]
    else:
        view.initial_leaf = bytes([view.initial_leaf[0] ^ 1]) \
            + view.initial_leaf[1:]


def _t_merkle_own_leaf(p):
    view = p.queries.base_proofs[0]
    view.sibling_leaf = bytes([view.sibling_leaf[0] ^ 1]) \
        + view.sibling_leaf[1:]


def _t_ext_row(p):
    # plain layout always has permutation extension columns
    assert p.queries.ext_values, "expected extension columns"
    p.queries.ext_values[0] = (p.queries.ext_values[0] + 1) % P


def _t_comp_row(p):
    p.queries.comp_values[0] = (p.queries.comp_values[0] + 1) % P


def _t_trace_len(p):
    p.trace_len *= 2


TAMPERS = [
    _t_pow_nonce, _t_base_root, _t_fri_root, _t_fri_row_value,
    _t_fri_layer_dropped, _t_fri_row_reordered, _t_fri_remainder,
    _t_fri_remainder_extended, _t_oods_comp_value, _t_oods_trace_value,
    _t_out_of_range_felt, _t_merkle_path_node, _t_merkle_own_leaf,
    _t_ext_row, _t_comp_row, _t_trace_len,
]


@pytest.mark.parametrize("tamper", TAMPERS, ids=lambda t: t.__name__[3:])
def test_tamper_matrix(proof_and_claim, tamper):
    claim, proof = proof_and_claim
    bad = parse_proof(serialize_proof(proof))
    tamper(bad)
    with pytest.raises((VerificationError, ValueError, AssertionError,
                        IndexError, OverflowError)) as exc:
        claim.verify(bad, required_security_bits=0)
    # mutations must surface as typed verification errors, not crashes
    assert isinstance(exc.value, VerificationError), (
        f"{tamper.__name__}: raised {type(exc.value).__name__} "
        f"instead of VerificationError: {exc.value}")
