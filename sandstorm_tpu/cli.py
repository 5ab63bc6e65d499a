"""Command-line interface mirroring the reference CLI semantics
(/root/reference cli/src/main.rs):

    python -m sandstorm_tpu --program p.json --air-public-input pub.json \
        prove --air-private-input priv.json --output proof.bin \
        [--num-queries 65] [--lde-blowup-factor 2] [--proof-of-work-bits 16] \
        [--fri-folding-factor 8] [--fri-max-remainder-coeffs 16]

    python -m sandstorm_tpu --program p.json --air-public-input pub.json \
        verify --proof proof.bin [--required-security-bits 80]

Field dispatch on the program's prime (main.rs:83-135): the Starkware
252-bit prime, or Goldilocks behind the experimental path.
"""

import argparse
import sys
import time

from .binary.formats import Layout
from .claims import CairoClaim
from .examples import load_artifacts
from .fields.fp252 import Fp252
from .fields.goldilocks import GL
from .stark.options import ProofOptions
from .stark.ark import parse_proof, serialize_proof
from .stark.verifier import VerificationError


def _field_for_prime(prime: int):
    if prime == Fp252.MODULUS:
        return Fp252
    if prime == GL.MODULUS:
        # the reference's Goldilocks dispatch draws challenges from the
        # CUBIC extension (`Fq3: StarkExtensionOf<Fp>`, main.rs:104-110);
        # trace columns stay base-field, transcript/OODS/DEEP run in
        # GF(p^3) (fields/gl3.py)
        from .fields.gl3 import GL3
        return GL3
    raise SystemExit(f"unsupported field prime: {hex(prime)}")


def main(argv=None):
    from . import enable_compile_cache, probe_tpu
    probe_tpu()  # revive a wedged axon tunnel before backend init
    enable_compile_cache()
    parser = argparse.ArgumentParser(prog="sandstorm-tpu")
    parser.add_argument("--program", required=True)
    parser.add_argument("--air-public-input", required=True)
    parser.add_argument("--layout", default=None,
                        help="override layout (default: from public input)")
    parser.add_argument("--scheme", default=None,
                        choices=["generic", "eth", "cairo"],
                        help="proof scheme: generic (device Blake2s Merkle "
                             "+ generic coin), eth (EthVerifierClaim: masked"
                             "-Keccak Merkle + Solidity coin), cairo (Cairo"
                             "VerifierClaim: friendly Merkle + Cairo coin). "
                             "Default: dispatched from the layout like the "
                             "reference CLI (recursive -> cairo, starknet -> "
                             "eth, otherwise generic; main.rs:83-135)")
    sub = parser.add_subparsers(dest="command", required=True)

    prove_p = sub.add_parser("prove")
    prove_p.add_argument("--air-private-input", required=True)
    prove_p.add_argument("--output", required=True)
    prove_p.add_argument("--num-queries", type=int, default=65)
    prove_p.add_argument("--lde-blowup-factor", type=int, default=2)
    prove_p.add_argument("--proof-of-work-bits", type=int, default=16)
    prove_p.add_argument("--fri-folding-factor", type=int, default=8)
    prove_p.add_argument("--fri-max-remainder-coeffs", type=int, default=16)

    verify_p = sub.add_parser("verify")
    verify_p.add_argument("--proof", required=True)
    verify_p.add_argument("--required-security-bits", type=int, default=80)

    args = parser.parse_args(argv)

    def scheme_for(layout, F):
        """The reference's product configuration per layout
        (cli/src/main.rs:83-135): Starkware-prime recursive proves the
        CairoVerifierClaim, starknet the EthVerifierClaim; everything
        else (incl. the Goldilocks experimental path) the generic scheme.
        --scheme overrides."""
        if args.scheme:
            return args.scheme
        if F is Fp252 and layout == Layout.RECURSIVE:
            return "cairo"
        if F is Fp252 and layout == Layout.STARKNET:
            return "eth"
        return "generic"

    if args.command == "prove":
        program, pub, witness = load_artifacts(
            args.program, args.air_public_input, args.air_private_input)
        F = _field_for_prime(program.prime)
        layout = Layout(args.layout) if args.layout else pub.layout
        claim = CairoClaim(program, pub, field=F, layout=layout,
                           scheme=scheme_for(layout, F))
        options = ProofOptions(
            num_queries=args.num_queries,
            lde_blowup_factor=args.lde_blowup_factor,
            proof_of_work_bits=args.proof_of_work_bits,
            fri_folding_factor=args.fri_folding_factor,
            fri_max_remainder_coeffs=args.fri_max_remainder_coeffs)
        now = time.time()
        proof = claim.prove(witness, options)
        t = time.time() - now
        blob = serialize_proof(proof)
        with open(args.output, "wb") as f:
            f.write(blob)
        print(f"proof generated in {t:.1f}s")
        sec = options.security_level_bits(
            field_bits=F.MODULUS.bit_length(),
            collision_resistance_bits=getattr(
                claim.scheme, "COLLISION_RESISTANCE_BITS", None))
        print(f"proof security (conjectured): {sec}bit")
        print(f"proof size: {len(blob) / 1024:.1f}KB")
        return 0

    if args.command == "verify":
        from .binary.formats import CompiledProgram, AirPublicInput
        program = CompiledProgram.from_json(args.program)
        pub = AirPublicInput.from_json(args.air_public_input)
        F = _field_for_prime(program.prime)
        layout = Layout(args.layout) if args.layout else pub.layout
        claim = CairoClaim(program, pub, field=F, layout=layout,
                           scheme=scheme_for(layout, F))
        now = time.time()
        try:
            with open(args.proof, "rb") as f:
                proof = parse_proof(f.read(), modulus=F.MODULUS)
            claim.verify(proof, args.required_security_bits)
        except (AssertionError, VerificationError) as e:
            # malformed bytes (parse asserts) and protocol defects both
            # surface as a clean rejection, mirroring `sandstorm verify`
            raise SystemExit(f"proof rejected: {e}")
        print(f"proof verified in {time.time() - now:.2f}s")
        return 0


if __name__ == "__main__":
    sys.exit(main())
