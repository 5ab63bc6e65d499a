"""The STARK verifier (host-side python-int math; mirrors SURVEY.md §3.2).

The actual verification logic lives in stark/interop.py::verify_ark and
operates on the ark-format `ArkProof` — the engine's single proof type,
byte-compatible with the reference's ark-CanonicalSerialize layout
(stark/ark.py).  It replays the Fiat-Shamir transcript, checks the OODS
constraint identity against the claimed out-of-domain openings, verifies
the proof-of-work and every Merkle decommitment, recomputes the DEEP
composition at each query, and walks the FRI layers down to the remainder
polynomial.
"""

from .scheme import get_scheme


class VerificationError(Exception):
    pass


def _check(cond, msg):
    if not cond:
        raise VerificationError(msg)


def verify(F, air_config, public_input, proof,
           required_security_bits: int = 80, scheme=None) -> bool:
    """Verify an ArkProof (raises VerificationError on any defect)."""
    from .interop import verify_ark
    return verify_ark(F, air_config, public_input, proof, get_scheme(scheme),
                      required_security_bits=required_security_bits)
