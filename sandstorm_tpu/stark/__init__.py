from .options import ProofOptions
from .proof import Proof, QueryOpening
from .prover import prove
from .verifier import verify, VerificationError

__all__ = [
    "ProofOptions", "Proof", "QueryOpening", "prove", "verify",
    "VerificationError",
]
