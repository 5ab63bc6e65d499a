"""Claim assembly: ties a Cairo program + public input to a layout AIR,
trace builder, field, and transcript — the analog of the reference's
CairoClaim<Fp, A, T, M, P> (src/lib.rs:34-125) and its type aliases
(src/claims.rs:12-33).
"""

from .binary.formats import Layout
from .fields.fp252 import Fp252
from .layouts.plain.air import PlainAirConfig
from .layouts.plain.trace import PlainExecutionTrace
from .layouts.recursive.air import RecursiveAirConfig
from .layouts.recursive.trace import RecursiveExecutionTrace
from .layouts.starknet.air import StarknetAirConfig
from .layouts.starknet.trace import StarknetExecutionTrace
from .stark.options import ProofOptions
from .stark.prover import prove as stark_prove
from .stark.scheme import get_scheme
from .stark.verifier import verify as stark_verify


_LAYOUTS = {
    Layout.PLAIN: (PlainAirConfig, PlainExecutionTrace),
    Layout.RECURSIVE: (RecursiveAirConfig, RecursiveExecutionTrace),
    Layout.STARKNET: (StarknetAirConfig, StarknetExecutionTrace),
}


class CairoClaim:
    """The generic claim: program + public input + layout + field + proof
    scheme (commitment/coin pair — see stark/scheme.py)."""

    def __init__(self, program, public_input, field=Fp252, layout=None,
                 scheme=None):
        self.program = program
        self.public_input = public_input
        self.F = field
        self.layout = layout or public_input.layout
        if self.layout not in _LAYOUTS:
            raise NotImplementedError(
                f"layout {self.layout} not yet implemented")
        self.air_config, self.trace_cls = _LAYOUTS[self.layout]
        self.scheme = get_scheme(scheme)

    def generate_trace(self, witness):
        return self.trace_cls(self.F, self.program, self.public_input, witness)

    def prove(self, witness, options: ProofOptions = None, mesh=None):
        trace = self.generate_trace(witness)
        return stark_prove(self.F, self.air_config, trace, options,
                           scheme=self.scheme, mesh=mesh)

    def verify(self, proof, required_security_bits: int = 80) -> bool:
        return stark_verify(self.F, self.air_config, self.public_input,
                            proof, required_security_bits,
                            scheme=self.scheme)


def EthVerifierClaim(program, public_input, field=Fp252, layout=None):
    """LeafVariant(MaskedKeccak256<20>) + Solidity coin — the claim whose
    proofs target StarkWare's Ethereum verifier (src/claims.rs:12-21)."""
    return CairoClaim(program, public_input, field, layout, scheme="eth")


def CairoVerifierClaim(program, public_input, field=Fp252, layout=None):
    """FriendlyMerkleTree<22, Pedersen> + Cairo coin — the claim whose
    proofs target StarkWare's Cairo verifier (src/claims.rs:23-33)."""
    return CairoClaim(program, public_input, field, layout, scheme="cairo")
