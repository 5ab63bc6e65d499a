"""Proof options.

Parity with ministark's ProofOptions::new(num_queries, lde_blowup_factor,
proof_of_work_bits, fri_folding_factor, fri_max_remainder_coeffs); defaults
match the reference CLI (cli/src/main.rs:45-61).
"""

import dataclasses


@dataclasses.dataclass(frozen=True)
class ProofOptions:
    num_queries: int = 65
    lde_blowup_factor: int = 2
    proof_of_work_bits: int = 16
    fri_folding_factor: int = 8
    fri_max_remainder_coeffs: int = 16

    def to_bytes(self) -> bytes:
        return b"".join(
            int(v).to_bytes(4, "big")
            for v in (self.num_queries, self.lde_blowup_factor,
                      self.proof_of_work_bits, self.fri_folding_factor,
                      self.fri_max_remainder_coeffs))

    def security_level_bits(self) -> int:
        """Conjectured security (queries * log2(blowup) + pow bits)."""
        import math
        return int(self.num_queries * math.log2(self.lde_blowup_factor)
                   + self.proof_of_work_bits)
