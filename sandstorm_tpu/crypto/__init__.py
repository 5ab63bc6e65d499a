"""Crypto adapters: hash functions, Fiat-Shamir coins, Merkle variants.

The analog of the reference's `crypto` crate (SURVEY.md §2.3).
"""

from .hashes import (keccak256, Keccak256HashFn, MaskedKeccak256HashFn,
                     CanonicalKeccak256HashFn, Blake2sHashFn,
                     MaskedBlake2sHashFn, PedersenHashFn,
                     to_montgomery_bytes, from_montgomery_int)
from .coins import SolidityVerifierPublicCoin, CairoVerifierPublicCoin

__all__ = [
    "keccak256", "Keccak256HashFn", "MaskedKeccak256HashFn",
    "CanonicalKeccak256HashFn", "Blake2sHashFn", "MaskedBlake2sHashFn",
    "PedersenHashFn", "to_montgomery_bytes", "from_montgomery_int",
    "SolidityVerifierPublicCoin", "CairoVerifierPublicCoin",
]
