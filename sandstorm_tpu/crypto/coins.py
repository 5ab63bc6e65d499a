"""Bit-exact Fiat-Shamir coins for StarkWare's two external verifiers.

Protocol parity with /root/reference crypto/src/public_coin/{solidity,cairo}.rs:
- reseed: digest' = H((digest+1 as u256 BE) || data), counter reset
- draw bytes: H(digest || counter as u256 BE), counter += 1
- field draw: rejection sample 256-bit value < 31*MODULUS, then interpret
  as a Montgomery representation (from_montgomery)
- queries: u64 BE chunks of successive draws mod domain_size, deduped into
  a sorted set; the Cairo verifier samples in batches of 4 (cairo.rs:124-130)
- proof of work: prefix = H(0x0123456789ABCDED || digest || pow_bits);
  valid nonce iff H(prefix || nonce) has >= pow_bits leading zero bits;
  grind starts at nonce 1
- Solidity coin reseeds field elements ONE AT A TIME in Montgomery form;
  Cairo coin reseeds a field-element list via the Pedersen chain hash
"""

from .hashes import (keccak256, blake2s256, to_montgomery_bytes,
                     from_montgomery_int, PedersenHashFn, P)

_POW_PREFIX = 0x0123456789ABCDED


def _leading_zero_bits(digest: bytes) -> int:
    v = int.from_bytes(digest, "big")
    return 256 - v.bit_length()


class _VerifierCoin:
    """Shared digest+counter protocol over a pluggable 256-bit hash."""

    HASH = None  # staticmethod bytes -> 32 bytes

    def __init__(self, seed_digest: bytes):
        assert len(seed_digest) == 32
        self.digest = seed_digest
        self.counter = 0

    # -- protocol core -------------------------------------------------------

    def reseed_with_bytes(self, data: bytes):
        d = int.from_bytes(self.digest, "big") + 1
        self.digest = self.HASH(d.to_bytes(32, "big") + data)
        self.counter = 0

    def draw_bytes(self) -> bytes:
        out = self.HASH(self.digest + self.counter.to_bytes(32, "big"))
        self.counter += 1
        return out

    # -- PublicCoin interface (engine-facing) ---------------------------------

    def reseed_with_digest(self, digest: bytes):
        self.reseed_with_bytes(digest)

    def reseed_with_int(self, value: int):
        self.reseed_with_bytes(int(value).to_bytes(8, "big"))

    def reseed_with_field_element_vector(self, modulus, elements):
        self.reseed_with_bytes(
            b"".join(to_montgomery_bytes(int(e)) for e in elements))

    def draw_felt(self, modulus: int = P) -> int:
        bound = 31 * P
        while True:
            v = int.from_bytes(self.draw_bytes(), "big")
            if v < bound:
                return from_montgomery_int(v)

    def draw_felts(self, modulus: int, n: int):
        return [self.draw_felt(modulus) for _ in range(n)]

    def _draw_u64s(self, count: int):
        out = []
        while len(out) < count:
            raw = self.draw_bytes()
            for i in range(0, 32, 8):
                out.append(int.from_bytes(raw[i:i + 8], "big"))
        return out[:count]

    def draw_queries(self, num_queries: int, domain_size: int):
        vals = self._draw_u64s(num_queries)
        return sorted({v % domain_size for v in vals})

    # -- proof of work ---------------------------------------------------------

    def _pow_prefix(self, bits: int) -> bytes:
        return self.HASH(_POW_PREFIX.to_bytes(8, "big") + self.digest
                         + bytes([bits]))

    def verify_proof_of_work(self, nonce: int, bits: int) -> bool:
        h = self.HASH(self._pow_prefix(bits) + int(nonce).to_bytes(8, "big"))
        return _leading_zero_bits(h) >= bits

    GRIND_HASH = None  # "keccak" | "blake2s" -> device batch grinding

    def grind_proof_of_work(self, bits: int) -> int:
        prefix = self._pow_prefix(bits)
        if self.GRIND_HASH is not None and bits <= 32:
            from .grind import grind
            nonce = grind(self.GRIND_HASH, prefix, bits)
            assert self.verify_proof_of_work(nonce, bits)
            return nonce
        nonce = 1
        while True:
            h = self.HASH(prefix + nonce.to_bytes(8, "big"))
            if _leading_zero_bits(h) >= bits:
                return nonce
            nonce += 1

    def security_level_bits(self) -> int:
        return 128


class SolidityVerifierPublicCoin(_VerifierCoin):
    """Keccak256 coin matching StarkWare's deployed Solidity verifier
    (crypto/src/public_coin/solidity.rs)."""

    HASH = staticmethod(keccak256)
    GRIND_HASH = "keccak"

    def reseed_with_field_elements(self, modulus, elements):
        # one reseed per element, Montgomery form (solidity.rs:66-71)
        for e in elements:
            self.reseed_with_bytes(to_montgomery_bytes(int(e)))


class CairoVerifierPublicCoin(_VerifierCoin):
    """Blake2s256 coin matching StarkWare's Cairo verifier
    (crypto/src/public_coin/cairo.rs)."""

    HASH = staticmethod(blake2s256)
    GRIND_HASH = "blake2s"

    def reseed_with_field_elements(self, modulus, elements):
        # Pedersen chain hash of the element list (cairo.rs:76-80)
        h = PedersenHashFn.hash_elements(int(e) for e in elements)
        self.reseed_with_bytes(int(h).to_bytes(32, "big"))

    # the cairo verifier's canonical felt-vector absorption IS the
    # pedersen chain reseed
    reseed_with_field_element_vector = reseed_with_field_elements

    def draw_queries(self, num_queries: int, domain_size: int):
        # the cairo verifier samples query batches of 4 (cairo.rs:124-130)
        batched = -(-num_queries // 4) * 4
        vals = self._draw_u64s(batched)[:num_queries]
        return sorted({v % domain_size for v in vals})
