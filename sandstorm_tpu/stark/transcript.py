"""Shared transcript seeding so prover and verifier replay identically.

The analog of the reference's CairoPublicCoin::from_public_input
(src/lib.rs:127-167): the coin is seeded from a canonical serialization of
the AIR public input (+ proof options + trace length).
"""

import struct

from ..coin import PublicCoin


def serialize_public_input(pub) -> bytes:
    parts = [pub.layout.value.encode(),
             struct.pack(">QQQ", pub.rc_min, pub.rc_max, pub.n_steps)]
    for name in sorted(pub.memory_segments):
        seg = pub.memory_segments[name]
        parts.append(name.encode())
        parts.append(struct.pack(">QQ", seg.begin_addr, seg.stop_ptr))
    for e in pub.public_memory:
        parts.append(struct.pack(">Q", e.address))
        parts.append(int(e.value).to_bytes(32, "big"))
    return b"\x00".join(parts)


def make_coin(pub, options, trace_len: int) -> PublicCoin:
    seed = (serialize_public_input(pub) + options.to_bytes()
            + struct.pack(">Q", trace_len))
    return PublicCoin(seed)
