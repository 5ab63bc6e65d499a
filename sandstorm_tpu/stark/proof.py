"""Proof container + serialization.

Engine parity with miniSTARK's Proof<Claim> (canonical serialize /
deserialize + security estimate; SURVEY.md §2.7).  Round-1 serialization is
a deterministic self-describing binary format; the ark-compatible byte
layout needed for cross-checking against reference-generated proofs is a
SHARP-compatibility work item layered on top of this container.
"""

import dataclasses
import io
import struct
from typing import List

from .options import ProofOptions


@dataclasses.dataclass
class QueryOpening:
    base_row: List[int]
    ext_row: List[int]
    comp_row: List[int]
    base_path: List[bytes]
    ext_path: List[bytes]
    comp_path: List[bytes]
    fri_rows: List[List[int]]
    fri_paths: List[List[bytes]]


@dataclasses.dataclass
class Proof:
    options: ProofOptions
    trace_len: int
    base_root: bytes
    ext_root: bytes
    comp_root: bytes
    oods_trace_values: List[int]
    oods_comp_values: List[int]
    fri_roots: List[bytes]
    fri_remainder: List[int]
    pow_nonce: int
    openings: List[QueryOpening]

    # -- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        out = io.BytesIO()

        def w_bytes(b):
            out.write(struct.pack("<I", len(b)))
            out.write(b)

        def w_felts(vals):
            out.write(struct.pack("<I", len(vals)))
            for v in vals:
                out.write(int(v).to_bytes(32, "little"))

        def w_path(path):
            # a path is a list of 32-byte sibling digests, leaf -> root
            out.write(struct.pack("<I", len(path)))
            for digest in path:
                assert len(digest) == 32
                out.write(digest)

        out.write(b"SSTPU01\x00")
        out.write(self.options.to_bytes())
        out.write(struct.pack("<Q", self.trace_len))
        w_bytes(self.base_root)
        w_bytes(self.ext_root)
        w_bytes(self.comp_root)
        w_felts(self.oods_trace_values)
        w_felts(self.oods_comp_values)
        out.write(struct.pack("<I", len(self.fri_roots)))
        for r in self.fri_roots:
            w_bytes(r)
        w_felts(self.fri_remainder)
        out.write(struct.pack("<Q", self.pow_nonce))
        out.write(struct.pack("<I", len(self.openings)))
        for q in self.openings:
            w_felts(q.base_row)
            w_felts(q.ext_row)
            w_felts(q.comp_row)
            for path in (q.base_path, q.ext_path, q.comp_path):
                w_path(path)
            out.write(struct.pack("<I", len(q.fri_rows)))
            for row, path in zip(q.fri_rows, q.fri_paths):
                w_felts(row)
                w_path(path)
        return out.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "Proof":
        inp = io.BytesIO(data)

        def r_u32():
            return struct.unpack("<I", inp.read(4))[0]

        def r_bytes():
            return inp.read(r_u32())

        def r_felts():
            return [int.from_bytes(inp.read(32), "little")
                    for _ in range(r_u32())]

        def r_path():
            return [inp.read(32) for _ in range(r_u32())]

        magic = inp.read(8)
        assert magic == b"SSTPU01\x00", "bad proof magic"
        opt_vals = struct.unpack(">5I", inp.read(20))
        options = ProofOptions(*opt_vals)
        trace_len = struct.unpack("<Q", inp.read(8))[0]
        base_root, ext_root, comp_root = r_bytes(), r_bytes(), r_bytes()
        oods_trace = r_felts()
        oods_comp = r_felts()
        fri_roots = [r_bytes() for _ in range(r_u32())]
        fri_remainder = r_felts()
        pow_nonce = struct.unpack("<Q", inp.read(8))[0]
        nq = r_u32()
        openings = []
        for _ in range(nq):
            base_row = r_felts()
            ext_row = r_felts()
            comp_row = r_felts()
            base_path = r_path()
            ext_path = r_path()
            comp_path = r_path()
            nl = r_u32()
            fri_rows, fri_paths = [], []
            for _ in range(nl):
                fri_rows.append(r_felts())
                fri_paths.append(r_path())
            openings.append(QueryOpening(
                base_row, ext_row, comp_row, base_path, ext_path, comp_path,
                fri_rows, fri_paths))
        return cls(options, trace_len, base_root, ext_root, comp_root,
                   oods_trace, oods_comp, fri_roots, fri_remainder,
                   pow_nonce, openings)

    def size_bytes(self) -> int:
        return len(self.to_bytes())
