"""Parsers for cairo-run artifacts (trace.bin, memory.bin, AIR input JSON).

Format parity with the reference's `binary` crate:
- trace.bin: stream of {ap, fp, pc} little-endian u64 triples
  (binary/src/lib.rs:52-57, 152-162; bincode fixed-int encoding).
- memory.bin: stream of (u64 address, field-size LE value) pairs where the
  value width is the field byte size, 32 for the Starkware prime
  (binary/src/lib.rs:172-213, binary/src/utils.rs:86-90).
- compiled program JSON: {"data": [hex felts], "prime": hex}
  (binary/src/lib.rs:537-559); program word i lives at address i+1 (address
  0 is reserved/null).
- AIR public input JSON: layout/rc_min/rc_max/n_steps/memory_segments/
  public_memory (binary/src/lib.rs:223-340).
- AIR private input JSON: trace/memory paths + per-builtin instances
  (binary/src/lib.rs:342-535).

Parsing is numpy-vectorized (frombuffer) rather than a streamed
deserializer: artifacts are bulk-loaded once per prove.
"""

import dataclasses
import json
import os
from enum import Enum
from typing import Optional

import numpy as np


class Layout(Enum):
    """SHARP layouts (binary/src/lib.rs:58-145)."""
    PLAIN = "plain"
    SMALL = "small"
    DEX = "dex"
    RECURSIVE = "recursive"
    STARKNET = "starknet"
    RECURSIVE_LARGE_OUTPUT = "recursive_large_output"
    ALL_SOLIDITY = "all_solidity"
    STARKNET_WITH_KECCAK = "starknet_with_keccak"

    # unique SHARP codes: the layout name as a big-endian ASCII integer
    # (binary/src/lib.rs:92-95)
    def sharp_code(self) -> int:
        return int.from_bytes(self.value.encode(), "big")


@dataclasses.dataclass
class RegisterStates:
    """[n, 3] uint64 array with columns (ap, fp, pc)."""
    arr: np.ndarray

    AP, FP, PC = 0, 1, 2

    @classmethod
    def from_bytes(cls, data: bytes) -> "RegisterStates":
        assert len(data) % 24 == 0, "trace.bin must be a stream of 3 u64s"
        arr = np.frombuffer(data, dtype="<u8").reshape(-1, 3)
        return cls(arr=arr.copy())

    @classmethod
    def from_file(cls, path: str) -> "RegisterStates":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())

    def __len__(self):
        return self.arr.shape[0]

    @property
    def ap(self):
        return self.arr[:, self.AP]

    @property
    def fp(self):
        return self.arr[:, self.FP]

    @property
    def pc(self):
        return self.arr[:, self.PC]


@dataclasses.dataclass
class Memory:
    """Sparse Cairo memory: dense value table + presence mask.

    values: [max_addr+1, 4] uint64 little-endian 64-bit words (u256 felts)
    known:  [max_addr+1] bool
    """
    values: np.ndarray
    known: np.ndarray

    @classmethod
    def from_bytes(cls, data: bytes, field_bytes: int = 32) -> "Memory":
        entry = 8 + field_bytes
        assert len(data) % entry == 0
        n = len(data) // entry
        raw = np.frombuffer(data, dtype=np.uint8).reshape(n, entry)
        addrs = raw[:, :8].copy().view("<u8").reshape(n)
        vals = raw[:, 8:].copy().view("<u8").reshape(n, field_bytes // 8)
        max_addr = int(addrs.max()) if n else 0
        values = np.zeros((max_addr + 1, 4), dtype=np.uint64)
        known = np.zeros(max_addr + 1, dtype=bool)
        values[addrs, : field_bytes // 8] = vals
        known[addrs] = True
        return cls(values=values, known=known)

    @classmethod
    def from_file(cls, path: str, field_bytes: int = 32) -> "Memory":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read(), field_bytes)

    def __len__(self):
        return self.values.shape[0]

    def value_int(self, addr: int) -> int:
        w = self.values[addr]
        return int(w[0]) | int(w[1]) << 64 | int(w[2]) << 128 | int(w[3]) << 192

    def set(self, addr: int, value: int):
        """Extend/overwrite (used to stuff program memory if absent)."""
        if addr >= len(self):
            grow = addr + 1 - len(self)
            self.values = np.vstack(
                [self.values, np.zeros((grow, 4), dtype=np.uint64)])
            self.known = np.concatenate([self.known, np.zeros(grow, dtype=bool)])
        for i in range(4):
            self.values[addr, i] = (value >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
        self.known[addr] = True


def _parse_hex(v) -> int:
    if isinstance(v, str):
        return int(v, 16)
    return int(v)


@dataclasses.dataclass(frozen=True)
class MemoryEntry:
    address: int
    value: int  # canonical field int


@dataclasses.dataclass(frozen=True)
class Segment:
    begin_addr: int
    stop_ptr: int


@dataclasses.dataclass
class AirPublicInput:
    layout: Layout
    rc_min: int
    rc_max: int
    n_steps: int
    memory_segments: dict  # name -> Segment
    public_memory: list    # list[MemoryEntry]

    @classmethod
    def from_json(cls, obj_or_path) -> "AirPublicInput":
        obj = obj_or_path
        if isinstance(obj_or_path, (str, os.PathLike)):
            with open(obj_or_path) as f:
                obj = json.load(f)
        segments = {
            name: Segment(int(s["begin_addr"]), int(s["stop_ptr"]))
            for name, s in obj["memory_segments"].items()
        }
        public_memory = [
            MemoryEntry(int(e["address"]), _parse_hex(e["value"]))
            for e in obj["public_memory"]
        ]
        return cls(
            layout=Layout(obj["layout"]),
            rc_min=int(obj["rc_min"]),
            rc_max=int(obj["rc_max"]),
            n_steps=int(obj["n_steps"]),
            memory_segments=segments,
            public_memory=public_memory,
        )

    # helpers mirroring binary/src/lib.rs:300-338
    def initial_pc(self) -> int:
        return self.memory_segments["program"].begin_addr

    def final_pc(self) -> int:
        return self.memory_segments["program"].stop_ptr

    def initial_ap(self) -> int:
        return self.memory_segments["execution"].begin_addr

    def final_ap(self) -> int:
        return self.memory_segments["execution"].stop_ptr

    def public_memory_padding(self) -> MemoryEntry:
        """The address-1 entry is reused as padding (binary/src/lib.rs:332)."""
        for e in self.public_memory:
            if e.address == 1:
                return e
        raise ValueError("no public memory entry at address 1")


@dataclasses.dataclass
class AirPrivateInput:
    trace_path: str
    memory_path: str
    pedersen: list
    range_check: list
    ecdsa: list
    bitwise: list
    ec_op: list
    poseidon: list

    @classmethod
    def from_json(cls, obj_or_path, base_dir: Optional[str] = None) -> "AirPrivateInput":
        obj = obj_or_path
        if isinstance(obj_or_path, (str, os.PathLike)):
            base_dir = base_dir or os.path.dirname(os.path.abspath(obj_or_path))
            with open(obj_or_path) as f:
                obj = json.load(f)
        return cls(
            trace_path=obj.get("trace_path", ""),
            memory_path=obj.get("memory_path", ""),
            pedersen=obj.get("pedersen", []) or [],
            range_check=obj.get("range_check", []) or [],
            ecdsa=obj.get("ecdsa", []) or [],
            bitwise=obj.get("bitwise", []) or [],
            ec_op=obj.get("ec_op", []) or [],
            poseidon=obj.get("poseidon", []) or [],
        )


@dataclasses.dataclass
class CompiledProgram:
    data: list   # list[int] program words
    prime: int

    @classmethod
    def from_json(cls, obj_or_path) -> "CompiledProgram":
        obj = obj_or_path
        if isinstance(obj_or_path, (str, os.PathLike)):
            with open(obj_or_path) as f:
                obj = json.load(f)
        return cls(
            data=[_parse_hex(v) for v in obj["data"]],
            prime=_parse_hex(obj["prime"]),
        )

    def program_memory(self):
        """Word i -> address i+1 (address 0 is reserved; lib.rs:547-556)."""
        return [MemoryEntry(i + 1, v) for i, v in enumerate(self.data)]


@dataclasses.dataclass
class CairoWitness:
    """The prover's private input bundle (layouts/src/lib.rs:37-56)."""
    air_private_input: AirPrivateInput
    register_states: RegisterStates
    memory: Memory
