"""128-bit range-check builtin: split a value into 8 big-endian u16 parts.

Parity with /root/reference builtins/src/range_check/mod.rs:5-27
(InstanceTrace<NUM_PARTS> with value = sum part_i * 2^(16*(N-1-i))).
"""

import dataclasses

NUM_PARTS = 8


@dataclasses.dataclass
class InstanceTrace:
    index: int
    value: int
    parts: list  # NUM_PARTS u16 values, big-endian

    @classmethod
    def new(cls, index: int, value: int, num_parts: int = NUM_PARTS):
        assert 0 <= value < (1 << (16 * num_parts))
        parts = [(value >> (16 * (num_parts - 1 - i))) & 0xFFFF
                 for i in range(num_parts)]
        return cls(index=index, value=value, parts=parts)
