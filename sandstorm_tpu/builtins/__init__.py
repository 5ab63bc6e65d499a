"""Per-builtin witness generators (capability parity with the reference's
`builtins` crate, SURVEY.md §2.2): pedersen, range_check, ecdsa, bitwise,
ec_op, poseidon."""

from . import curve, pedersen, poseidon, range_check, bitwise, ecdsa, ec_op

__all__ = ["curve", "pedersen", "poseidon", "range_check", "bitwise",
           "ecdsa", "ec_op"]
