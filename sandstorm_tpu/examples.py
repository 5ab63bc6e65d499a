"""Loading cairo-run artifact bundles (the reference's example/ flow).

Mirrors the CLI input path (cli/src/main.rs:180-199): program JSON +
air-public-input JSON + air-private-input JSON -> witness arrays.
"""

import os

from .binary.formats import (
    RegisterStates, Memory, CompiledProgram, AirPublicInput, AirPrivateInput,
    CairoWitness,
)


def load_artifacts(program_path, public_input_path, private_input_path,
                   base_dir=None):
    program = CompiledProgram.from_json(program_path)
    pub = AirPublicInput.from_json(public_input_path)
    priv = AirPrivateInput.from_json(private_input_path)
    base = base_dir or os.path.dirname(os.path.abspath(private_input_path))

    def _resolve(p):
        if os.path.isabs(p) and os.path.exists(p):
            return p
        cand = os.path.join(base, os.path.basename(p))
        if os.path.exists(cand):
            return cand
        return os.path.join(base, p)

    registers = RegisterStates.from_file(_resolve(priv.trace_path))
    field_bytes = (program.prime.bit_length() + 7) // 8
    field_bytes = 32 if field_bytes > 8 else 8
    memory = Memory.from_file(_resolve(priv.memory_path), field_bytes)
    witness = CairoWitness(air_private_input=priv, register_states=registers,
                           memory=memory)
    return program, pub, witness
