from .formats import (
    RegisterStates, Memory, CompiledProgram, AirPublicInput, AirPrivateInput,
    MemoryEntry, Segment, Layout, CairoWitness,
)
from .word import decode_words, FLAGS

__all__ = [
    "RegisterStates", "Memory", "CompiledProgram", "AirPublicInput",
    "AirPrivateInput", "MemoryEntry", "Segment", "Layout", "CairoWitness",
    "decode_words", "FLAGS",
]
