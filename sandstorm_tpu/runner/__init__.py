from .vm import CairoVM, assemble_instruction

__all__ = ["CairoVM", "assemble_instruction"]
