"""Emit a tiny cairo-run artifact bundle (trace.bin / memory.bin / program
JSON / AIR input JSONs) from the built-in mini VM, for driving the CLI
end-to-end without a cairo-lang toolchain.

Usage: python tools/make_tiny_artifacts.py OUTDIR [num_cycles] [field]

field: fp252 (default) or goldilocks — the goldilocks bundle exercises the
reference's experimental fast-field dispatch (8-byte memory values,
Fq3-extension challenges via cli._field_for_prime).
"""

import json
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sandstorm_tpu.binary.formats import Layout  # noqa: E402
from sandstorm_tpu.fields.fp252 import Fp252  # noqa: E402
from sandstorm_tpu.runner.vm import (CairoVM, instr_assert_eq_imm,  # noqa: E402
                                     instr_jmp_rel_imm)


def main():
    outdir = sys.argv[1]
    num_cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    field = sys.argv[3] if len(sys.argv) > 3 else "fp252"
    os.makedirs(outdir, exist_ok=True)
    if field == "goldilocks":
        from sandstorm_tpu.fields.goldilocks import GL
        p = GL.MODULUS
    else:
        p = Fp252.MODULUS
    field_bytes = 32 if p.bit_length() > 64 else 8

    words = [instr_assert_eq_imm(), 10, instr_jmp_rel_imm(), 0]
    vm = CairoVM(words, p)
    trace, mem = vm.run(num_cycles, initial_ap=6, extra_memory={5: 0})
    pub = vm.build_public_input(trace, mem, layout=Layout.PLAIN)

    with open(os.path.join(outdir, "trace.bin"), "wb") as f:
        for (ap, fp, pc) in trace:
            f.write(struct.pack("<QQQ", ap, fp, pc))
    with open(os.path.join(outdir, "memory.bin"), "wb") as f:
        for addr in sorted(mem):
            f.write(struct.pack("<Q", addr))
            f.write(int(mem[addr]).to_bytes(field_bytes, "little"))
    with open(os.path.join(outdir, "program.json"), "w") as f:
        json.dump({"data": [hex(w) for w in words], "prime": hex(p)}, f)
    with open(os.path.join(outdir, "air-public-input.json"), "w") as f:
        json.dump({
            "layout": pub.layout.value,
            "rc_min": pub.rc_min, "rc_max": pub.rc_max,
            "n_steps": pub.n_steps,
            "memory_segments": {
                name: {"begin_addr": s.begin_addr, "stop_ptr": s.stop_ptr}
                for name, s in pub.memory_segments.items()},
            "public_memory": [
                {"address": e.address, "value": hex(e.value), "page": 0}
                for e in pub.public_memory],
        }, f, indent=1)
    with open(os.path.join(outdir, "air-private-input.json"), "w") as f:
        json.dump({
            "trace_path": os.path.join(outdir, "trace.bin"),
            "memory_path": os.path.join(outdir, "memory.bin"),
            "pedersen": [], "range_check": [], "ecdsa": [],
            "bitwise": [], "ec_op": [], "poseidon": [],
        }, f, indent=1)
    print(f"wrote tiny artifact bundle ({num_cycles} cycles) to {outdir}")


if __name__ == "__main__":
    main()
