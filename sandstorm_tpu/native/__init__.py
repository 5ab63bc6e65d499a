"""Native (C++) host-side kernels.

The TPU owns the compute path (NTT, constraint evaluation, byte-hash
commitments); these native pieces cover the host-side hot spots the
reference also runs on CPU — chiefly batched Pedersen hashing for the
FriendlyMerkleTree's algebraic layers (crypto/src/hash/pedersen.rs,
crypto/src/merkle/mod.rs:28-42).

The extension compiles on demand with g++ into build/ next to this file
and loads via ctypes; callers must handle ImportError/OSError and fall
back to the pure-python implementations.
"""

import ctypes
import functools
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pedersen.cpp")
_SO = os.path.join(_DIR, "build", "libsandstorm_pedersen.so")


def _build():
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-march=native",
         "-o", _SO, _SRC],
        check=True, capture_output=True)


def _int_to_limbs(v: int) -> np.ndarray:
    return np.frombuffer(int(v).to_bytes(32, "little"), dtype="<u8").copy()


@functools.lru_cache(maxsize=1)
def _window_tables() -> tuple:
    """Precompute the 8-bit window tables (Montgomery limb arrays).

    Window w of scalar s contributes value v = bits [8w, 8w+8):
      w < 31: v * 2^(8w) * P_low   (the 248 low bits ride the P1/P3 chain)
      w = 31: v * P_high           (bits 248-251 ride P2/P4)
    exactly the split of the reference's pedersen subset-sum
    (builtins/src/pedersen/mod.rs:63-176).
    """
    from ..builtins.curve import P as MOD, ec_add, ec_mul
    from ..builtins.pedersen import shift_and_table_points
    p0, p1, p2, p3, p4 = shift_and_table_points()
    R = 1 << 256

    def mont(v):
        return _int_to_limbs(v * R % MOD)

    table = np.zeros((2, 32, 256, 8), dtype="<u8")
    for scalar, (lo, hi) in enumerate(((p1, p2), (p3, p4))):
        for w in range(32):
            base = ec_mul(1 << (8 * w), lo) if w < 31 else hi
            acc = None
            for v in range(1, 256):
                acc = base if acc is None else ec_add(acc, base)
                table[scalar, w, v, :4] = mont(acc[0])
                table[scalar, w, v, 4:] = mont(acc[1])
    shift = np.concatenate([mont(p0[0]), mont(p0[1])])
    return table, shift


@functools.lru_cache(maxsize=1)
def _lib():
    _build()
    lib = ctypes.CDLL(_SO)
    lib.pedersen_set_table.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
    lib.pedersen_hash_pairs.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t]
    lib.pedersen_hash_pairs.restype = ctypes.c_int
    table, shift = _window_tables()
    tflat = np.ascontiguousarray(table.reshape(-1))
    sflat = np.ascontiguousarray(shift)
    lib.pedersen_set_table(
        tflat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        sflat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    lib._table_keepalive = (tflat, sflat)
    return lib


def pedersen_hash_pairs(a_limbs: np.ndarray, b_limbs: np.ndarray) -> np.ndarray:
    """Batched pedersen_hash: [k, 4] canonical LE u64 limb arrays -> [k, 4]."""
    lib = _lib()
    a = np.ascontiguousarray(a_limbs, dtype="<u8")
    b = np.ascontiguousarray(b_limbs, dtype="<u8")
    k = a.shape[0]
    out = np.empty((k, 4), dtype="<u8")
    rc = lib.pedersen_hash_pairs(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), k)
    assert rc == 0
    return out


def pedersen_hash_pairs_ints(a_ints, b_ints):
    """Convenience: lists of python ints -> list of python ints."""
    a = np.stack([_int_to_limbs(v) for v in a_ints])
    b = np.stack([_int_to_limbs(v) for v in b_ints])
    out = pedersen_hash_pairs(a, b)
    return [int.from_bytes(row.tobytes(), "little") for row in out]


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


# -- ECDSA builtin witness batch (ecdsa.cpp) --------------------------------

_ECDSA_SRC = os.path.join(_DIR, "ecdsa.cpp")
_ECDSA_SO = os.path.join(_DIR, "build", "libsandstorm_ecdsa.so")
ECDSA_OUT_FELTS = 6160  # per-instance output felts (layout in ecdsa.cpp)


def _build_ecdsa():
    os.makedirs(os.path.dirname(_ECDSA_SO), exist_ok=True)
    hdr = os.path.join(_DIR, "fe252.h")
    src_mtime = max(os.path.getmtime(_ECDSA_SRC), os.path.getmtime(hdr))
    if os.path.exists(_ECDSA_SO) and os.path.getmtime(_ECDSA_SO) >= src_mtime:
        return
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-march=native",
         "-o", _ECDSA_SO, _ECDSA_SRC],
        check=True, capture_output=True)


@functools.lru_cache(maxsize=1)
def _ecdsa_lib():
    _build_ecdsa()
    lib = ctypes.CDLL(_ECDSA_SO)
    lib.ecdsa_set_params.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
    lib.ecdsa_witness_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int), ctypes.c_size_t]
    lib.ecdsa_witness_batch.restype = ctypes.c_int
    from ..builtins.curve import GENERATOR
    from ..builtins.pedersen import shift_and_table_points
    shift = shift_and_table_points()[0]
    shift_xy = np.concatenate([_int_to_limbs(shift[0]),
                               _int_to_limbs(shift[1])])
    gen_xy = np.concatenate([_int_to_limbs(GENERATOR[0]),
                             _int_to_limbs(GENERATOR[1])])
    lib.ecdsa_set_params(
        shift_xy.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        gen_xy.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return lib


def ecdsa_witness_batch(msg, r, w, pubx, puby):
    """Batched ECDSA builtin witness (see ecdsa.cpp for the layout).

    Args are length-k lists of python ints.  Returns (out, status):
    out [k, ECDSA_OUT_FELTS, 4] canonical LE u64 limbs, status [k] int32
    (0 ok, 1 AIR-invalid mimic, 2 r mismatch, 3 degenerate point).
    """
    lib = _ecdsa_lib()
    k = len(msg)

    def pack(vals):
        return np.ascontiguousarray(np.stack([_int_to_limbs(v)
                                              for v in vals]))
    m_a, r_a, w_a = pack(msg), pack(r), pack(w)
    px_a, py_a = pack(pubx), pack(puby)
    out = np.empty((k, ECDSA_OUT_FELTS, 4), dtype="<u8")
    status = np.empty(k, dtype=np.int32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    rc = lib.ecdsa_witness_batch(
        m_a.ctypes.data_as(u64p), r_a.ctypes.data_as(u64p),
        w_a.ctypes.data_as(u64p), px_a.ctypes.data_as(u64p),
        py_a.ctypes.data_as(u64p), out.ctypes.data_as(u64p),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), k)
    assert rc == 0
    return out, status


def ecdsa_available() -> bool:
    try:
        _ecdsa_lib()
        return True
    except Exception:
        return False


PEDERSEN_WITNESS_OUT_FELTS = 1538  # per-instance felts (layout in ecdsa.cpp)


@functools.lru_cache(maxsize=1)
def _pedersen_witness_lib():
    """The ecdsa lib with the pedersen doubling chains loaded."""
    lib = _ecdsa_lib()
    lib.pedersen_set_chains.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
    lib.pedersen_witness_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int),
        ctypes.c_size_t]
    lib.pedersen_witness_batch.restype = ctypes.c_int
    from ..builtins.pedersen import _chain
    chains = []
    for which in range(2):
        pts = _chain(which)
        arr = np.empty((252, 8), dtype="<u8")
        for i, (x, y) in enumerate(pts):
            arr[i, :4] = _int_to_limbs(x)
            arr[i, 4:] = _int_to_limbs(y)
        chains.append(np.ascontiguousarray(arr.reshape(-1)))
    lib.pedersen_set_chains(
        chains[0].ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        chains[1].ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return lib


def pedersen_witness_batch(a_vals, b_vals):
    """Batched pedersen builtin witness (layout in ecdsa.cpp).

    Returns (out [k, PEDERSEN_WITNESS_OUT_FELTS, 4], status [k])."""
    lib = _pedersen_witness_lib()
    k = len(a_vals)
    a = np.ascontiguousarray(np.stack([_int_to_limbs(v) for v in a_vals]))
    b = np.ascontiguousarray(np.stack([_int_to_limbs(v) for v in b_vals]))
    out = np.empty((k, PEDERSEN_WITNESS_OUT_FELTS, 4), dtype="<u8")
    status = np.empty(k, dtype=np.int32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    rc = lib.pedersen_witness_batch(
        a.ctypes.data_as(u64p), b.ctypes.data_as(u64p),
        out.ctypes.data_as(u64p),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), k)
    assert rc == 0
    return out, status


EC_OP_OUT_FELTS = 2306  # per-instance output felts (layout in ecdsa.cpp)


def ec_op_witness_batch(px, py, qx, qy, m):
    """Batched EC-op builtin witness: r = p + m*q (see ecdsa.cpp).

    Args are length-k lists of python ints.  Returns (out, status):
    out [k, EC_OP_OUT_FELTS, 4] canonical LE u64 limbs, status [k] int32.
    """
    lib = _ecdsa_lib()
    lib.ec_op_witness_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int), ctypes.c_size_t]
    lib.ec_op_witness_batch.restype = ctypes.c_int
    k = len(m)

    def pack(vals):
        return np.ascontiguousarray(np.stack([_int_to_limbs(v)
                                              for v in vals]))
    arrs = [pack(v) for v in (px, py, qx, qy, m)]
    out = np.empty((k, EC_OP_OUT_FELTS, 4), dtype="<u8")
    status = np.empty(k, dtype=np.int32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    rc = lib.ec_op_witness_batch(
        *[a.ctypes.data_as(u64p) for a in arrs], out.ctypes.data_as(u64p),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), k)
    assert rc == 0
    return out, status
