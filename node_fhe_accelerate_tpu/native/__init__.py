"""Native host-side codec (C++ via ctypes) with numpy fallback.

Builds codec.cpp with g++ on first use (cached next to the source); if the
toolchain is unavailable the pure-numpy implementations are used — results
are bit-identical (tests/test_native.py asserts parity).

Buffers passed to the native packer carry 8 bytes of slack: the C fast path
writes/reads whole u64 windows (see codec.cpp); the wrappers here own that
contract so callers never see it.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["crc32", "pack_words", "unpack_words", "native_available"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "codec.cpp")
_SO = os.path.join(_DIR, "_codec.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO)
        lib.nfa_crc32.restype = ctypes.c_uint32
        lib.nfa_crc32.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.c_uint32]
        lib.nfa_pack_words.restype = ctypes.c_size_t
        lib.nfa_pack_words.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t,
            ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint8)]
        lib.nfa_unpack_words.restype = None
        lib.nfa_unpack_words.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint64)]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def native_available() -> bool:
    return bool(_load())


def crc32(data: bytes, seed: int = 0) -> int:
    lib = _load()
    if lib:
        return int(lib.nfa_crc32(data, len(data), seed))
    import zlib
    return zlib.crc32(data, seed) & 0xFFFFFFFF


def pack_words(words: np.ndarray, bits: int) -> bytes:
    """Pack u64 words to `bits` bits each, little-endian bit order."""
    w = np.ascontiguousarray(words, dtype=np.uint64)
    n = w.size
    out_len = (n * bits + 7) // 8
    lib = _load()
    if lib:
        buf = (ctypes.c_uint8 * (out_len + 8))()
        lib.nfa_pack_words(
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n, bits, buf)
        return bytes(buf[:out_len])
    # numpy fallback: via per-word bit placement with Python ints
    acc = 0
    for i, v in enumerate(w.tolist()):
        acc |= (int(v) & ((1 << bits) - 1)) << (i * bits)
    return acc.to_bytes(out_len, "little")


def unpack_words(data: bytes, n: int, bits: int) -> np.ndarray:
    lib = _load()
    if lib:
        padded = (ctypes.c_uint8 * (len(data) + 8)).from_buffer_copy(
            data + b"\0" * 8)
        out = np.empty(n, dtype=np.uint64)
        lib.nfa_unpack_words(
            padded, n, bits,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        return out
    acc = int.from_bytes(data, "little")
    mask = (1 << bits) - 1
    return np.array([(acc >> (i * bits)) & mask for i in range(n)],
                    dtype=np.uint64)
