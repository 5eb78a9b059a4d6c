"""Native codec (C++ via ctypes) vs pure-Python/zlib oracles."""
import zlib

import numpy as np
import pytest

from node_fhe_accelerate_tpu import native


def test_native_builds():
    assert native.native_available(), "g++ toolchain should be present"


def test_crc32_matches_zlib():
    for data in [b"", b"a", b"hello world" * 100, bytes(range(256))]:
        assert native.crc32(data) == (zlib.crc32(data) & 0xFFFFFFFF)


@pytest.mark.parametrize("bits", [1, 7, 13, 32, 41, 63, 64])
def test_pack_unpack_round_trip(bits):
    rng = np.random.default_rng(bits)
    n = 257
    mask = np.uint64((1 << bits) - 1) if bits < 64 \
        else np.uint64(0xFFFFFFFFFFFFFFFF)
    words = rng.integers(0, 1 << 63, n, dtype=np.uint64) & mask
    packed = native.pack_words(words, bits)
    assert len(packed) == (n * bits + 7) // 8
    back = native.unpack_words(packed, n, bits)
    np.testing.assert_array_equal(back, words)


def test_pack_matches_python_fallback():
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 41, 64, dtype=np.uint64)
    bits = 41
    native_packed = native.pack_words(words, bits)
    # python oracle
    acc = 0
    for i, v in enumerate(words.tolist()):
        acc |= int(v) << (i * bits)
    want = acc.to_bytes((64 * bits + 7) // 8, "little")
    assert native_packed == want


def test_packing_saves_space():
    # 41-bit modulus coefficients: 1.56x smaller than raw u64
    words = np.ones(1024, dtype=np.uint64)
    assert len(native.pack_words(words, 41)) < 1024 * 8 * 0.66
