"""Property tests: uint32 limb-plane arithmetic vs Python big-int oracle.

Mirrors the reference's property-test strategy for modular arithmetic
(src/test-utils/modular-multiplication.prop.test.ts, cpp/tests/test_multi_limb.cpp).
"""
import numpy as np

from node_fhe_accelerate_tpu.ops import u64 as U


def rand_u64(rng, shape):
    return rng.integers(0, 1 << 64, size=shape, dtype=np.uint64)


def test_u64_roundtrip():
    rng = np.random.default_rng(0)
    a = rand_u64(rng, (128,))
    assert (U.u64_to_np(U.u64_from_np(a)) == a).all()


def test_add_sub_wraparound():
    rng = np.random.default_rng(1)
    a = rand_u64(rng, (256,))
    b = rand_u64(rng, (256,))
    got = U.u64_to_np(U.u64_add(U.u64_from_np(a), U.u64_from_np(b)))
    assert (got == a + b).all()  # numpy uint64 add wraps mod 2^64
    got = U.u64_to_np(U.u64_sub(U.u64_from_np(a), U.u64_from_np(b)))
    assert (got == a - b).all()


def test_compare():
    rng = np.random.default_rng(2)
    a = rand_u64(rng, (256,))
    b = rand_u64(rng, (256,))
    # include equal pairs
    b[:32] = a[:32]
    ap, bp = U.u64_from_np(a), U.u64_from_np(b)
    assert (np.asarray(U.u64_lt(ap, bp)) == (a < b)).all()
    assert (np.asarray(U.u64_eq(ap, bp)) == (a == b)).all()


def test_mul_wide_exact():
    rng = np.random.default_rng(3)
    a = rand_u64(rng, (512,))
    b = rand_u64(rng, (512,))
    wide = U.u64_mul_wide(U.u64_from_np(a), U.u64_from_np(b))
    got = U.u128_to_np(wide)
    want = a.astype(object) * b.astype(object)
    assert (got == want).all()


def test_mul_lo():
    rng = np.random.default_rng(4)
    a = rand_u64(rng, (256,))
    b = rand_u64(rng, (256,))
    got = U.u64_to_np(U.u64_mul_lo(U.u64_from_np(a), U.u64_from_np(b)))
    assert (got == a * b).all()


def test_shifts():
    rng = np.random.default_rng(5)
    a = rand_u64(rng, (64,))
    ap = U.u64_from_np(a)
    for k in (0, 1, 13, 31, 32, 33, 40, 63):
        assert (U.u64_to_np(U.u64_shl(ap, k)) == a << np.uint64(k)).all(), k
        assert (U.u64_to_np(U.u64_shr(ap, k)) == a >> np.uint64(k)).all(), k


def test_u128_shr():
    rng = np.random.default_rng(6)
    a = rand_u64(rng, (64,))
    b = rand_u64(rng, (64,))
    wide = U.u64_mul_wide(U.u64_from_np(a), U.u64_from_np(b))
    val = a.astype(object) * b.astype(object)
    for k in (0, 1, 40, 64, 100, 127):
        got = U.u128_to_np(U.u128_shr(wide, k))
        assert (got == val >> k).all(), k
