"""Property tests: ModCtx vs Python big-int oracle, over every reference prime.

Reference prime table: cpp/src/parameter_set.cpp:22-42.
"""
import numpy as np
import pytest

from node_fhe_accelerate_tpu.ops.modular import ModCtx, solinas_form, fermat_form
from node_fhe_accelerate_tpu.ops.u64 import u64_from_np, u64_to_np

# NOTE: the reference's comments (parameter_set.cpp:22-42) mislabel these
# constants; the actual values are given here.  Q_40_1 = 2^40 + 1 is even
# composite (257 * 4278255361) — we still support it bit-exactly.
REFERENCE_MODULI = [
    1152921504606584833,  # Q_60_1 = 2^60 - 2^18 + 1  (Solinas)
    1152921504598720513,  # Q_60_2                    (generic -> Montgomery)
    1152921504597016577,  # Q_60_3                    (generic -> Montgomery)
    1125899906826241,     # Q_50_1 = 2^50 - 2^14 + 1  (Solinas)
    1125899906793473,     # Q_50_2                    (generic -> Montgomery)
    1099511627777,        # Q_40_1 = 2^40 + 1         (Fermat)
    1099511562241,        # Q_40_2 = 2^40 - 2^16 + 1  (Solinas)
    1073479681,           # Q_30_1 = 2^30 - 2^18 + 1  (Solinas)
    1073217537,           # Q_30_2                    (generic)
]
REFERENCE_PRIMES = REFERENCE_MODULI  # name kept for parametrize readability


def rand_mod(rng, q, shape):
    return (rng.integers(0, 1 << 63, size=shape, dtype=np.uint64)
            % np.uint64(q))


def test_strategies_detected():
    assert solinas_form(1152921504606584833) == (60, 18)
    assert solinas_form(1125899906826241) == (50, 14)
    assert solinas_form(1099511562241) == (40, 16)
    assert solinas_form(1073479681) == (30, 18)
    assert fermat_form(1099511627777) == 40
    assert solinas_form(1125899906793473) is None
    assert fermat_form(1125899906793473) is None


@pytest.mark.parametrize("q", REFERENCE_PRIMES + [(1 << 61) - 1])
def test_add_sub_neg(q):
    rng = np.random.default_rng(q % 9973)
    ctx = ModCtx(q)
    a = rand_mod(rng, q, (256,))
    b = rand_mod(rng, q, (256,))
    ap, bp = u64_from_np(a), u64_from_np(b)
    ao, bo = a.astype(object), b.astype(object)
    assert (u64_to_np(ctx.add(ap, bp)) == (ao + bo) % q).all()
    assert (u64_to_np(ctx.sub(ap, bp)) == (ao - bo) % q).all()
    assert (u64_to_np(ctx.neg(ap)) == (-ao) % q).all()


@pytest.mark.parametrize("q", REFERENCE_PRIMES + [(1 << 61) - 1])
def test_mul(q):
    rng = np.random.default_rng(q % 7919)
    ctx = ModCtx(q)
    a = rand_mod(rng, q, (512,))
    b = rand_mod(rng, q, (512,))
    # include edge values
    a[:4] = [0, 1, q - 1, q - 1]
    b[:4] = [q - 1, q - 1, q - 1, 1]
    got = u64_to_np(ctx.mul(u64_from_np(a), u64_from_np(b)))
    want = ((a.astype(object) * b.astype(object)) % q).astype(np.uint64)
    assert (got == want).all()


@pytest.mark.parametrize("q", REFERENCE_PRIMES)
def test_montgomery_roundtrip_and_mul(q):
    rng = np.random.default_rng(q % 104729)
    ctx = ModCtx(q)
    a = rand_mod(rng, q, (256,))
    b = rand_mod(rng, q, (256,))
    ap, bp = u64_from_np(a), u64_from_np(b)
    # to_mont/from_mont round trip
    assert (u64_to_np(ctx.from_mont(ctx.to_mont(ap))) == a).all()
    # mont_mul(aR, bR) = abR; from_mont gives ab
    got = u64_to_np(ctx.from_mont(ctx.mont_mul(ctx.to_mont(ap), ctx.to_mont(bp))))
    want = ((a.astype(object) * b.astype(object)) % q).astype(np.uint64)
    assert (got == want).all()
    # mont_mul with one plain operand: mont_mul(aR, b) = ab
    got2 = u64_to_np(ctx.mont_mul(ctx.to_mont(ap), bp))
    assert (got2 == want).all()
