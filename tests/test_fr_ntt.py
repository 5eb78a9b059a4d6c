"""Device Fr NTT vs host big-int Horner oracle."""
import numpy as np
import pytest
import jax.numpy as jnp

from node_fhe_accelerate_tpu.zk.field import bn254_fr
from node_fhe_accelerate_tpu.zk.fr_ntt import FrNtt


@pytest.fixture(scope="module")
def ctx():
    f = bn254_fr()
    return f, FrNtt(f, 16)


def _horner(coeffs, x, r):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % r
    return acc


def test_evaluate_matches_horner(ctx):
    f, ntt = ctx
    r = f.q
    rng = np.random.default_rng(0)
    coeffs = [int.from_bytes(rng.bytes(32), "little") % r for _ in range(16)]
    evals = ntt.evaluate(f.encode(coeffs))
    got = [int(v) for v in f.decode(evals)]
    want = [_horner(coeffs, x, r) for x in ntt.points]
    assert got == want


def test_interpolate_round_trip(ctx):
    f, ntt = ctx
    r = f.q
    rng = np.random.default_rng(1)
    coeffs = [int.from_bytes(rng.bytes(32), "little") % r for _ in range(16)]
    enc = f.encode(coeffs)
    back = ntt.interpolate(ntt.evaluate(enc))
    assert [int(v) for v in f.decode(back)] == coeffs


def test_negacyclic_mul_matches_oracle(ctx):
    f, ntt = ctx
    r = f.q
    rng = np.random.default_rng(2)
    a = [int.from_bytes(rng.bytes(32), "little") % r for _ in range(16)]
    b = [int.from_bytes(rng.bytes(32), "little") % r for _ in range(16)]
    got = [int(v) for v in f.decode(ntt.negacyclic_mul(f.encode(a),
                                                       f.encode(b)))]
    want = [0] * 16
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            k = i + j
            if k < 16:
                want[k] = (want[k] + x * y) % r
            else:
                want[k - 16] = (want[k - 16] - x * y) % r
    assert got == want


def test_vanishing_is_x_d_plus_1(ctx):
    """Every domain point is a root of x^d + 1."""
    f, ntt = ctx
    r = f.q
    for x in ntt.points:
        assert (pow(x, ntt.d, r) + 1) % r == 0
