"""Multi-limb field arithmetic vs Python big-int oracle (reference
zk_field_arithmetic tests, cpp/tests/test_multi_limb.cpp analog)."""
import numpy as np
import pytest
import jax

from node_fhe_accelerate_tpu.ops import limbs as lb
from node_fhe_accelerate_tpu.zk.field import (
    Field, bn254_fq, bn254_fr, bls12_381_fq, BN254_FQ, BN254_FR, BLS12_381_FQ,
)


def rand_ints(rng, q, n):
    return [int.from_bytes(rng.bytes(48), "little") % q for _ in range(n)]


@pytest.mark.parametrize("fld_fn,q", [
    (bn254_fq, BN254_FQ), (bn254_fr, BN254_FR), (bls12_381_fq, BLS12_381_FQ),
])
def test_field_ops_match_oracle(fld_fn, q):
    f = fld_fn()
    rng = np.random.default_rng(0)
    a_int = rand_ints(rng, q, 16)
    b_int = rand_ints(rng, q, 16)
    a = f.encode(a_int)
    b = f.encode(b_int)

    got_add = f.decode(f.add(a, b))
    got_sub = f.decode(f.sub(a, b))
    got_mul = f.decode(jax.jit(f.mul)(a, b))
    got_neg = f.decode(f.neg(a))
    for i in range(16):
        assert int(got_add[i]) == (a_int[i] + b_int[i]) % q
        assert int(got_sub[i]) == (a_int[i] - b_int[i]) % q
        assert int(got_mul[i]) == a_int[i] * b_int[i] % q
        assert int(got_neg[i]) == (-a_int[i]) % q


def test_mont_round_trip():
    f = bn254_fr()
    x = 123456789123456789123456789
    enc = f.encode([x])
    assert int(f.decode(enc)[0]) == x


def test_inverse():
    f = bn254_fr()
    rng = np.random.default_rng(1)
    vals = rand_ints(rng, f.q, 4)
    a = f.encode(vals)
    inv = jax.jit(f.inv)(a)
    prod = f.decode(f.mul(a, inv))
    for p in prod:
        assert int(p) == 1


def test_pow_and_sqrt():
    f = bn254_fq()  # q = 3 mod 4
    assert f.q % 4 == 3
    x = 12345
    sq = f.encode([x * x % f.q])
    r = int(f.decode(f.sqrt(sq))[0])
    assert r == x or r == f.q - x


def test_edge_values():
    f = bn254_fr()
    q = f.q
    edge = [0, 1, q - 1, q - 2, q // 2]
    a = f.encode(edge)
    b = f.encode(list(reversed(edge)))
    got = f.decode(f.mul(a, b))
    for i, (x, y) in enumerate(zip(edge, reversed(edge))):
        assert int(got[i]) == x * y % q
    assert bool(np.asarray(f.is_zero(f.encode([0, 1])))[0])
    assert not bool(np.asarray(f.is_zero(f.encode([0, 1])))[1])
