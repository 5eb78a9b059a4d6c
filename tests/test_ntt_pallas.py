"""Fused Pallas NTT kernel (ops/ntt_pallas.py) — bit-exactness vs the XLA
NTTContext path, in interpret mode on the CPU test backend (compiled on
real TPU; same code path, same exact limb-plane Montgomery algebra)."""
import numpy as np
import pytest
import jax

from node_fhe_accelerate_tpu.ops.ntt import NTTContext, negacyclic_mul_np
from node_fhe_accelerate_tpu.ops.ntt_pallas import PallasNTT
from node_fhe_accelerate_tpu.ops.u64 import u64_from_np, u64_to_np
from node_fhe_accelerate_tpu.core.params import Primes


@pytest.fixture(scope="module")
def setup():
    n, q = 256, Primes.Q_40_1
    ntt = NTTContext(n, q)
    pk = PallasNTT(ntt, rows=8, interpret=True)
    rng = np.random.default_rng(0)
    a = rng.integers(0, q, (8, n), dtype=np.uint64)
    b = rng.integers(0, q, (8, n), dtype=np.uint64)
    return ntt, pk, a, b


def test_forward_bit_exact(setup):
    ntt, pk, a, b = setup
    want = ntt.forward(u64_from_np(a))
    got = pk.forward(u64_from_np(a))
    np.testing.assert_array_equal(u64_to_np(got), u64_to_np(want))


def test_inverse_bit_exact(setup):
    ntt, pk, a, b = setup
    fa = ntt.forward(u64_from_np(a))
    want = ntt.inverse(fa)
    got = pk.inverse(fa)
    np.testing.assert_array_equal(u64_to_np(got), u64_to_np(want))


def test_fused_negacyclic_mul_matches_oracle(setup):
    ntt, pk, a, b = setup
    got = u64_to_np(pk.negacyclic_mul(u64_from_np(a), u64_from_np(b)))
    for i in range(a.shape[0]):
        want = negacyclic_mul_np(a[i], b[i], ntt.q)
        np.testing.assert_array_equal(got[i], want)


def test_ragged_batch_tiling(setup):
    """Batch not divisible by the default tile: _tile_rows picks a valid
    power-of-two height (B=24 -> 8)."""
    ntt, _, a, _ = setup
    pk = PallasNTT(ntt, rows=16, interpret=True)
    rng = np.random.default_rng(3)
    c = rng.integers(0, ntt.q, (24, ntt.n), dtype=np.uint64)
    want = ntt.forward(u64_from_np(c))
    got = pk.forward(u64_from_np(c))
    np.testing.assert_array_equal(u64_to_np(got), u64_to_np(want))
