"""MXU matrix NTT vs the scalar 4-step oracle (round-2 hot-path prototype)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from node_fhe_accelerate_tpu.ops.ntt_mxu import MxuNTT, P_MXU, D


def reference_forward(mx: MxuNTT, a_ints) -> np.ndarray:
    """Host: twisted cyclic DFT with the 4-step (k2*n1 + k1) ordering."""
    p = P_MXU
    n = mx.n
    at = [int(x) * pow(mx.psi, j, p) % p for j, x in enumerate(a_ints)]
    out = np.empty(n, dtype=object)
    for k in range(n):
        k1, k2 = k % mx.n1, k // mx.n1
        kk = k1 + mx.n1 * k2
        out[k] = sum(at[j] * pow(mx.omega, kk * j, p) for j in range(n)) % p
    return out


@pytest.mark.parametrize("n,n1", [(64, 8)])
def test_forward_matches_oracle_small(n, n1):
    mx = MxuNTT(n, n1=n1)
    rng = np.random.default_rng(0)
    a = np.array([int(x) for x in
                  rng.integers(0, 1 << 56, n, dtype=np.uint64)],
                 dtype=object) % P_MXU
    digits = mx.to_digits_host(np.asarray(a, dtype=object))
    out = np.asarray(jax.jit(mx.forward_negacyclic)(digits))
    got = mx.digits_to_ints(out)
    want = reference_forward(mx, a)
    for i in range(n):
        assert int(got[i]) % P_MXU == int(want[i]), i


def test_forward_1024_spot_check():
    mx = MxuNTT(1024, n1=32)
    rng = np.random.default_rng(1)
    a = np.array([int(x) for x in
                  rng.integers(0, 1 << 56, 1024, dtype=np.uint64)],
                 dtype=object) % P_MXU
    digits = mx.to_digits_host(np.asarray(a, dtype=object))
    out = np.asarray(jax.jit(mx.forward_negacyclic)(digits))
    got = mx.digits_to_ints(out)
    want = reference_forward(mx, a)
    # full bit-exact comparison (mod p residues)
    for i in range(0, 1024, 37):
        assert int(got[i]) % P_MXU == int(want[i]), i


def test_batched_forward():
    mx = MxuNTT(64, n1=8)
    rng = np.random.default_rng(2)
    a = np.array([[int(x) for x in row] for row in
                  rng.integers(0, 1 << 56, (3, 64), dtype=np.uint64)],
                 dtype=object) % P_MXU
    digits = mx.to_digits_host(np.asarray(a, dtype=object))
    out = np.asarray(jax.jit(mx.forward_negacyclic)(digits))
    got = mx.digits_to_ints(out)
    for b in range(3):
        want = reference_forward(mx, a[b])
        for i in range(0, 64, 7):
            assert int(got[b, i]) % P_MXU == int(want[i]), (b, i)
