"""NTT round-trip + negacyclic convolution parity vs big-int oracle.

Mirrors the reference's Property 1 (NTT round-trip,
src/test-utils/ntt-round-trip.prop.test.ts) and Property 3 (polynomial
multiplication) with the correctness fix: the pointwise product must equal the
true negacyclic product (see ops/ntt.py docstring).
"""
import numpy as np
import pytest
import jax

from node_fhe_accelerate_tpu.ops.ntt import (
    NTTContext,
    find_primitive_2n_root,
    negacyclic_mul_np,
)
from node_fhe_accelerate_tpu.ops.u64 import u64_from_np, u64_to_np

# Degree -> prime table from the reference's executable spec
# (ntt-round-trip.prop.test.ts:30-43).  The spec's entries for degree >= 2048
# are COMPOSITE (see ops/primes.py); those rows use this build's corrected
# preset primes instead (same role: large-degree NTT moduli).
NTT_PRIMES = {
    8: 17,
    16: 97,
    32: 193,
    64: 257,
    128: 769,
    256: 7681,
    512: 12289,
    1024: (1 << 27) - (1 << 11) + 1,
    2048: (1 << 50) - (1 << 14) + 1,   # Q_50_1
    4096: (1 << 60) - (1 << 18) + 1,   # Q_60_1
}


def rand_poly(rng, n, q):
    return (rng.integers(0, 1 << 63, size=n, dtype=np.uint64) % np.uint64(q)).astype(
        np.uint64
    )


@pytest.mark.parametrize("n", [8, 64, 256, 1024])
def test_psi_properties(n):
    q = NTT_PRIMES[n]
    psi = find_primitive_2n_root(n, q)
    assert pow(psi, n, q) == q - 1
    assert pow(psi, 2 * n, q) == 1


@pytest.mark.parametrize("n", sorted(NTT_PRIMES))
def test_round_trip(n):
    q = NTT_PRIMES[n]
    ntt = NTTContext(n, q)
    rng = np.random.default_rng(n)
    a = rand_poly(rng, n, q)
    fwd = jax.jit(ntt.forward)
    inv = jax.jit(ntt.inverse)
    back = u64_to_np(inv(fwd(u64_from_np(a))))
    np.testing.assert_array_equal(back, a)


@pytest.mark.parametrize("n", [8, 32, 128, 1024])
def test_negacyclic_mul_matches_oracle(n):
    q = NTT_PRIMES[n]
    ntt = NTTContext(n, q)
    rng = np.random.default_rng(1000 + n)
    a = rand_poly(rng, n, q)
    b = rand_poly(rng, n, q)
    got = u64_to_np(jax.jit(ntt.negacyclic_mul)(u64_from_np(a), u64_from_np(b)))
    want = negacyclic_mul_np(a, b, q)
    np.testing.assert_array_equal(got, want)


def test_negacyclic_wraparound_sign():
    # X^(N-1) * X = X^N = -1 mod X^N+1
    n, q = 8, 17
    ntt = NTTContext(n, q)
    a = np.zeros(n, dtype=np.uint64)
    b = np.zeros(n, dtype=np.uint64)
    a[n - 1] = 1
    b[1] = 1
    got = u64_to_np(ntt.negacyclic_mul(u64_from_np(a), u64_from_np(b)))
    want = np.zeros(n, dtype=np.uint64)
    want[0] = q - 1
    np.testing.assert_array_equal(got, want)


def test_batched_transform():
    n, q = 64, 257
    ntt = NTTContext(n, q)
    rng = np.random.default_rng(7)
    batch = rand_poly(rng, 5 * n, q).reshape(5, n)
    fwd = jax.jit(ntt.forward)
    inv = jax.jit(ntt.inverse)
    back = u64_to_np(inv(fwd(u64_from_np(batch))))
    np.testing.assert_array_equal(back, batch)
    # Batched == per-row
    for i in range(5):
        row = u64_to_np(fwd(u64_from_np(batch[i])))
        full = u64_to_np(fwd(u64_from_np(batch)))[i]
        np.testing.assert_array_equal(row, full)


@pytest.mark.parametrize("n,q", [(1024, NTT_PRIMES[1024]), (2048, NTT_PRIMES[2048])])
def test_preset_moduli_solinas_path(n, q):
    """The preset moduli are Solinas primes — make sure that path is hit."""
    ntt = NTTContext(n, q)
    assert ntt.ctx.solinas is not None or ntt.ctx.fermat is not None
    rng = np.random.default_rng(42)
    a = rand_poly(rng, n, q)
    b = rand_poly(rng, n, q)
    got = u64_to_np(jax.jit(ntt.negacyclic_mul)(u64_from_np(a), u64_from_np(b)))
    want = negacyclic_mul_np(a, b, q)
    np.testing.assert_array_equal(got, want)


def test_montgomery_fallback_modulus():
    """A non-Solinas, non-Fermat NTT prime exercises the Montgomery path."""
    from node_fhe_accelerate_tpu.core.params import Primes

    n, q = 256, Primes.Q_40_2  # 2^19 | q-1, not Solinas form
    ntt = NTTContext(n, q)
    assert ntt.ctx.solinas is None and ntt.ctx.fermat is None
    rng = np.random.default_rng(9)
    a = rand_poly(rng, n, q)
    b = rand_poly(rng, n, q)
    got = u64_to_np(ntt.negacyclic_mul(u64_from_np(a), u64_from_np(b)))
    want = negacyclic_mul_np(a, b, q)
    np.testing.assert_array_equal(got, want)


def test_preset_moduli_are_valid():
    """Every preset's moduli must be prime and NTT-friendly for its degree
    (the reference's are not — ops/primes.py docstring)."""
    from node_fhe_accelerate_tpu.core.params import PRESETS
    from node_fhe_accelerate_tpu.ops.primes import is_ntt_friendly

    for name, fn in PRESETS.items():
        p = fn()
        for q in p.moduli:
            assert is_ntt_friendly(q, p.poly_degree), (name, q)


def test_composite_modulus_rejected():
    from node_fhe_accelerate_tpu.ops.primes import find_generator_2n

    with pytest.raises(ValueError, match="composite"):
        find_generator_2n(1024, 1099511627777)  # the reference's Q_40_1
