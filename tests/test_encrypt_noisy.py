"""Noisy BFV round trips at realistic parameters — the BASELINE.md parity
target the reference itself cannot meet (its multiply never rescales, its
preset noise rounds to zero; encryption.cpp:737-799, key_manager.cpp:85-110).

Real gaussian noise (sigma = 3.2e-11 * q ~ 35) + N=1024 + 40-bit NTT prime:
encrypt -> add/mul_rescale/relin -> decrypt must recover messages mod t.
"""
import numpy as np
import pytest
import jax

from node_fhe_accelerate_tpu.core.params import (
    ParameterSet, FHEScheme, Primes,
)
from node_fhe_accelerate_tpu.core.keys import KeyManager
from node_fhe_accelerate_tpu.core.encrypt import EncryptionEngine


@pytest.fixture(scope="module")
def noisy_setup():
    params = ParameterSet(
        scheme=FHEScheme.TFHE, poly_degree=1024, moduli=[Primes.Q_40_1],
        lwe_dimension=742, lwe_noise_std=3.2e-11, glwe_dimension=1,
        decomp_base_log=20, decomp_level=2, plaintext_modulus=16,
    )
    eng = EncryptionEngine(params)          # REAL noise (~35 absolute)
    km = KeyManager(params, eng.ring)
    assert eng._noise_std > 3.0             # the fix under test
    key = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk = jax.random.split(key, 3)
    sk = km.generate_secret_key(k_sk)
    pk = km.generate_public_key(k_pk, sk)
    rlk = km.generate_relin_key(k_rlk, sk)
    return params, eng, sk, pk, rlk


def test_noisy_round_trip_and_budget(noisy_setup):
    params, eng, sk, pk, rlk = noisy_setup
    key = jax.random.PRNGKey(1)
    for i, m in enumerate([0, 1, 7, 15]):
        ct = eng.encrypt(jax.random.fold_in(key, i), m, pk)
        vals, budget = eng.decrypt(ct, sk)
        assert vals[0] == m
        assert 0 < budget < eng.initial_noise_budget + 1


def test_noisy_homomorphic_add(noisy_setup):
    params, eng, sk, pk, rlk = noisy_setup
    t = eng.t
    key = jax.random.PRNGKey(2)
    a, b = 9, 13
    ca = eng.encrypt(jax.random.fold_in(key, 0), a, pk)
    cb = eng.encrypt(jax.random.fold_in(key, 1), b, pk)
    assert eng.decrypt(eng.add(ca, cb), sk)[0][0] == (a + b) % t


def test_noisy_multiply_rescale_relin_decrypt(noisy_setup):
    """encrypt -> tensor multiply -> t/q rescale -> relinearize -> decrypt
    round-trips WITH noise: the real BFV composition."""
    params, eng, sk, pk, rlk = noisy_setup
    t = eng.t
    key = jax.random.PRNGKey(3)
    for i, (m1, m2) in enumerate([(3, 5), (7, 9), (15, 15), (0, 11)]):
        c1 = eng.encrypt(jax.random.fold_in(key, 2 * i), m1, pk)
        c2 = eng.encrypt(jax.random.fold_in(key, 2 * i + 1), m2, pk)
        prod = eng.multiply_relin_rescale(c1, c2, rlk)
        assert not prod.is_degree_2
        vals, budget = eng.decrypt(prod, sk)
        assert vals[0] == (m1 * m2) % t, (m1, m2, vals[0])
        assert budget > 0


def test_noisy_packed_multiply(noisy_setup):
    """Slot 0 products survive for packed ciphertexts too (polynomial
    product cross-terms land in higher slots)."""
    params, eng, sk, pk, rlk = noisy_setup
    t = eng.t
    c1 = eng.encrypt(jax.random.PRNGKey(7), 3, pk)
    c2 = eng.encrypt(jax.random.PRNGKey(8), 4, pk)
    prod = eng.multiply_rescale(c1, c2)     # degree-2 decrypt path
    vals, _ = eng.decrypt(prod, sk)
    assert vals[0] == 12 % t
