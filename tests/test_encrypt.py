"""Encrypt -> homomorphic ops -> decrypt round trips.

Mirrors the reference's Property 2 (encryption round-trip,
encryption-round-trip.prop.test.ts), Property 6/7 (homomorphic add/mul) in
an explicit zero-noise test mode so every chain is bit-exact (the phase
algebra itself is what is under test).  Real-noise round trips live in
test_encrypt_noisy.py.
"""
import numpy as np
import pytest
import jax

from node_fhe_accelerate_tpu.core.params import ParameterSet, FHEScheme
from node_fhe_accelerate_tpu.core.poly import PolyRing
from node_fhe_accelerate_tpu.core.keys import KeyManager
from node_fhe_accelerate_tpu.core.encrypt import EncryptionEngine
from node_fhe_accelerate_tpu.ops.u64 import u64_to_np


def small_params(t=16):
    """Small NTT-valid parameter set for fast tests: N=256, q=7681."""
    return ParameterSet(
        scheme=FHEScheme.TFHE, poly_degree=256, moduli=[7681],
        lwe_dimension=64, lwe_noise_std=3.2e-11, glwe_dimension=1,
        # base_log * level must cover all 13 bits of q for exact relin
        decomp_base_log=7, decomp_level=2, plaintext_modulus=t,
    )


@pytest.fixture(scope="module")
def setup():
    # Explicit zero-noise override: these are EXACTNESS tests (phase algebra
    # must be bit-exact).  Noisy round-trips are covered by
    # test_encrypt_noisy.py at realistic parameters.
    params = small_params()
    eng = EncryptionEngine(params, noise_std=0.0)
    km = KeyManager(params, eng.ring, noise_std=0.0)
    key = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk = jax.random.split(key, 3)
    sk = km.generate_secret_key(k_sk)
    pk = km.generate_public_key(k_pk, sk)
    rlk = km.generate_relin_key(k_rlk, sk)
    return params, eng, sk, pk, rlk


def test_encrypt_decrypt_round_trip(setup):
    params, eng, sk, pk, rlk = setup
    key = jax.random.PRNGKey(42)
    for i, m in enumerate([0, 1, 7, 15]):
        ct = eng.encrypt(jax.random.fold_in(key, i), m, pk)
        vals, budget = eng.decrypt(ct, sk)
        assert vals[0] == m
        assert budget > 0


def test_encrypt_symmetric_round_trip(setup):
    params, eng, sk, pk, rlk = setup
    ct = eng.encrypt_symmetric(jax.random.PRNGKey(1), 9, sk)
    vals, _ = eng.decrypt(ct, sk)
    assert vals[0] == 9


def test_packed_round_trip(setup):
    params, eng, sk, pk, rlk = setup
    msgs = np.arange(16, dtype=np.uint64) % 16
    ct = eng.encrypt(jax.random.PRNGKey(2), msgs, pk)
    vals, _ = eng.decrypt(ct, sk, num_values=16)
    np.testing.assert_array_equal(vals, msgs)


def test_homomorphic_add_sub_negate(setup):
    params, eng, sk, pk, rlk = setup
    t = eng.t
    key = jax.random.PRNGKey(3)
    a, b = 11, 7
    ca = eng.encrypt(jax.random.fold_in(key, 0), a, pk)
    cb = eng.encrypt(jax.random.fold_in(key, 1), b, pk)
    assert eng.decrypt(eng.add(ca, cb), sk)[0][0] == (a + b) % t
    assert eng.decrypt(eng.sub(ca, cb), sk)[0][0] == (a - b) % t
    assert eng.decrypt(eng.negate(ca), sk)[0][0] == (-a) % t
    assert eng.decrypt(eng.add_plain(ca, 3), sk)[0][0] == (a + 3) % t


def test_multiply_plain_and_scalar(setup):
    params, eng, sk, pk, rlk = setup
    t = eng.t
    a = 5
    ca = eng.encrypt(jax.random.PRNGKey(4), a, pk)
    assert eng.decrypt(eng.multiply_plain(ca, 3), sk)[0][0] == (a * 3) % t
    assert eng.decrypt(eng.multiply_scalar(ca, 2), sk)[0][0] == (a * 2) % t


def test_tensor_multiply_relin_exact_phase(setup):
    """With zero noise the whole multiply+relin chain must be exact:
    phase(relin(ct1*ct2)) == Delta^2 * m1 * m2 (mod q) as a polynomial."""
    params, eng, sk, pk, rlk = setup
    q, delta = eng.q, eng.delta
    m1, m2 = 3, 5
    c1 = eng.encrypt(jax.random.PRNGKey(5), m1, pk)
    c2 = eng.encrypt(jax.random.PRNGKey(6), m2, pk)

    prod = eng.multiply_raw(c1, c2)
    ph2 = u64_to_np(eng.phase(prod, sk))
    expected = np.zeros(eng.ring.n, dtype=np.uint64)
    expected[0] = (delta * m1 * delta * m2) % q
    np.testing.assert_array_equal(ph2, expected)

    rel = eng.relinearize(prod, rlk)
    assert not rel.is_degree_2
    ph1 = u64_to_np(eng.phase(rel, sk))
    np.testing.assert_array_equal(ph1, expected)


def test_batch_add_tree(setup):
    params, eng, sk, pk, rlk = setup
    t = eng.t
    key = jax.random.PRNGKey(7)
    msgs = [int(x) for x in np.random.default_rng(0).integers(0, t, 9)]
    cts = [eng.encrypt(jax.random.fold_in(key, i), m, pk)
           for i, m in enumerate(msgs)]
    total = eng.batch_add(cts)
    assert eng.decrypt(total, sk)[0][0] == sum(msgs) % t


def test_jitted_encrypt_pipeline(setup):
    """The encrypt path is jittable end-to-end (pytree ciphertexts)."""
    params, eng, sk, pk, rlk = setup

    @jax.jit
    def pipeline(key):
        ca = eng.encrypt(jax.random.fold_in(key, 0), 4, pk)
        cb = eng.encrypt(jax.random.fold_in(key, 1), 9, pk)
        return eng.add(ca, cb)

    ct = pipeline(jax.random.PRNGKey(8))
    assert eng.decrypt(ct, sk)[0][0] == 13 % eng.t
