"""RNS multi-modulus ring + BFV engine tests.

Covers the reference's RNS-readiness (polynomial_ring.h:504-508,
parameter_set.cpp:193-259 moduli chains) with REAL multi-prime compute:
CRT round trips, noisy encrypt -> add/mul/relinearize -> decrypt over
Q = q1*q2*q3, cross-checks against host big-int oracles, threshold
decryption and serialization through the FHEEngine API.
"""
import math

import numpy as np
import pytest
import jax

from node_fhe_accelerate_tpu.ops.primes import find_ntt_prime
from node_fhe_accelerate_tpu.core.params import ParameterSet, FHEScheme
from node_fhe_accelerate_tpu.core.rns import RnsPolyRing, RnsEncryptionEngine
from node_fhe_accelerate_tpu.core.encrypt import EncryptionEngine

N = 64
Q1 = find_ntt_prime(30, N)
Q2 = find_ntt_prime(30, N, below=Q1)
Q3 = find_ntt_prime(29, N)
MODULI = [Q1, Q2, Q3]


def rns_params(t=64, moduli=None):
    return ParameterSet(
        scheme=FHEScheme.BFV, poly_degree=N, moduli=moduli or MODULI,
        lwe_dimension=16, lwe_noise_std=3.2e-11, glwe_dimension=1,
        decomp_base_log=8, decomp_level=4, plaintext_modulus=t,
    )


@pytest.fixture(scope="module")
def eng_keys():
    eng = RnsEncryptionEngine(rns_params())
    ks = eng.keyset
    sk = ks.generate_secret_key(jax.random.PRNGKey(0))
    pk = ks.generate_public_key(jax.random.PRNGKey(1), sk)
    rk = ks.generate_relin_key(jax.random.PRNGKey(2), sk)
    return eng, sk, pk, rk


class TestRnsRing:
    def test_crt_round_trip(self):
        ring = RnsPolyRing(N, MODULI)
        rng = np.random.default_rng(0)
        coeffs = np.array([int(rng.integers(0, 1 << 62)) *
                           int(rng.integers(0, 1 << 27)) % ring.Q
                           for _ in range(N)], dtype=object)
        back = ring.to_int_coeffs(ring.from_int_coeffs(coeffs))
        assert np.array_equal(back, coeffs)

    def test_multiply_matches_bigint_oracle(self):
        ring = RnsPolyRing(N, MODULI)
        rng = np.random.default_rng(1)
        a = np.array([int(x) for x in rng.integers(0, 1 << 60, N)],
                     dtype=object)
        b = np.array([int(x) for x in rng.integers(0, 1 << 60, N)],
                     dtype=object)
        prod = ring.multiply(ring.from_int_coeffs(a), ring.from_int_coeffs(b))
        got = ring.to_int_coeffs(prod)
        # host negacyclic big-int oracle
        want = np.zeros(N, dtype=object)
        for i in range(N):
            for j in range(N):
                k = i + j
                term = int(a[i]) * int(b[j])
                if k < N:
                    want[k] += term
                else:
                    want[k - N] -= term
        want %= ring.Q
        assert np.array_equal(got, want)

    def test_shared_noise_is_crt_consistent(self):
        """The same signed integer sample must appear mod every prime."""
        ring = RnsPolyRing(N, MODULI)
        e = ring.sample_gaussian(jax.random.PRNGKey(5), 3.2)
        x = ring.to_int_coeffs(e)
        for v in x.tolist():
            centered = v if v <= ring.Q // 2 else v - ring.Q
            assert abs(centered) < 64  # ~20 sigma: a real small integer


class TestRnsEngine:
    def test_encrypt_decrypt_round_trip(self, eng_keys):
        eng, sk, pk, _ = eng_keys
        vals = [7, 3, 63, 0]
        ct = eng.encrypt(jax.random.PRNGKey(10), vals, pk)
        got, budget = eng.decrypt(ct, sk, 4)
        assert got.tolist() == vals
        assert budget > 40  # log2(Q/t) ~ 83 with sigma 3.2

    def test_symmetric_encrypt(self, eng_keys):
        eng, sk, _, _ = eng_keys
        ct = eng.encrypt_symmetric(jax.random.PRNGKey(11), 19, sk)
        got, _ = eng.decrypt(ct, sk)
        assert got[0] == 19

    def test_add_sub_scalar(self, eng_keys):
        eng, sk, pk, _ = eng_keys
        a = eng.encrypt(jax.random.PRNGKey(12), [7, 3], pk)
        b = eng.encrypt(jax.random.PRNGKey(13), [6, 1], pk)
        assert eng.decode(eng.phase(eng.add(a, b), sk), 2).tolist() == [13, 4]
        assert eng.decode(eng.phase(eng.sub(a, b), sk), 2).tolist() == [1, 2]
        assert eng.decode(eng.phase(eng.multiply_scalar(a, 5), sk),
                          2).tolist() == [35, 15]
        assert eng.decode(eng.phase(eng.add_plain(a, [1, 2]), sk),
                          2).tolist() == [8, 5]

    @pytest.mark.slow
    def test_noisy_multiply_relin_round_trip(self, eng_keys):
        """The BASELINE bit-exact-parity target: noisy encrypt -> mul ->
        relin -> decrypt over the full RNS chain."""
        eng, sk, pk, rk = eng_keys
        a = eng.encrypt(jax.random.PRNGKey(14), [7, 3], pk)
        b = eng.encrypt(jax.random.PRNGKey(15), 6, pk)
        m = eng.multiply_relin(a, b, rk)
        assert not m.is_degree_2
        vals, budget = eng.decrypt(m, sk, 2)
        assert vals.tolist() == [42, 18]
        assert budget > 10

    def test_multiply_depth_2(self, eng_keys):
        eng, sk, pk, rk = eng_keys
        a = eng.encrypt(jax.random.PRNGKey(16), 7, pk)
        b = eng.encrypt(jax.random.PRNGKey(17), 6, pk)
        m = eng.multiply_relin(a, b, rk)
        m2 = eng.multiply_relin(m, b, rk)  # 7*6*6 = 252 mod 64 = 60
        assert eng.decode(eng.phase(m2, sk))[0] == 252 % 64

    def test_square_and_plain_ops(self, eng_keys):
        eng, sk, pk, rk = eng_keys
        a = eng.encrypt(jax.random.PRNGKey(18), [7, 3], pk)
        sq = eng.relinearize(eng.square(a), rk)
        assert eng.decode(eng.phase(sq, sk), 2).tolist() == [49, 42]
        mp = eng.multiply_plain(a, [2])
        assert eng.decode(eng.phase(mp, sk), 2).tolist() == [14, 6]

    def test_tally_chain(self, eng_keys):
        eng, sk, pk, _ = eng_keys
        ballots = [eng.encrypt(jax.random.PRNGKey(100 + i), [1, 0], pk)
                   for i in range(20)]
        tally = eng.tally_votes(ballots)
        assert eng.decode(eng.phase(tally, sk), 2).tolist() == [20, 0]

    def test_matches_single_modulus_semantics(self):
        """K=1 RNS engine agrees with the single-modulus engine ops."""
        p1 = rns_params(moduli=[Q1])
        rns = RnsEncryptionEngine(p1, noise_std=0.0)
        single = EncryptionEngine(p1, noise_std=0.0)
        ks = rns.keyset
        sk = ks.generate_secret_key(jax.random.PRNGKey(0))
        pk = ks.generate_public_key(jax.random.PRNGKey(1), sk)
        ct = rns.encrypt(jax.random.PRNGKey(2), [9, 5], pk)
        # Same decode through the single-mod engine on the lone residue
        from node_fhe_accelerate_tpu.core.keys import SecretKey
        sk1 = SecretKey(poly=sk.poly[0])
        from node_fhe_accelerate_tpu.core.encrypt import Ciphertext
        ct1 = Ciphertext(c0=ct.c0[0], c1=ct.c1[0], noise_budget=0.0)
        assert single.decode(single.phase(ct1, sk1), 2).tolist() == [9, 5]
        assert rns.decode(rns.phase(ct, sk), 2).tolist() == [9, 5]


class TestRnsApi:
    @pytest.fixture(scope="class")
    def fhe(self):
        from node_fhe_accelerate_tpu.api.engine import FHEEngine
        return FHEEngine(rns_params())

    def test_engine_selects_rns(self, fhe):
        assert isinstance(fhe.engine, RnsEncryptionEngine)
        assert fhe.ring.K == 3

    @pytest.mark.slow
    def test_api_round_trip_and_relin(self, fhe):
        sk = fhe.generate_secret_key()
        pk = fhe.generate_public_key(sk)
        ek = fhe.generate_eval_key(sk)
        a = fhe.encrypt_value(7, pk)
        b = fhe.encrypt_value(6, pk)
        assert fhe.decrypt_value(fhe.add(a, b), sk) == 13
        assert fhe.decrypt_value(fhe.multiply_relin(a, b, ek), sk) == 42
        assert fhe.get_noise_budget(a, sk) > 40

    def test_serialization_round_trip(self, fhe):
        sk = fhe.generate_secret_key()
        pk = fhe.generate_public_key(sk)
        ct = fhe.encrypt_packed([5, 9], pk)
        raw = fhe.serialize_ciphertext(ct)
        back = fhe.deserialize_ciphertext(raw)
        assert fhe.decrypt_packed(back, sk, 2).tolist() == [5, 9]
        rsk = fhe.deserialize_secret_key(fhe.serialize_secret_key(sk))
        assert fhe.decrypt_packed(ct, rsk, 2).tolist() == [5, 9]

    def test_threshold_decrypt_over_rns(self, fhe):
        tk = fhe.generate_threshold_keys(2, 3)
        pk = fhe.generate_public_key(tk.master_sk)
        ct = fhe.encrypt_value(23, pk)
        parts = [fhe.partial_decrypt(ct, s) for s in tk.shares[:2]]
        pt = fhe.combine_partial_decryptions(ct, parts, 2)
        assert int(pt.values[0]) == 23
