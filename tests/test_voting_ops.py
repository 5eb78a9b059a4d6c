"""Voting primitives + encrypted comparisons (encryption.h:613-813 —
placeholders in the reference; real homomorphic/PBS evaluations here)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from node_fhe_accelerate_tpu.core.params import ParameterSet, FHEScheme
from node_fhe_accelerate_tpu.core.keys import KeyManager
from node_fhe_accelerate_tpu.core.encrypt import EncryptionEngine
from node_fhe_accelerate_tpu.core.bootstrap import TfheParams, TfheEngine


@pytest.fixture(scope="module")
def rlwe():
    params = ParameterSet(
        scheme=FHEScheme.TFHE, poly_degree=256, moduli=[1073479681],
        lwe_dimension=64, lwe_noise_std=3.2e-11, glwe_dimension=1,
        decomp_base_log=8, decomp_level=4, plaintext_modulus=64)
    eng = EncryptionEngine(params)
    km = KeyManager(params, eng.ring)
    sk = km.generate_secret_key(jax.random.PRNGKey(0))
    pk = km.generate_public_key(jax.random.PRNGKey(1), sk)
    return eng, sk, pk


@pytest.fixture(scope="module")
def tfhe():
    p = TfheParams(n_lwe=8, poly_degree=64, glwe_dim=1, pbs_base_log=7,
                   pbs_level=3, ks_base_log=4, ks_level=8,
                   lwe_noise_std=0.0, glwe_noise_std=0.0,
                   plaintext_modulus=8)
    eng = TfheEngine(p)
    key = jax.random.PRNGKey(7)
    lwe_sk = eng.lwe_keygen(jax.random.fold_in(key, 0))
    glwe_sk = eng.glwe_keygen(jax.random.fold_in(key, 1))
    bsk = eng.generate_bootstrap_key(jax.random.fold_in(key, 2),
                                     lwe_sk, glwe_sk)
    return eng, lwe_sk, bsk


class TestTallies:
    def test_one_hot_tally(self, rlwe):
        eng, sk, pk = rlwe
        votes = [0, 1, 2, 1, 1]
        ballots = []
        for i, v in enumerate(votes):
            onehot = np.zeros(3, dtype=np.uint64)
            onehot[v] = 1
            ballots.append(eng.encrypt(jax.random.PRNGKey(10 + i),
                                       onehot, pk))
        tally = eng.tally_votes(ballots)
        counts = eng.decode(eng.phase(tally, sk), 3)
        assert [int(c) for c in counts] == [1, 3, 1]

    def test_weighted_tally(self, rlwe):
        eng, sk, pk = rlwe
        b1 = eng.encrypt(jax.random.PRNGKey(20), 1, pk)
        b2 = eng.encrypt(jax.random.PRNGKey(21), 1, pk)
        tally = eng.tally_weighted([b1, b2], [3, 5])
        assert int(eng.decode(eng.phase(tally, sk))[0]) == 8

    def test_update_tally(self, rlwe):
        eng, sk, pk = rlwe
        t = eng.encrypt(jax.random.PRNGKey(22), 4, pk)
        b = eng.encrypt(jax.random.PRNGKey(23), 1, pk)
        t2 = eng.update_tally(t, b)
        assert int(eng.decode(eng.phase(t2, sk))[0]) == 5

    def test_weight_mismatch_rejected(self, rlwe):
        eng, sk, pk = rlwe
        b = eng.encrypt(jax.random.PRNGKey(24), 1, pk)
        with pytest.raises(ValueError, match="weights"):
            eng.tally_weighted([b], [1, 2])


class TestEncryptedComparisons:
    def test_is_zero(self, tfhe):
        eng, sk, bsk = tfhe
        ct0 = eng.lwe_encrypt(jax.random.PRNGKey(1),
                              jnp.array([0], jnp.uint32), sk)
        ct2 = eng.lwe_encrypt(jax.random.PRNGKey(2),
                              jnp.array([2], jnp.uint32), sk)
        assert np.asarray(eng.lwe_decrypt(
            eng.lwe_is_zero(ct0, bsk), sk))[0] == 1
        assert np.asarray(eng.lwe_decrypt(
            eng.lwe_is_zero(ct2, bsk), sk))[0] == 0

    @pytest.mark.slow
    def test_eq(self, tfhe):
        eng, sk, bsk = tfhe
        a = eng.lwe_encrypt(jax.random.PRNGKey(3),
                            jnp.array([2], jnp.uint32), sk)
        b = eng.lwe_encrypt(jax.random.PRNGKey(4),
                            jnp.array([2], jnp.uint32), sk)
        c = eng.lwe_encrypt(jax.random.PRNGKey(5),
                            jnp.array([3], jnp.uint32), sk)
        assert np.asarray(eng.lwe_decrypt(eng.lwe_eq(a, b, bsk), sk))[0] == 1
        assert np.asarray(eng.lwe_decrypt(eng.lwe_eq(a, c, bsk), sk))[0] == 0

    @pytest.mark.slow
    def test_threshold(self, tfhe):
        eng, sk, bsk = tfhe
        for v, want in [(0, 0), (1, 0), (2, 1), (3, 1)]:
            ct = eng.lwe_encrypt(jax.random.PRNGKey(10 + v),
                                 jnp.array([v], jnp.uint32), sk)
            out = eng.lwe_gt_threshold(ct, 2, bsk)
            assert np.asarray(eng.lwe_decrypt(out, sk))[0] == want, v

    @pytest.mark.slow
    def test_detect_duplicate(self, tfhe):
        eng, sk, bsk = tfhe
        existing = [eng.lwe_encrypt(jax.random.PRNGKey(30 + v),
                                    jnp.array([v], jnp.uint32), sk)
                    for v in [1, 2]]
        dup = eng.lwe_encrypt(jax.random.PRNGKey(40),
                              jnp.array([2], jnp.uint32), sk)
        fresh = eng.lwe_encrypt(jax.random.PRNGKey(41),
                                jnp.array([3], jnp.uint32), sk)
        assert np.asarray(eng.lwe_decrypt(
            eng.detect_duplicate(dup, existing, bsk), sk))[0] == 1
        assert np.asarray(eng.lwe_decrypt(
            eng.detect_duplicate(fresh, existing, bsk), sk))[0] == 0
