"""Bootstrap-key serialization + disk cache (core/keycache.py).

Parity anchor: the reference serializes bootstrap keys through its FHEB
blob format (serialization.h); here the cache also guarantees the loaded
key matches the secret keys it is used with (whole-keygen ownership)."""
import jax
import numpy as np
import jax.numpy as jnp
import pytest

from node_fhe_accelerate_tpu.core.bootstrap import TfheParams, TfheEngine
from node_fhe_accelerate_tpu.core.keycache import (
    BootstrapKeyCache, serialize_bootstrap_key, deserialize_bootstrap_key,
)
from node_fhe_accelerate_tpu.core.serializer import SerializationError


def tiny_params(**kw):
    d = dict(n_lwe=8, poly_degree=64, glwe_dim=1,
             pbs_base_log=7, pbs_level=3, ks_base_log=4, ks_level=8,
             lwe_noise_std=0.0, glwe_noise_std=0.0, plaintext_modulus=4)
    d.update(kw)
    return TfheParams(**d)


@pytest.fixture(scope="module")
def eng():
    return TfheEngine(tiny_params(), ext_backend="mxu")


class TestBskSerialization:
    @pytest.mark.slow
    def test_blob_round_trip(self, eng):
        key = jax.random.PRNGKey(7)
        lwe_sk = eng.lwe_keygen(jax.random.fold_in(key, 0))
        glwe_sk = eng.glwe_keygen(jax.random.fold_in(key, 1))
        bsk = eng.generate_bootstrap_key(jax.random.fold_in(key, 2),
                                         lwe_sk, glwe_sk)
        back = deserialize_bootstrap_key(serialize_bootstrap_key(bsk), eng.p)
        assert np.array_equal(np.asarray(back.ggsw_i8),
                              np.asarray(bsk.ggsw_i8))
        assert np.array_equal(np.asarray(back.ksk_a), np.asarray(bsk.ksk_a))
        assert back.params == eng.p

    def test_params_mismatch_rejected(self, eng):
        key = jax.random.PRNGKey(7)
        lwe_sk = eng.lwe_keygen(jax.random.fold_in(key, 0))
        glwe_sk = eng.glwe_keygen(jax.random.fold_in(key, 1))
        bsk = eng.generate_bootstrap_key(jax.random.fold_in(key, 2),
                                         lwe_sk, glwe_sk)
        raw = serialize_bootstrap_key(bsk)
        with pytest.raises(SerializationError, match="params"):
            deserialize_bootstrap_key(raw, tiny_params(n_lwe=16))

    def test_corruption_detected(self, eng):
        key = jax.random.PRNGKey(7)
        lwe_sk = eng.lwe_keygen(jax.random.fold_in(key, 0))
        glwe_sk = eng.glwe_keygen(jax.random.fold_in(key, 1))
        bsk = eng.generate_bootstrap_key(jax.random.fold_in(key, 2),
                                         lwe_sk, glwe_sk)
        raw = bytearray(serialize_bootstrap_key(bsk))
        raw[len(raw) // 2] ^= 0xFF
        with pytest.raises(SerializationError):
            deserialize_bootstrap_key(bytes(raw), eng.p)


class TestBskCache:
    def test_miss_then_hit_bootstraps_correctly(self, eng, tmp_path):
        cache = BootstrapKeyCache(str(tmp_path / "kc"))
        lwe_sk, glwe_sk, bsk1 = cache.get_or_generate(eng, seed=3)
        # hit: must return the SAME key material
        lwe_sk2, glwe_sk2, bsk2 = cache.get_or_generate(eng, seed=3)
        assert np.array_equal(np.asarray(lwe_sk), np.asarray(lwe_sk2))
        assert np.array_equal(np.asarray(bsk1.ggsw_i8),
                              np.asarray(bsk2.ggsw_i8))
        # the cached key actually bootstraps: encrypt -> PBS -> decrypt
        msgs = jnp.array([0, 1, 1, 0], dtype=jnp.uint32)
        ct = eng.lwe_encrypt(jax.random.PRNGKey(5), msgs, lwe_sk2)
        out = eng.bootstrap_jit(ct, bsk2, eng.default_test_poly())
        dec = np.asarray(eng.lwe_decrypt(out, lwe_sk2))
        assert np.array_equal(dec, np.asarray(msgs))

    def test_distinct_seeds_and_params_distinct_entries(self, eng, tmp_path):
        cache = BootstrapKeyCache(str(tmp_path / "kc2"))
        p1 = cache._path(eng, 0)
        p2 = cache._path(eng, 1)
        eng2 = TfheEngine(tiny_params(n_lwe=16), ext_backend="mxu")
        p3 = cache._path(eng2, 0)
        assert len({p1, p2, p3}) == 3

    def test_schema_drift_falls_back_to_compatible_blob(self, eng, tmp_path):
        """A default-valued TfheParams field addition moves the SHA-256
        cache key but leaves every existing blob params-EQUAL after
        deserialization; load() must adopt such a blob instead of
        regenerating (the exact failure that zeroed BENCH_r04)."""
        import os
        cache = BootstrapKeyCache(str(tmp_path / "kc4"))
        lwe_sk, glwe_sk, bsk = cache.get_or_generate(eng, seed=4)
        # simulate the hash move: rename the blob to a stale hash name
        path = cache._path(eng, 4)
        stale = os.path.join(os.path.dirname(path), "0" * 32 + ".fheb")
        os.rename(path, stale)
        _, _, bsk2 = cache.load(eng, 4)
        assert bsk2 is not None, "fallback scan missed a compatible blob"
        assert np.array_equal(np.asarray(bsk.ggsw_i8),
                              np.asarray(bsk2.ggsw_i8))
        # the blob was adopted under the current hash for next time
        assert os.path.exists(path)

    def test_fallback_rejects_wrong_seed_blob(self, eng, tmp_path):
        """A blob recorded under seed A must not satisfy a seed-B request
        (its BSK would mismatch the secret keys load() regenerates)."""
        import os
        cache = BootstrapKeyCache(str(tmp_path / "kc5"))
        cache.get_or_generate(eng, seed=4)
        path = cache._path(eng, 4)
        stale = os.path.join(os.path.dirname(path), "1" * 32 + ".fheb")
        os.rename(path, stale)
        _, _, bsk = cache.load(eng, 5)  # different seed
        assert bsk is None

    def test_corrupt_entry_evicted(self, eng, tmp_path):
        cache = BootstrapKeyCache(str(tmp_path / "kc3"))
        cache.get_or_generate(eng, seed=9)
        path = cache._path(eng, 9)
        with open(path, "r+b") as f:
            f.seek(60)
            f.write(b"\xde\xad\xbe\xef")
        _, _, bsk = cache.get_or_generate(eng, seed=9)  # regenerates
        assert bsk is not None
