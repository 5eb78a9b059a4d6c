"""CKKS approximate arithmetic (core/ckks.py).

The reference carries the CKKS_128_ML preset but computes no CKKS
(parameter_set.cpp:226-259 is the whole story there); these tests pin the
real thing: canonical-embedding encode/decode, leveled multiply with
relinearize + exact RNS rescale, scale bookkeeping, precision contracts.
"""
import math
from fractions import Fraction

import numpy as np
import pytest
import jax

from node_fhe_accelerate_tpu.ops.primes import find_ntt_prime
from node_fhe_accelerate_tpu.core.params import ParameterSet, FHEScheme
from node_fhe_accelerate_tpu.core.ckks import CkksEncoder, CkksEngine

N = 64
Q1 = find_ntt_prime(30, N)
Q2 = find_ntt_prime(30, N, below=Q1)
Q3 = find_ntt_prime(29, N)
SCALE = 1 << 26


def ckks_params():
    return ParameterSet(
        scheme=FHEScheme.CKKS, poly_degree=N, moduli=[Q1, Q2, Q3],
        lwe_dimension=16, lwe_noise_std=3.2e-11, glwe_dimension=1,
        decomp_base_log=8, decomp_level=4, plaintext_modulus=0,
    )


@pytest.fixture(scope="module")
def eng_keys():
    eng = CkksEngine(ckks_params(), scale=SCALE)
    key = jax.random.PRNGKey(0)
    sk = eng.generate_secret_key(jax.random.fold_in(key, 0))
    pk = eng.generate_public_key(jax.random.fold_in(key, 1), sk)
    rlks = eng.generate_relin_keys(jax.random.fold_in(key, 2), sk)
    return eng, sk, pk, rlks


class TestEncoder:
    def test_encode_decode_round_trip(self):
        enc = CkksEncoder(N)
        z = np.array([1.5, -2.25, 0.125 + 0.5j, 3.75 - 1j])
        coeffs = enc.encode(z, SCALE)
        back = enc.decode(coeffs, Fraction(SCALE), 4)
        np.testing.assert_allclose(back, z, atol=1e-5)

    def test_encoding_is_additive_and_real(self):
        enc = CkksEncoder(N)
        a = np.random.default_rng(0).normal(size=N // 2)
        b = np.random.default_rng(1).normal(size=N // 2)
        ca, cb = enc.encode(a, SCALE), enc.encode(b, SCALE)
        back = enc.decode(ca + cb, Fraction(SCALE))
        np.testing.assert_allclose(back.real, a + b, atol=1e-5)
        np.testing.assert_allclose(back.imag, 0, atol=1e-5)

    def test_slot_count_guard(self):
        enc = CkksEncoder(N)
        with pytest.raises(ValueError, match="slots"):
            enc.encode(np.ones(N), SCALE)


class TestCkksEngine:
    def test_encrypt_decrypt_precision(self, eng_keys):
        eng, sk, pk, _ = eng_keys
        z = np.array([1.0, -0.5, 0.25 + 0.75j])
        ct = eng.encrypt(jax.random.PRNGKey(5), z, pk)
        got = eng.decrypt(ct, sk, 3)
        np.testing.assert_allclose(got, z, atol=1e-4)

    def test_add_sub(self, eng_keys):
        eng, sk, pk, _ = eng_keys
        a = eng.encrypt(jax.random.PRNGKey(6), [1.5, 2.0], pk)
        b = eng.encrypt(jax.random.PRNGKey(7), [0.25, -1.0], pk)
        np.testing.assert_allclose(eng.decrypt(eng.add(a, b), sk, 2),
                                   [1.75, 1.0], atol=1e-4)
        np.testing.assert_allclose(eng.decrypt(eng.sub(a, b), sk, 2),
                                   [1.25, 3.0], atol=1e-4)

    def test_add_plain(self, eng_keys):
        eng, sk, pk, _ = eng_keys
        a = eng.encrypt(jax.random.PRNGKey(8), [1.5], pk)
        np.testing.assert_allclose(
            eng.decrypt(eng.add_plain(a, [2.25]), sk, 1), [3.75], atol=1e-4)

    def test_multiply_relin_rescale(self, eng_keys):
        eng, sk, pk, rlks = eng_keys
        a = eng.encrypt(jax.random.PRNGKey(9), [1.5, -2.0], pk)
        b = eng.encrypt(jax.random.PRNGKey(10), [2.0, 0.5], pk)
        m = eng.multiply_relin_rescale(a, b, rlks)
        assert m.level == eng.K - 1
        assert m.scale == Fraction(SCALE) ** 2 / Q3
        got = eng.decrypt(m, sk, 2)
        np.testing.assert_allclose(got, [3.0, -1.0], atol=1e-3)

    def test_fused_matches_eager(self, eng_keys):
        """The single-dispatch fused multiply (round 5, the TPU bench path)
        is bit-identical to multiply -> relinearize -> rescale."""
        eng, sk, pk, rlks = eng_keys
        a = eng.encrypt(jax.random.PRNGKey(31), [0.5, -1.25, 2.0], pk)
        b = eng.encrypt(jax.random.PRNGKey(32), [-2.0, 0.75, 1.5], pk)
        eager = eng.multiply_relin_rescale(a, b, rlks, fused=False)
        fused = eng.multiply_relin_rescale(a, b, rlks, fused=True)
        assert fused.level == eager.level
        assert fused.scale == eager.scale
        for pf, pe in zip(fused.c0 + fused.c1, eager.c0 + eager.c1):
            for plane_f, plane_e in zip(pf, pe):
                np.testing.assert_array_equal(np.asarray(plane_f),
                                              np.asarray(plane_e))

    def test_multiply_depth_2(self, eng_keys):
        """(a*b)*c across two rescales — the leveled story end-to-end."""
        eng, sk, pk, rlks = eng_keys
        a = eng.encrypt(jax.random.PRNGKey(11), [1.5], pk)
        b = eng.encrypt(jax.random.PRNGKey(12), [-2.0], pk)
        c = eng.encrypt(jax.random.PRNGKey(13), [0.5], pk)
        ab = eng.multiply_relin_rescale(a, b, rlks)     # level K-1
        abc = eng.multiply_relin_rescale(ab, c, rlks)   # level K-2
        assert abc.level == eng.K - 2
        got = eng.decrypt(abc, sk, 1)
        np.testing.assert_allclose(got, [-1.5], atol=5e-3)

    def test_mod_down_alignment(self, eng_keys):
        """add() aligns operands at different levels automatically."""
        eng, sk, pk, rlks = eng_keys
        a = eng.encrypt(jax.random.PRNGKey(14), [1.0], pk)
        b = eng.encrypt(jax.random.PRNGKey(15), [2.0], pk)
        c = eng.encrypt(jax.random.PRNGKey(16), [4.0], pk)
        ab = eng.multiply_relin_rescale(a, b, rlks)     # level K-1
        low = eng.mod_down(c, ab.level)
        np.testing.assert_allclose(eng.decrypt(low, sk, 1), [4.0], atol=1e-4)
        with pytest.raises(ValueError, match="scale"):
            eng.add(ab, low)  # scales differ: must raise, not corrupt

    def test_scale_mismatch_guard(self, eng_keys):
        eng, _, pk, rlks = eng_keys
        a = eng.encrypt(jax.random.PRNGKey(17), [1.0], pk)
        b = eng.encrypt(jax.random.PRNGKey(18), [1.0], pk)
        m = eng.multiply_relin_rescale(a, b, rlks)
        with pytest.raises(ValueError, match="rescale"):
            eng.rescale(eng.rescale(m))  # level 1 left: nothing to drop


class TestCkksContext:
    def test_context_round_trip_and_dot(self):
        from node_fhe_accelerate_tpu.api.ckks_context import CkksContext
        ctx = CkksContext(ckks_params(), scale=SCALE)
        a = ctx.encrypt([1.0, 2.0])
        b = ctx.encrypt([0.5, -1.0])
        np.testing.assert_allclose(ctx.decrypt(ctx.add(a, b), 2),
                                   [1.5, 1.0], atol=1e-4)
        m = ctx.multiply(a, b)
        np.testing.assert_allclose(ctx.decrypt(m, 2), [0.5, -2.0], atol=1e-3)
        # encrypted weighted sum (the ML-inference primitive)
        d = ctx.dot([a, b], [2.0, 4.0])
        np.testing.assert_allclose(ctx.decrypt(d, 2), [4.0, 0.0], atol=1e-3)
