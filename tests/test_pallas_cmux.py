"""Fused Pallas CMux step (ops/pallas_cmux.py) — bit-exactness vs the XLA
int8 MXU backend, in interpret mode on the CPU test backend (compiled on
real TPU; same code path, same exact integer algebra)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from node_fhe_accelerate_tpu.core.bootstrap import TfheParams, TfheEngine


def params_256(**kw):
    d = dict(n_lwe=8, poly_degree=256, glwe_dim=1,
             pbs_base_log=7, pbs_level=3, ks_base_log=4, ks_level=8,
             lwe_noise_std=0.0, glwe_noise_std=0.0, plaintext_modulus=4)
    d.update(kw)
    return TfheParams(**d)


@pytest.fixture(scope="module")
def setup():
    p = params_256()
    eng_m = TfheEngine(p, ext_backend="mxu")
    key = jax.random.PRNGKey(3)
    lwe_sk = eng_m.lwe_keygen(jax.random.fold_in(key, 0))
    glwe_sk = eng_m.glwe_keygen(jax.random.fold_in(key, 1))
    bsk = eng_m.generate_bootstrap_key(jax.random.fold_in(key, 2),
                                       lwe_sk, glwe_sk)
    return p, eng_m, lwe_sk, glwe_sk, bsk


def test_cmux_step_bit_exact_vs_mxu(setup):
    p, eng, lwe_sk, glwe_sk, bsk = setup
    from node_fhe_accelerate_tpu.ops.pallas_cmux import cmux_step_pallas

    rng = np.random.default_rng(0)
    B = 8
    acc = jnp.asarray(
        rng.integers(0, 1 << 32, (B, p.glwe_dim + 1, p.poly_degree),
                     dtype=np.uint64).astype(np.uint32))
    rot = jnp.asarray(rng.integers(0, 2 * p.poly_degree, B, dtype=np.int64)
                      .astype(np.int32))

    g = bsk.ggsw_i8[0]
    # XLA reference: rotate + cmux
    rotated = eng.ring.rotate(acc, rot[..., None])
    want = eng.cmux(g, acc, rotated)

    ghat2 = jnp.concatenate([g, g], axis=-1)
    got = cmux_step_pallas(acc, rot, ghat2, p.pbs_base_log, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cmux_step_edge_rotations(setup):
    """rot = 0 (identity branch must still add GGSW(s)*0 = noise-free 0),
    rot = N and 2N-1 (sign wraparound edges)."""
    p, eng, lwe_sk, glwe_sk, bsk = setup
    from node_fhe_accelerate_tpu.ops.pallas_cmux import cmux_step_pallas

    rng = np.random.default_rng(1)
    N = p.poly_degree
    acc = jnp.asarray(
        rng.integers(0, 1 << 32, (4, p.glwe_dim + 1, N),
                     dtype=np.uint64).astype(np.uint32))
    rot = jnp.asarray(np.array([0, N, 2 * N - 1, 17], dtype=np.int32))
    g = bsk.ggsw_i8[3]
    rotated = eng.ring.rotate(acc, rot[..., None])
    want = eng.cmux(g, acc, rotated)
    ghat2 = jnp.concatenate([g, g], axis=-1)
    got = cmux_step_pallas(acc, rot, ghat2, p.pbs_base_log, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_steps_bit_exact_vs_mxu(setup):
    """Steps-outer fused blind rotate (blind_rotate_fused_steps): the full
    ladder must be bit-exact vs the mxu-backend bootstrap accumulator and
    decode correctly (round 5 — the mxu_fused production backend)."""
    p, eng_m, lwe_sk, glwe_sk, bsk = setup
    eng_f = TfheEngine(p, ext_backend="mxu_fused")
    bsk_f = eng_f.prepare_bsk(bsk)
    assert bsk_f.ggsw_slabs is not None

    msgs = jnp.asarray(np.arange(8) % 2, jnp.uint32)
    ct = eng_m.lwe_encrypt(jax.random.PRNGKey(9), msgs, lwe_sk)
    tp = eng_m.default_test_poly()

    ref = eng_m.bootstrap_jit(ct, bsk, tp)
    got = eng_f.bootstrap_jit(ct, bsk_f, tp)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(ref.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(ref.b))
    dec = np.asarray(eng_f.lwe_decrypt(got, lwe_sk))
    np.testing.assert_array_equal(dec, np.asarray(msgs))


def test_fused_steps_truncated_key_matches_mxu(setup):
    """mxu_fused with a truncated (bsk_drop_planes=1) key must reproduce
    the mxu backend's plane-weight restoration bit-for-bit."""
    p0, eng_m0, lwe_sk, glwe_sk, _ = setup
    pt = TfheParams(**{**p0.__dict__, "bsk_drop_planes": 1})
    eng_m = TfheEngine(pt, ext_backend="mxu")
    eng_f = TfheEngine(pt, ext_backend="mxu_fused")
    key = jax.random.PRNGKey(3)
    bsk = eng_m.generate_bootstrap_key(jax.random.fold_in(key, 2),
                                       lwe_sk, glwe_sk)
    bsk_f = eng_f.prepare_bsk(bsk)

    msgs = jnp.asarray(np.arange(8) % 2, jnp.uint32)
    ct = eng_m.lwe_encrypt(jax.random.PRNGKey(9), msgs, lwe_sk)
    tp = eng_m.default_test_poly()
    ref = eng_m.bootstrap_jit(ct, bsk, tp)
    got = eng_f.bootstrap_jit(ct, bsk_f, tp)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(ref.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(ref.b))


def test_full_bootstrap_pallas_backend_decodes(setup):
    """End-to-end PBS through the pallas backend: bit-exact accumulator vs
    the mxu backend on the same key, and correct decode."""
    p, eng_m, lwe_sk, glwe_sk, bsk = setup
    eng_p = TfheEngine(p, ext_backend="pallas")

    msgs = jnp.asarray(np.arange(8) % 2, jnp.uint32)
    ct = eng_m.lwe_encrypt(jax.random.PRNGKey(9), msgs, lwe_sk)
    tp = eng_m.default_test_poly()

    ref = eng_m.bootstrap_jit(ct, bsk, tp)
    got = eng_p.bootstrap_jit(ct, bsk, tp)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(ref.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(ref.b))
    dec = np.asarray(eng_p.lwe_decrypt(got, lwe_sk))
    np.testing.assert_array_equal(dec, np.asarray(msgs))
