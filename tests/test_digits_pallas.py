"""Fused Pallas field/point kernels (ops/digits_pallas.py) — bit-exact
vs the XLA digit-engine path, interpret mode on the CPU test backend.

The kernels evaluate zk/curve.py's extracted jadd/jdbl formulas with
in-VMEM field ops, so these tests pin the ONLY thing that can diverge:
the kernel field ops (conv, Montgomery reduce, carry resolution,
digit-array add/sub/select) against ops/digits.py + zk/field.py."""
import numpy as np
import pytest
import jax

from node_fhe_accelerate_tpu.zk.field import bn254_fq
from node_fhe_accelerate_tpu.zk.curve import (
    bn254_g1, jadd_formula, jdbl_formula)
from node_fhe_accelerate_tpu.ops.digits_pallas import (
    pallas_field_mul, pallas_jadd, pallas_jdbl)


@pytest.fixture(scope="module")
def setup():
    f = bn254_fq()
    rng = np.random.default_rng(5)
    vals = [int.from_bytes(rng.bytes(31), "little") % f.q for _ in range(16)]
    return f, rng, vals


def test_field_mul_bit_exact(setup):
    f, rng, vals = setup
    a = f.encode(vals)
    b = f.encode(vals[::-1])
    want = np.asarray(jax.jit(f.mul)(a, b))
    got = np.asarray(pallas_field_mul(f, a, b))
    np.testing.assert_array_equal(got, want)


def test_field_mul_edge_values(setup):
    f, _, _ = setup
    edge = [0, 1, 2, f.q - 1, f.q - 2, 255, 256, (1 << 254) % f.q,
            f.q // 2, 0xFF00FF00FF00FF00]
    a = f.encode(edge)
    b = f.encode(edge[::-1])
    want = np.asarray(jax.jit(f.mul)(a, b))
    got = np.asarray(pallas_field_mul(f, a, b))
    np.testing.assert_array_equal(got, want)


def test_jacobian_add_bit_exact(setup):
    """Kernel add == XLA formula on generic + edge points (infinity in
    either slot, equal points -> doubling branch, inverse points ->
    infinity branch)."""
    f, rng, vals = setup
    curve = bn254_g1()
    ks = [3, 7, 11, 19, 23, 5, 3, 12]
    P = curve.fixed_base_mul(ks, backend="host")
    Q = curve.fixed_base_mul(ks[::-1], backend="host")
    import jax.numpy as jnp
    # edge rows: P[5] = infinity; (P[6], Q[6]) equal (doubling);
    # (P[7], Q[7]) inverses (to-infinity)
    Pz = P[2].at[5].set(0)
    Q = (Q[0].at[6].set(P[0][6]).at[7].set(P[0][7]),
         Q[1].at[6].set(P[1][6]).at[7].set(curve.fq.neg(P[1][7])),
         Q[2].at[6].set(P[2][6]).at[7].set(P[2][7]))
    P = (P[0], P[1], Pz)

    want = jax.jit(lambda p, q: jadd_formula(
        curve.fq, p, q, select=curve.fq.select,
        where_zero=lambda pr, a: curve.fq.select(
            pr, jnp.zeros_like(a), a)))(P, Q)
    got = pallas_jadd(curve.fq, P, Q)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_jacobian_dbl_bit_exact(setup):
    f, rng, vals = setup
    curve = bn254_g1()
    P = curve.fixed_base_mul([2, 9, 31, 1, 77, 123, 8, 4], backend="host")
    P = (P[0], P[1], P[2].at[3].set(0))        # one infinity row
    want = jax.jit(lambda p: jdbl_formula(curve.fq, p))(P)
    got = pallas_jdbl(curve.fq, P)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_tfield_glue_bit_exact(setup):
    """Transposed-domain glue (add/sub/neg/select along axis 0) == Field:
    this is the layer the TRACED point path (pallas_jadd_t) runs in XLA
    between kernel calls, including the top-carry semantics sub_digits'
    >= flag depends on."""
    from node_fhe_accelerate_tpu.ops.digits_pallas import _tfield
    f, rng, vals = setup
    tf = _tfield(f)
    xs = vals + [0, 1, f.q - 1]
    ys = vals[::-1] + [f.q - 1, 0, 1]
    a, b = f.encode(xs), f.encode(ys)
    aT, bT = a.T, b.T
    np.testing.assert_array_equal(np.asarray(f.add(a, b)),
                                  np.asarray(tf.add(aT, bT).T))
    np.testing.assert_array_equal(np.asarray(f.sub(a, b)),
                                  np.asarray(tf.sub(aT, bT).T))
    np.testing.assert_array_equal(np.asarray(f.neg(a)),
                                  np.asarray(tf.neg(aT).T))
    np.testing.assert_array_equal(np.asarray(f.is_zero(a)),
                                  np.asarray(tf.is_zero(aT)))


def test_jacobian_add_t_bit_exact(setup):
    """Default device point path (pallas_jadd_t / pallas_jdbl_t, the
    transposed kernels) == XLA formula on generic + edge points."""
    from node_fhe_accelerate_tpu.ops.digits_pallas import (
        pallas_jadd_t, pallas_jdbl_t)
    import jax.numpy as jnp
    f, rng, vals = setup
    curve = bn254_g1()
    ks = [3, 7, 11, 19, 23, 5, 3, 12]
    P = curve.fixed_base_mul(ks, backend="host")
    Q = curve.fixed_base_mul(ks[::-1], backend="host")
    Pz = P[2].at[5].set(0)
    Q = (Q[0].at[6].set(P[0][6]).at[7].set(P[0][7]),
         Q[1].at[6].set(P[1][6]).at[7].set(curve.fq.neg(P[1][7])),
         Q[2].at[6].set(P[2][6]).at[7].set(P[2][7]))
    P = (P[0], P[1], Pz)
    want = jax.jit(lambda p, q: jadd_formula(
        curve.fq, p, q, select=curve.fq.select,
        where_zero=lambda pr, a: curve.fq.select(
            pr, jnp.zeros_like(a), a)))(P, Q)
    got = pallas_jadd_t(curve.fq, P, Q)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    wantd = jax.jit(lambda p: jdbl_formula(curve.fq, p))(P)
    gotd = pallas_jdbl_t(curve.fq, P)
    for g, w in zip(gotd, wantd):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_jacobian_add_t_g2_bit_exact():
    """Transposed point path over Fq2 (_TField2 Karatsuba) == XLA Field2
    formulas — the G2 device route of Groth16's B MSM."""
    import jax.numpy as jnp
    from node_fhe_accelerate_tpu.zk.curve_g2 import bn254_g2
    from node_fhe_accelerate_tpu.ops.digits_pallas import (
        pallas_jadd_t, pallas_jdbl_t)
    c = bn254_g2()
    f = c.fq
    P = c.generator((8,))
    Q = jdbl_formula(f, jdbl_formula(f, P))
    Pz = P[2].at[5].set(0)
    Q = (Q[0].at[6].set(P[0][6]).at[7].set(P[0][7]),
         Q[1].at[6].set(P[1][6]).at[7].set(f.neg(P[1][7])),
         Q[2].at[6].set(P[2][6]).at[7].set(P[2][7]))
    P = (P[0], P[1], Pz)
    want = jadd_formula(f, P, Q, select=f.select,
                        where_zero=lambda pr, a: f.select(
                            pr, jnp.zeros_like(a), a))
    got = pallas_jadd_t(f, P, Q)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
