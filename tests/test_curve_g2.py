"""Device Fq2 field + BN254 G2 curve (zk/field2.py, zk/curve_g2.py):
component arithmetic vs the host FQ2 oracle, the inherited branchless
Jacobian group law and Pippenger MSM over the extension field, and
equivalence of host/device MSM backends."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from node_fhe_accelerate_tpu.zk.field2 import bn254_fq2
from node_fhe_accelerate_tpu.zk.curve_g2 import bn254_g2
from node_fhe_accelerate_tpu.zk.pairing import (
    FQ2, G2_GENERATOR, g2_mul, g2_add, is_on_g2, g2_msm,
)
from node_fhe_accelerate_tpu.ops import limbs as lb


@pytest.fixture(scope="module")
def f2():
    return bn254_fq2()


@pytest.fixture(scope="module")
def g2():
    return bn254_g2()


def _rand_pairs(rng, n, q):
    def r():
        return int.from_bytes(rng.bytes(40), "little") % q
    return [(r(), r()) for _ in range(n)]


def test_field2_mul_square_inv_oracle(f2):
    q = f2.q
    rng = np.random.default_rng(0)
    pairs_a = _rand_pairs(rng, 4, q)
    pairs_b = _rand_pairs(rng, 4, q)
    a = f2.encode(pairs_a)
    b = f2.encode(pairs_b)
    mul = jax.jit(f2.mul)
    sq = jax.jit(f2.square)
    got0, got1 = f2.decode(mul(a, b))
    gots0, gots1 = f2.decode(sq(a))
    for i in range(4):
        fa = FQ2(list(pairs_a[i]))
        fb = FQ2(list(pairs_b[i]))
        want = fa * fb
        assert (int(got0[i]), int(got1[i])) == \
            (int(want.coeffs[0]), int(want.coeffs[1]))
        ws = fa * fa
        assert (int(gots0[i]), int(gots1[i])) == \
            (int(ws.coeffs[0]), int(ws.coeffs[1]))
    # additive ops + predicates
    s0, s1 = f2.decode(jax.jit(f2.add)(a, b))
    for i in range(4):
        w = FQ2(list(pairs_a[i])) + FQ2(list(pairs_b[i]))
        assert (int(s0[i]), int(s1[i])) == \
            (int(w.coeffs[0]), int(w.coeffs[1]))
    assert bool(np.asarray(f2.eq(a, a)).all())
    assert not bool(np.asarray(f2.eq(a, b)).any())
    assert bool(np.asarray(f2.is_zero(f2.sub(a, a))).all())


def test_field2_inv_oracle(f2):
    rng = np.random.default_rng(1)
    pairs = _rand_pairs(rng, 2, f2.q)
    a = f2.encode(pairs)
    i0, i1 = f2.decode(jax.jit(f2.inv)(a))
    for i in range(2):
        w = FQ2([1, 0]) / FQ2(list(pairs[i]))
        assert (int(i0[i]), int(i1[i])) == \
            (int(w.coeffs[0]), int(w.coeffs[1]))


def test_g2_generator_roundtrip_and_on_curve(g2):
    gen = g2.generator()
    aff = g2.to_affine_pairs((gen[0][None], gen[1][None], gen[2][None]))[0]
    assert aff == G2_GENERATOR
    assert is_on_g2(aff)
    assert g2.is_on_curve_affine(g2.gen_affine[0], g2.gen_affine[1])


def test_g2_device_add_double_match_oracle(g2):
    gen = g2.generator()
    d2 = g2.double(gen)
    d3 = g2.add(d2, gen)
    aff2 = g2.to_affine_pairs((d2[0][None], d2[1][None], d2[2][None]))[0]
    aff3 = g2.to_affine_pairs((d3[0][None], d3[1][None], d3[2][None]))[0]
    assert aff2 == g2_mul(G2_GENERATOR, 2)
    assert aff3 == g2_mul(G2_GENERATOR, 3)
    # adding the negation gives infinity
    inf = g2.add(gen, g2.negate(gen))
    assert bool(np.asarray(g2.is_infinity(inf)))


@pytest.mark.slow
def test_g2_device_scalar_mul_matches_oracle(g2):
    # 2-limb (64-bit) scalars keep the XLA:CPU compile of the windowed
    # ladder tolerable; the loop body is width-independent.
    ks = [5, 1, 12345678901234567890]
    limbs = lb.limbs_from_ints(ks, 2)
    gen = g2.generator((len(ks),))
    out = g2.scalar_mul(limbs, gen)
    affs = g2.to_affine_pairs(out)
    for k, aff in zip(ks, affs):
        assert aff == g2_mul(G2_GENERATOR, k)


def test_g2_msm_host_matches_oracle(g2):
    rng = np.random.default_rng(3)
    ks = [2, 7, 11, 13]
    pts = g2.from_affine_pairs([g2_mul(G2_GENERATOR, k) for k in ks])
    svals = [int(rng.integers(1, 1 << 62)) for _ in ks]
    limbs = lb.limbs_from_ints(svals, 8)
    want = g2_msm([g2_mul(G2_GENERATOR, k) for k in ks], svals)
    host = g2.msm(limbs, pts, backend="host")
    assert g2.to_affine_pairs((host[0][None], host[1][None],
                               host[2][None]))[0] == want


@pytest.mark.slow
def test_g2_msm_device_pippenger_matches_oracle(g2):
    """Device sort/prefix-scan Pippenger over Fq2 == host FQ2 Pippenger.

    2-limb scalars (8 windows) keep the XLA:CPU compile in bounds; the
    window machinery is identical at full width (shape-generic)."""
    rng = np.random.default_rng(4)
    ks = [2, 7, 11, 13, 1, 29, 3, 5]
    aff = [g2_mul(G2_GENERATOR, k) for k in ks]
    aff[3] = None                                   # identity handling
    pts = g2.from_affine_pairs(aff)
    svals = [int(rng.integers(1, 1 << 62)) for _ in ks]
    svals[5] = 0
    limbs = lb.limbs_from_ints(svals, 2)
    want = g2_msm(aff, svals)
    dev = jax.jit(g2._msm_pippenger_impl,
                  static_argnames=("c",))(limbs, pts)
    assert g2.to_affine_pairs((dev[0][None], dev[1][None],
                               dev[2][None]))[0] == want


def test_groth16_b_device_formula_matches_host():
    """prover._b_g2_device computes the same B = beta + s*delta + sum w_i B_i
    as the host branch (on the CPU backend its msm auto-routes to the host
    FQ2 Pippenger, so this checks the wiring/formula; the device kernel is
    covered by test_g2_msm_device_pippenger_matches_oracle)."""
    from node_fhe_accelerate_tpu.zk.groth16 import (
        CircuitBuilder, Groth16Prover, R)
    from node_fhe_accelerate_tpu.zk import pairing as pr

    cb = CircuitBuilder()
    x = cb.public_input()
    wv = cb.private_input()
    y = cb.mul(x, wv)
    cb.mul(y, wv)
    r1cs = cb.build()
    prover = Groth16Prover(rng_seed=7)
    setup = prover.setup(r1cs)
    from node_fhe_accelerate_tpu.zk.groth16 import evaluate_witness
    w = evaluate_witness(r1cs, {0: 1, 1: 3, 2: 2, 3: 6, 4: 12})
    s_s = 123456789

    got = prover._b_g2_device(setup, w, s_s)

    want = pr.g2_add(setup.beta_g2, pr.g2_mul(setup.delta_g2, s_s))
    pts, scs = [], []
    for i, wi in enumerate(w):
        if wi and setup.b_query_g2[i] is not None:
            pts.append(setup.b_query_g2[i])
            scs.append(wi)
    if pts:
        want = pr.g2_add(want, pr.g2_msm(pts, scs))
    assert got == want


@pytest.mark.slow
def test_bls12_381_g2_device_ops_match_oracle():
    from node_fhe_accelerate_tpu.zk.curve_g2 import bls12_381_g2
    from node_fhe_accelerate_tpu.zk import pairing_bls as prb

    b = bls12_381_g2()
    assert b.is_on_curve_affine(b.gen_affine[0], b.gen_affine[1])
    gen = b.generator()
    d2 = b.double(gen)
    d3 = b.add(d2, gen)
    aff2 = b.to_affine_pairs((d2[0][None], d2[1][None], d2[2][None]))[0]
    aff3 = b.to_affine_pairs((d3[0][None], d3[1][None], d3[2][None]))[0]
    assert aff2 == prb.g2_mul(prb.G2_GENERATOR, 2)
    assert aff3 == prb.g2_mul(prb.G2_GENERATOR, 3)
    # host msm fallback (affine fold) on a couple of points
    pts = b.from_affine_pairs([prb.G2_GENERATOR, aff2])
    import node_fhe_accelerate_tpu.ops.limbs as lb2
    out = b.msm(lb2.limbs_from_ints([3, 5], 8), pts, backend="host")
    want = prb.g2_mul(prb.G2_GENERATOR, 13)      # 3*1 + 5*2
    assert b.to_affine_pairs((out[0][None], out[1][None],
                              out[2][None]))[0] == want
