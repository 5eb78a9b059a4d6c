"""Curve group law vs Python big-int Jacobian oracle (reference
zk_elliptic_curve tests)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from node_fhe_accelerate_tpu.zk.curve import bn254_g1, bls12_381_g1
from node_fhe_accelerate_tpu.ops import limbs as lb


# -- host oracle -------------------------------------------------------------

def aff_add(P, Q, q, b):
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2:
        if (y1 + y2) % q == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, q) % q
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, q) % q
    x3 = (lam * lam - x1 - x2) % q
    y3 = (lam * (x1 - x3) - y1) % q
    return (x3, y3)


def aff_mul(k, P, q, b):
    acc = None
    base = P
    while k:
        if k & 1:
            acc = aff_add(acc, base, q, b)
        base = aff_add(base, base, q, b)
        k >>= 1
    return acc


@pytest.fixture(scope="module", params=["bn254", "bls12_381"])
def curve(request):
    return bn254_g1() if request.param == "bn254" else bls12_381_g1()


def test_generator_on_curve(curve):
    gx, gy = curve.gen_affine
    assert curve.is_on_curve_affine(gx, gy)


def test_double_and_add_match_oracle(curve):
    q = curve.fq.q
    g = curve.generator()
    d = curve.double(g)
    x, y, inf = curve.to_affine_ints(d)
    want = aff_mul(2, curve.gen_affine, q, curve.b)
    assert not inf and (int(x), int(y)) == want

    t = curve.add(d, g)  # 3G via add
    x, y, inf = curve.to_affine_ints(t)
    want3 = aff_mul(3, curve.gen_affine, q, curve.b)
    assert not inf and (int(x), int(y)) == want3


def test_add_equal_points_doubles(curve):
    g = curve.generator()
    via_add = curve.add(g, g)
    via_dbl = curve.double(g)
    assert bool(np.asarray(curve.eq(via_add, via_dbl)))


def test_add_inverse_gives_infinity(curve):
    g = curve.generator()
    s = curve.add(g, curve.negate(g))
    assert bool(np.asarray(curve.is_infinity(s)))


def test_infinity_identity(curve):
    g = curve.generator()
    inf = curve.infinity()
    assert bool(np.asarray(curve.eq(curve.add(g, inf), g)))
    assert bool(np.asarray(curve.eq(curve.add(inf, g), g)))


@pytest.mark.slow
def test_scalar_mul_matches_oracle(curve):
    q = curve.fq.q
    ks = [1, 2, 5, 12345, curve.order - 1]
    limbs = lb.limbs_from_ints(ks, 8)
    g = curve.generator()
    out = jax.jit(curve.scalar_mul)(limbs, g)
    xs, ys, infs = curve.to_affine_ints(out)
    for i, k in enumerate(ks):
        want = aff_mul(k, curve.gen_affine, q, curve.b)
        assert not infs[i]
        assert (int(xs[i]), int(ys[i])) == want
    # order * G = infinity
    zero = lb.limbs_from_ints([curve.order], 8)
    out0 = curve.scalar_mul(zero, g)
    assert bool(np.asarray(curve.is_infinity(out0))[0])


def test_msm_matches_sum(curve):
    q = curve.fq.q
    rng = np.random.default_rng(0)
    ks = [int(rng.integers(1, 1 << 62)) for _ in range(4)]
    # points: k_i * G as bases, scalars s_i
    ss = [3, 7, 11, 1]
    base_pts = [aff_mul(k, curve.gen_affine, q, curve.b) for k in ks]
    P = curve.from_affine_ints([p[0] for p in base_pts],
                               [p[1] for p in base_pts])
    s_limbs = lb.limbs_from_ints(ss, 8)
    got = curve.msm(s_limbs, P)
    gx, gy, ginf = curve.to_affine_ints(got)
    want = None
    for s, p in zip(ss, base_pts):
        want = aff_add(want, aff_mul(s, p, q, curve.b), q, curve.b)
    assert not ginf
    assert (int(gx), int(gy)) == want


@pytest.mark.slow
def test_msm_pippenger_matches_naive():
    """Sorted-scan Pippenger == per-point ladder MSM at a real batch size
    (random full-width scalars, mixed points incl. repeats/infinity)."""
    curve = bn254_g1()
    rng = np.random.default_rng(42)
    n = 192
    base = curve.generator((1,))
    # points: k_i * G with small k via device scalar_mul (trusted above)
    ks = [int(rng.integers(1, 1 << 16)) for _ in range(n)]
    P = curve.scalar_mul(lb.limbs_from_ints(ks, 8),
                         (base[0][0], base[1][0], base[2][0]))
    # a few infinities in the batch exercise identity handling
    infmask = np.zeros(n, bool)
    infmask[[5, 77]] = True
    Z = jnp.where(jnp.asarray(infmask)[:, None], jnp.zeros_like(P[2]), P[2])
    P = (P[0], P[1], Z)
    ss = [int.from_bytes(rng.bytes(32), "little") % curve.order
          for _ in range(n)]
    ss[9] = 0
    s_limbs = lb.limbs_from_ints(ss, 8)
    via_pip = jax.jit(curve._msm_pippenger_impl,
                      static_argnames=("c",))(s_limbs, P)
    via_naive = curve.msm(s_limbs, P, min_pippenger=1 << 30)
    assert bool(np.asarray(curve.eq(via_pip, via_naive)))
    # and the public dispatcher picks Pippenger at this size
    via_msm = curve.msm(s_limbs, P)
    assert bool(np.asarray(curve.eq(via_msm, via_naive)))


def test_msm_chunk_spans_cover_and_sanitize():
    """Span logic of the device MSM's binary-decomposition chunking
    (ADVICE r4): descending power-of-two chunks + ragged tail must cover
    [0, n) exactly, and the NFA_MSM_CHUNK sanitizer must clamp/round."""
    from node_fhe_accelerate_tpu.zk.curve import msm_chunk_spans

    for n, mc in [(1025, 1024), (2563, 1024), (16384 + 1, 16384),
                  (3 * 4096 + 7, 4096), (65536, 16384)]:
        spans = msm_chunk_spans(n, mc)
        # exact disjoint cover, in order
        off = 0
        for o, sz in spans:
            assert o == off and sz > 0
            off += sz
        assert off == n
        # every non-tail chunk is a power of two <= max_chunk
        for o, sz in spans[:-1]:
            assert sz & (sz - 1) == 0 and sz <= mc
        assert spans[-1][1] <= mc

    # sanitizer in Curve.msm: <= 0 and non-power-of-two values
    import os
    curve = bn254_g1()
    for bad in ("0", "-5", "3000"):
        os.environ["NFA_MSM_CHUNK"] = bad
        try:
            mc = int(os.environ["NFA_MSM_CHUNK"])
            if mc < 1024:
                mc = 1024
            mc = 1 << (mc.bit_length() - 1)
            assert mc >= 1024 and mc & (mc - 1) == 0
            # the sanitized value always terminates the span loop
            spans = msm_chunk_spans(4097, mc)
            assert sum(sz for _, sz in spans) == 4097
        finally:
            del os.environ["NFA_MSM_CHUNK"]


@pytest.mark.slow
def test_msm_device_chunked_ragged_matches_host():
    """Device-backend chunked MSM at a ragged n with a small chunk
    (descending spans + tail path) vs the host Pippenger (ADVICE r4:
    this path previously ran only in device bench runs)."""
    import os
    curve = bn254_g1()
    rng = np.random.default_rng(7)
    n = 1281   # spans: (0,1024) + tail 257 with chunk 1024
    base = curve.generator((1,))
    ks = [int(rng.integers(1, 1 << 12)) for _ in range(n)]
    P = curve.scalar_mul(lb.limbs_from_ints(ks, 8),
                         (base[0][0], base[1][0], base[2][0]))
    ss = [int.from_bytes(rng.bytes(32), "little") % curve.order
          for _ in range(n)]
    s_limbs = lb.limbs_from_ints(ss, 8)
    want = curve.msm(s_limbs, P, backend="host")
    os.environ["NFA_MSM_CHUNK"] = "1024"
    try:
        got = curve.msm(s_limbs, P, backend="device")
    finally:
        del os.environ["NFA_MSM_CHUNK"]
    assert bool(np.asarray(curve.eq(got, want)))
