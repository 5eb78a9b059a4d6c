"""BLS12-381 optimal-ate pairing (zk/pairing_bls.py).

The reference has no BLS pairing (its G2 ops reuse G1 placeholders,
zk_elliptic_curve.cpp); these tests pin bilinearity, nondegeneracy, and
subgroup correctness of the real thing.  Host-side, pure int math.
"""
import pytest

from node_fhe_accelerate_tpu.zk import pairing_bls as pb


G1_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
G1_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1
G1 = (G1_X, G1_Y)


def g1_mul(pt, k):
    q = pb.P

    def dbl(p):
        x, y = p
        m = 3 * x * x * pow(2 * y, -1, q) % q
        nx = (m * m - 2 * x) % q
        return (nx, (m * (x - nx) - y) % q)

    def add(p, p2):
        if p is None:
            return p2
        if p2 is None:
            return p
        if p == p2:
            return dbl(p)
        if p[0] == p2[0]:
            return None  # P + (-P)
        m = (p2[1] - p[1]) * pow(p2[0] - p[0], -1, q) % q
        nx = (m * m - p[0] - p2[0]) % q
        return (nx, (m * (p[0] - nx) - p[1]) % q)

    acc, base = None, pt
    while k:
        if k & 1:
            acc = add(acc, base)
        base = dbl(base)
        k >>= 1
    return acc


@pytest.fixture(scope="module")
def e_gen():
    return pb.pairing(pb.G2_GENERATOR, G1)


class TestSubgroups:
    def test_g1_generator_on_curve_and_order(self):
        assert (G1_Y ** 2 - G1_X ** 3 - 4) % pb.P == 0
        assert g1_mul(G1, pb.R) is None

    def test_g2_generator_on_curve_and_order(self):
        assert pb.is_on_g2(pb.G2_GENERATOR)
        assert pb.g2_mul_unchecked(pb.G2_GENERATOR, pb.R) is None
        # exact order r (not a proper divisor): r is prime, so any
        # non-infinity point killed by r has order exactly r
        assert pb.G2_GENERATOR is not None

    def test_g2_group_law(self):
        g = pb.G2_GENERATOR
        assert pb.g2_add(pb.g2_add(g, g), g) == pb.g2_mul(g, 3)
        assert pb.g2_add(g, pb.g2_neg(g)) is None
        assert pb.is_on_g2(pb.g2_mul(g, 12345))


class TestPairing:
    def test_nondegenerate_and_order_r(self, e_gen):
        assert e_gen != pb.FQ12.one()
        assert e_gen ** pb.R == pb.FQ12.one()

    def test_bilinear_in_g1(self, e_gen):
        assert pb.pairing(pb.G2_GENERATOR, g1_mul(G1, 2)) == e_gen * e_gen

    def test_bilinear_in_g2(self, e_gen):
        assert pb.pairing(pb.g2_mul(pb.G2_GENERATOR, 2), G1) == e_gen * e_gen

    def test_joint_bilinearity(self, e_gen):
        got = pb.pairing(pb.g2_mul(pb.G2_GENERATOR, 3), g1_mul(G1, 2))
        assert got == e_gen ** 6

    def test_pairing_product_check(self):
        # e(5P, Q) * e(P, -5Q) == 1
        assert pb.pairing_check([
            (g1_mul(G1, 5), pb.G2_GENERATOR),
            (G1, pb.g2_neg(pb.g2_mul(pb.G2_GENERATOR, 5))),
        ])
        # and a broken product fails
        assert not pb.pairing_check([
            (g1_mul(G1, 5), pb.G2_GENERATOR),
            (G1, pb.g2_neg(pb.g2_mul(pb.G2_GENERATOR, 4))),
        ])


class TestKzgOverBls:
    """KZG commit/open/verify on BLS12-381 through the parameterized
    scheme — the pairing module selected by curve order."""

    @pytest.mark.slow
    def test_commit_open_verify(self):
        from node_fhe_accelerate_tpu.zk.commitments import KZGScheme
        from node_fhe_accelerate_tpu.zk.curve import bls12_381_g1

        kzg = KZGScheme(bls12_381_g1())
        assert kzg.pm is pb
        setup = kzg.setup(max_degree=7, seed=1)
        coeffs = [5, 0, 3, 11]              # 5 + 3x^2 + 11x^3
        C = kzg.commit(coeffs, setup)
        z = 9
        value, proof = kzg.open(coeffs, z, setup)
        assert value == (5 + 3 * z ** 2 + 11 * z ** 3) % kzg.r
        assert kzg.verify(C, z, value, proof, setup)
        assert not kzg.verify(C, z, value + 1, proof, setup)
