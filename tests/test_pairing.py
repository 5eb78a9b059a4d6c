"""BN254 optimal-ate pairing: bilinearity and non-degeneracy.

The reference has no real pairing (groth16.cpp:1113-1139); these tests pin
down that ours is the genuine article.
"""
import pytest

from node_fhe_accelerate_tpu.zk.pairing import (
    FQ2, FQ12, G2_GENERATOR, g2_add, g2_mul, g2_neg, is_on_g2,
    pairing, pairing_check,
)
from node_fhe_accelerate_tpu.zk.field import BN254_FR as R

G1 = (1, 2)


def g1_mul(k):
    # tiny affine double-and-add over ints for test fixtures
    from node_fhe_accelerate_tpu.zk.field import BN254_FQ as q

    def add(P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2 and (y1 + y2) % q == 0:
            return None
        if P == Q:
            lam = 3 * x1 * x1 * pow(2 * y1, -1, q) % q
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, q) % q
        x3 = (lam * lam - x1 - x2) % q
        return (x3, (lam * (x1 - x3) - y1) % q)

    acc, base = None, G1
    while k:
        if k & 1:
            acc = add(acc, base)
        base = add(base, base)
        k >>= 1
    return acc


def test_g2_generator_on_curve():
    assert is_on_g2(G2_GENERATOR)
    assert is_on_g2(g2_add(G2_GENERATOR, G2_GENERATOR))
    # order * G2 = infinity
    assert g2_mul(G2_GENERATOR, R) is None


def test_pairing_nondegenerate():
    e = pairing(G2_GENERATOR, G1)
    assert e != FQ12.one()
    # e has order dividing r
    assert e ** R == FQ12.one()


def test_pairing_bilinear():
    e = pairing(G2_GENERATOR, G1)
    # e(2P, Q) == e(P, Q)^2
    e2 = pairing(G2_GENERATOR, g1_mul(2))
    assert e2 == e * e
    # e(P, 2Q) == e(P, Q)^2
    e2b = pairing(g2_mul(G2_GENERATOR, 2), G1)
    assert e2b == e * e
    # e(aP, bQ) == e(P, Q)^(ab)
    eab = pairing(g2_mul(G2_GENERATOR, 5), g1_mul(3))
    assert eab == e ** 15


def test_pairing_check_identity():
    # e(P, Q) * e(-P, Q) == 1
    negP = (G1[0], (-G1[1]) % __import__(
        "node_fhe_accelerate_tpu.zk.field", fromlist=["BN254_FQ"]).BN254_FQ)
    assert pairing_check([(G1, G2_GENERATOR), (negP, G2_GENERATOR)])
    assert not pairing_check([(G1, G2_GENERATOR)])
