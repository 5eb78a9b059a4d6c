"""Groth16 with the real BN254 pairing: completeness + soundness.

The reference's groth16 tests run against a structural pairing
(groth16.cpp:1113-1139); these are the genuine checks.
"""
import pytest

from node_fhe_accelerate_tpu.zk.groth16 import (
    CircuitBuilder, Groth16Prover, Groth16Verifier, evaluate_witness,
)
from node_fhe_accelerate_tpu.zk.field import BN254_FR as R


def mult_circuit():
    """Prove knowledge of x, y with x * y = z (z public)."""
    cb = CircuitBuilder()
    z = cb.public_input()
    x = cb.private_input()
    y = cb.private_input()
    xy = cb.mul(x, y)
    cb.assert_equal(xy, z)
    return cb.build(), z, x, y, xy


@pytest.fixture(scope="module")
def setup():
    r1cs, z, x, y, xy = mult_circuit()
    prover = Groth16Prover(rng_seed=5)
    s = prover.setup(r1cs)
    return r1cs, s, prover, Groth16Verifier(), (z, x, y, xy)


def test_witness_evaluation():
    r1cs, z, x, y, xy = mult_circuit()
    w = evaluate_witness(r1cs, {z: 42, x: 6, y: 7, xy: 42})
    assert w[0] == 1
    with pytest.raises(ValueError, match="witness"):
        evaluate_witness(r1cs, {z: 43, x: 6, y: 7, xy: 42})


def test_prove_verify_roundtrip(setup):
    r1cs, s, prover, verifier, (z, x, y, xy) = setup
    proof = prover.prove(s, {z: 42, x: 6, y: 7, xy: 42})
    assert verifier.verify(s, [42], proof)


def test_wrong_public_input_rejected(setup):
    r1cs, s, prover, verifier, (z, x, y, xy) = setup
    proof = prover.prove(s, {z: 42, x: 6, y: 7, xy: 42})
    assert not verifier.verify(s, [41], proof)


def test_tampered_proof_rejected(setup):
    r1cs, s, prover, verifier, (z, x, y, xy) = setup
    proof = prover.prove(s, {z: 42, x: 6, y: 7, xy: 42})
    bad_a = (proof.a[0], (proof.a[1] + 1))
    from node_fhe_accelerate_tpu.zk.groth16 import Groth16Proof
    assert not verifier.verify(s, [42],
                               Groth16Proof(a=bad_a, b=proof.b, c=proof.c))


def test_boolean_constraint():
    cb = CircuitBuilder()
    b = cb.public_input()
    cb.assert_bool(b)
    r1cs = cb.build()
    evaluate_witness(r1cs, {b: 0})
    evaluate_witness(r1cs, {b: 1})
    with pytest.raises(ValueError):
        evaluate_witness(r1cs, {b: 2})


def test_h_pipeline_quotient_identity():
    """The size-d CRT h pipeline (groth16.py _h_limbs_host/_pipeline) must
    produce exactly h = (A*B - C) / (x^d + 1): verified here against a
    schoolbook QAP construction on host big ints."""
    import numpy as np
    from node_fhe_accelerate_tpu.zk.groth16 import _CompiledCircuit

    r1cs, z, x, y, xy = mult_circuit()
    d = 4  # next pow2 >= num_constraints (2)
    circ = _CompiledCircuit(r1cs, d)
    w = evaluate_witness(r1cs, {1: 21, 2: 3, 3: 7, 4: 21})
    limbs = circ._h_limbs_host(w)
    h = [int.from_bytes(bytes(row.view(np.uint8)), "little")
         for row in np.ascontiguousarray(limbs)]

    # schoolbook: interpolate per-wire QAP polys over circ.ntt.points,
    # assemble A,B,C from the witness, long-divide by x^d + 1
    q = circ.f.q
    ae, be, ce = [[0] * d for _ in range(3)]
    for j, (a, b, c) in enumerate(r1cs.constraints):
        ae[j] = sum(co * w[i] for i, co in a.items()) % q
        be[j] = sum(co * w[i] for i, co in b.items()) % q
        ce[j] = sum(co * w[i] for i, co in c.items()) % q
    A = circ.ntt.interpolate_ints(np.array(ae, object))
    B = circ.ntt.interpolate_ints(np.array(be, object))
    C = circ.ntt.interpolate_ints(np.array(ce, object))
    prod = [0] * (2 * d)
    for i in range(d):
        for j in range(d):
            prod[i + j] = (prod[i + j] + int(A[i]) * int(B[j])) % q
    num = prod[:]
    for i in range(d):
        num[i] = (num[i] - int(C[i])) % q
    # divide by x^d + 1: h_k = coefficient d+k of the numerator, and the
    # remainder num[k] - h_k must vanish
    for k in range(d):
        hk = num[d + k] if d + k < 2 * d else 0
        assert h[k] == hk
        assert (num[k] - hk) % q == 0
