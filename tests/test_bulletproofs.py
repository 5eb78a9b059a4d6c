"""Bulletproofs range proofs + inner-product argument end-to-end.

Mirrors the reference's bulletproofs property tests
(src/test-utils/bulletproofs.prop.test.ts): completeness for in-range
values, soundness rejections (tampered proof / wrong commitment)."""
import numpy as np
import pytest

from node_fhe_accelerate_tpu.zk.bulletproofs import (
    BulletproofsGens, BulletproofsProver, BulletproofsVerifier,
)
from node_fhe_accelerate_tpu.zk.curve import bn254_g1

N_BITS = 4


@pytest.fixture(scope="module")
def setup():
    curve = bn254_g1()
    gens = BulletproofsGens.generate(curve, N_BITS)
    prover = BulletproofsProver(curve, rng_seed=7)
    verifier = BulletproofsVerifier(curve)
    return curve, gens, prover, verifier


@pytest.mark.slow
def test_range_proof_roundtrip(setup):
    curve, gens, prover, verifier = setup
    value, blinding = 12, prover.random_scalar()
    com = prover.commit(value, blinding, gens)
    proof = prover.prove_range(value, blinding, N_BITS, gens)
    assert verifier.verify_range(com, proof, N_BITS, gens)


def test_range_proof_boundaries(setup):
    curve, gens, prover, verifier = setup
    for value in [0, 15]:
        blinding = prover.random_scalar()
        com = prover.commit(value, blinding, gens)
        proof = prover.prove_range(value, blinding, N_BITS, gens)
        assert verifier.verify_range(com, proof, N_BITS, gens), value


def test_out_of_range_value_rejected_at_prove(setup):
    curve, gens, prover, verifier = setup
    with pytest.raises(ValueError, match="out of range"):
        prover.prove_range(16, 1, N_BITS, gens)


def test_tampered_proof_rejected(setup):
    curve, gens, prover, verifier = setup
    value, blinding = 9, prover.random_scalar()
    com = prover.commit(value, blinding, gens)
    proof = prover.prove_range(value, blinding, N_BITS, gens)
    proof.t_hat = (proof.t_hat + 1) % curve.order
    assert not verifier.verify_range(com, proof, N_BITS, gens)


def test_wrong_commitment_rejected(setup):
    curve, gens, prover, verifier = setup
    value, blinding = 7, prover.random_scalar()
    proof = prover.prove_range(value, blinding, N_BITS, gens)
    other = prover.commit(8, blinding, gens)  # different value
    assert not verifier.verify_range(other, proof, N_BITS, gens)


def test_tampered_ipa_rejected(setup):
    curve, gens, prover, verifier = setup
    value, blinding = 13, prover.random_scalar()
    com = prover.commit(value, blinding, gens)
    proof = prover.prove_range(value, blinding, N_BITS, gens)
    proof.inner.a = (proof.inner.a + 1) % curve.order
    assert not verifier.verify_range(com, proof, N_BITS, gens)


@pytest.mark.slow
def test_aggregated_range_proof_roundtrip(setup):
    """m=4 values in one proof (reference: aggregated bulletproofs.cpp
    path + BallotValidityProof, bulletproofs.h:199)."""
    curve, _, prover, verifier = setup
    m, n = 4, N_BITS
    gens = BulletproofsGens.generate(curve, m * n)
    values = [0, 5, 15, 9]
    blinds = [prover.random_scalar() for _ in values]
    coms = [prover.commit(v, b, gens) for v, b in zip(values, blinds)]
    proof = prover.prove_range_aggregated(values, blinds, n, gens)
    assert verifier.verify_range_aggregated(coms, proof, n, gens)
    # wrong commitment order must fail
    assert not verifier.verify_range_aggregated(coms[::-1], proof, n, gens)


def test_aggregated_rejects_out_of_range(setup):
    curve, _, prover, verifier = setup
    gens = BulletproofsGens.generate(curve, 2 * N_BITS)
    with pytest.raises(ValueError):
        prover.prove_range_aggregated([3, 16], [1, 2], N_BITS, gens)
