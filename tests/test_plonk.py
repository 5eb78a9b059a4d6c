"""PLONK prove/verify with KZG + real pairing openings."""
import pytest

from node_fhe_accelerate_tpu.zk.plonk import (
    PlonkCircuit, PlonkProver, PlonkVerifier, tally_correctness_circuit,
)
from node_fhe_accelerate_tpu.zk.field import BN254_FR as R


@pytest.fixture(scope="module")
def mult_setup():
    # prove knowledge of x, y with x*y = z (public z)
    c = PlonkCircuit()
    z = c.public_input()
    x = c.new_var()
    y = c.new_var()
    xy = c.mul(x, y)
    c.assert_equal(xy, z)
    prover = PlonkProver()
    setup = prover.setup(c, kzg_seed=1)
    return c, setup, prover, PlonkVerifier(), (z, x, y, xy)


def test_prove_verify(mult_setup):
    c, setup, prover, verifier, (z, x, y, xy) = mult_setup
    proof = prover.prove(setup, {z: 42, x: 6, y: 7, xy: 42}, [42])
    assert verifier.verify(setup, [42], proof)


def test_wrong_public_rejected(mult_setup):
    c, setup, prover, verifier, (z, x, y, xy) = mult_setup
    proof = prover.prove(setup, {z: 42, x: 6, y: 7, xy: 42}, [42])
    assert not verifier.verify(setup, [41], proof)


def test_bad_witness_rejected_at_prove(mult_setup):
    c, setup, prover, verifier, (z, x, y, xy) = mult_setup
    with pytest.raises(ValueError, match="unsatisfied"):
        prover.prove(setup, {z: 42, x: 5, y: 7, xy: 42}, [42])


def test_tampered_eval_rejected(mult_setup):
    c, setup, prover, verifier, (z, x, y, xy) = mult_setup
    proof = prover.prove(setup, {z: 42, x: 6, y: 7, xy: 42}, [42])
    proof.evals["a"] = (proof.evals["a"] + 1) % R
    assert not verifier.verify(setup, [42], proof)


def test_proof_size_and_two_pairings(mult_setup):
    """VERDICT item 4 'done' criteria: proof <= ~1KB, verify = exactly one
    pairing_check call over exactly 2 pairs (plonk.cpp:693-720's batched
    shape; the reference itself never ran a real pairing)."""
    c, setup, prover, verifier, (z, x, y, xy) = mult_setup
    proof = prover.prove(setup, {z: 42, x: 6, y: 7, xy: 42}, [42])
    assert set(proof.commits) == {"a", "b", "c", "z", "t_lo", "t_mid",
                                  "t_hi", "w_z", "w_zw"}
    assert set(proof.evals) == {"a", "b", "c", "s1", "s2", "z_w"}
    size = 64 * len(proof.commits) + 32 * len(proof.evals)
    assert size <= 1024, size       # 768 B uncompressed

    calls = []
    real = verifier.scheme.pm.pairing_check

    def spy(pairs):
        calls.append(len(pairs))
        return real(pairs)

    verifier.scheme.pm.pairing_check = spy
    try:
        assert verifier.verify(setup, [42], proof)
    finally:
        verifier.scheme.pm.pairing_check = real
    assert calls == [2]


def test_zero_knowledge_blinding(mult_setup):
    """Two proofs of the SAME witness must differ in every commitment and
    every claimed evaluation (the blinders randomize them), yet both
    verify — the hiding property the reference never had."""
    c, setup, prover, verifier, (z, x, y, xy) = mult_setup
    assign = {z: 42, x: 6, y: 7, xy: 42}
    p1 = prover.prove(setup, assign, [42])
    p2 = prover.prove(setup, assign, [42])
    assert verifier.verify(setup, [42], p1)
    assert verifier.verify(setup, [42], p2)
    for name in ("a", "b", "c", "z", "t_lo", "t_mid", "t_hi"):
        assert p1.commits[name] != p2.commits[name], name
    for name in ("a", "b", "c", "z_w"):
        assert p1.evals[name] != p2.evals[name], name


def test_tally_correctness_circuit():
    circuit, ballots, total = tally_correctness_circuit(3)
    prover = PlonkProver()
    setup = prover.setup(circuit, kzg_seed=2)
    verifier = PlonkVerifier()
    # 1 + 2 + 3 = 6: need intermediate accumulator wires too
    assign = {total: 6, ballots[0]: 1, ballots[1]: 2, ballots[2]: 3}
    # derive accumulator variables from the gate list
    acc_val = 1
    for g in circuit.gates:
        if g.qm == 0 and g.ql == 1 and g.qr == 1:  # add gate
            a = assign.get(g.a, acc_val)
            b = assign[g.b]
            acc_val = (a + b) % R
            assign[g.c] = acc_val
    proof = prover.prove(setup, assign, [6])
    assert verifier.verify(setup, [6], proof)
    assert not verifier.verify(setup, [7], proof)
