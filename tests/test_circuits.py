"""In-circuit Poseidon / Merkle / EligibilityCircuit tests.

Reference semantics: cpp/include/groth16.h:342-406 (EligibilityCircuit),
cpp/src/groth16.cpp:385-501, wired in src/api/voting-example.ts:627-701.
"""
import numpy as np
import pytest

from node_fhe_accelerate_tpu.zk.field import BN254_FR as R
from node_fhe_accelerate_tpu.zk.hashes import PoseidonHash, MerkleTree
from node_fhe_accelerate_tpu.zk.circuits import (
    GadgetBuilder, poseidon_hash2_gadget, EligibilityCircuit,
)
from node_fhe_accelerate_tpu.zk.groth16 import (
    Groth16Prover, Groth16Verifier, evaluate_witness,
)

@pytest.fixture(scope="module")
def poseidon():
    return PoseidonHash()


def test_poseidon_gadget_matches_host(poseidon):
    """The in-circuit Poseidon replays the host hash2 exactly."""
    b = GadgetBuilder()
    lw = b.input_wire()
    rw = b.input_wire()
    out = poseidon_hash2_gadget(b, {lw: 1}, {rw: 1}, poseidon)
    rng = np.random.default_rng(7)
    for _ in range(3):
        l = int(rng.integers(1, 1 << 62))
        r = int(rng.integers(1, 1 << 62))
        vals = b.compute_assignment({lw: l, rw: r})
        got = sum(co * vals[w] for w, co in out.items()) % R
        f = poseidon.f
        want = int(f.decode(poseidon.hash2(
            f.encode([l])[0], f.encode([r])[0])[None, :])[0])
        assert got == want


@pytest.mark.slow
def test_eligibility_witness_satisfies_r1cs(poseidon):
    depth = 3
    circ = EligibilityCircuit(depth, poseidon)
    # registry of 6 voters
    ids = [1001 + i for i in range(6)]
    leaves = poseidon.f.encode([circ.leaf(v) for v in ids])
    tree = MerkleTree(poseidon, leaves)
    root = int(poseidon.f.decode(tree.root[None, :])[0])

    idx = 4
    path = [int(poseidon.f.decode(s[None, :])[0]) for s in tree.path(idx)]
    bits = [(idx >> k) & 1 for k in range(depth)]
    wit = circ.generate_witness(ids[idx], 555, path, bits, root)
    # satisfiability is checked inside evaluate_witness
    w = evaluate_witness(circ.r1cs, wit.assignment)
    assert w[1] == root % R
    assert w[2] == circ.nullifier(ids[idx], 555) % R


def test_eligibility_non_member_fails(poseidon):
    depth = 2
    circ = EligibilityCircuit(depth, poseidon)
    ids = [17, 23, 99, 345]
    leaves = poseidon.f.encode([circ.leaf(v) for v in ids])
    tree = MerkleTree(poseidon, leaves)
    root = int(poseidon.f.decode(tree.root[None, :])[0])
    path = [int(poseidon.f.decode(s[None, :])[0]) for s in tree.path(0)]
    bits = [0, 0]
    # voter 7777 is not in the tree: the merkle-root constraint breaks
    wit = circ.generate_witness(7777, 1, path, bits, root)
    with pytest.raises(ValueError):
        evaluate_witness(circ.r1cs, wit.assignment)


def test_eligibility_groth16_end_to_end(poseidon):
    """Full SNARK: setup -> prove membership -> pairing verify; a tampered
    nullifier (ballot-stuffing attempt) must fail."""
    depth = 2
    circ = EligibilityCircuit(depth, poseidon)
    ids = [301, 302, 303, 304]
    leaves = poseidon.f.encode([circ.leaf(v) for v in ids])
    tree = MerkleTree(poseidon, leaves)
    root = int(poseidon.f.decode(tree.root[None, :])[0])

    prover = Groth16Prover(rng_seed=3)
    setup = prover.setup(circ.r1cs)

    idx = 2
    path = [int(poseidon.f.decode(s[None, :])[0]) for s in tree.path(idx)]
    bits = [(idx >> k) & 1 for k in range(depth)]
    wit = circ.generate_witness(ids[idx], 90210, path, bits, root)
    proof = prover.prove(setup, wit.assignment)

    verifier = Groth16Verifier()
    assert verifier.verify(setup, wit.public_inputs, proof)
    # wrong nullifier must not verify
    bad = [wit.public_inputs[0], (wit.public_inputs[1] + 1) % R]
    assert not verifier.verify(setup, bad, proof)
