"""Poseidon / Blake2s transcript / Merkle vs Python big-int oracles."""
import numpy as np
import pytest
import jax.numpy as jnp

from node_fhe_accelerate_tpu.zk.field import bn254_fr
from node_fhe_accelerate_tpu.zk.hashes import (
    PoseidonHash, Blake2sHash, Transcript, MerkleTree,
)


@pytest.fixture(scope="module")
def poseidon():
    return PoseidonHash()


# -- int-domain oracle (replicates the reference algorithm) ------------------

def oracle_constants(q, t, rounds):
    seed = 0x506F736569646F6E
    out = []
    for _ in range(rounds * t):
        seed = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        limbs = [seed, seed ^ (seed >> 17), seed ^ ((seed << 23) % (1 << 64)),
                 (seed >> 32) ^ seed]
        while True:
            elem = sum(l << (64 * i) for i, l in enumerate(limbs))
            if elem < q:
                break
            limbs[3] >>= 1
        out.append(elem)
    return out


def oracle_permutation(state, q, t=3, fr=8, pr=57):
    rc = oracle_constants(q, t, fr + pr)
    mds = [[pow(i + t + j + 1, -1, q) for j in range(t)] for i in range(t)]

    def sbox(x):
        return pow(x, 5, q)

    r = 0
    for phase, count, partial in ((0, fr // 2, False), (1, pr, True),
                                  (2, fr // 2, False)):
        for _ in range(count):
            state = [(state[i] + rc[r * t + i]) % q for i in range(t)]
            if partial:
                state[0] = sbox(state[0])
            else:
                state = [sbox(x) for x in state]
            state = [sum(mds[i][j] * state[j] for j in range(t)) % q
                     for i in range(t)]
            r += 1
    return state


def test_poseidon_matches_oracle(poseidon):
    q = poseidon.f.q
    left, right = 123456789, 987654321
    got = int(poseidon.f.decode(
        poseidon.hash2(poseidon.f.encode([left])[0],
                       poseidon.f.encode([right])[0])))
    want = oracle_permutation([left, right, 0], q)[0]
    assert got == want


def test_poseidon_single_and_batch(poseidon):
    f = poseidon.f
    xs = f.encode([1, 2, 3, 4])
    batched = poseidon.hash(xs)
    for i, v in enumerate([1, 2, 3, 4]):
        single = poseidon.hash(f.encode([v])[0])
        assert int(f.decode(single)) == int(f.decode(batched[i]))


def test_poseidon_hash_many_sponge(poseidon):
    f = poseidon.f
    vals = [5, 6, 7, 8, 9]
    h = poseidon.hash_ints(vals)
    # Sponge oracle
    q = f.q
    state = [0, 0, 0]
    i = 0
    while i < len(vals):
        for r in range(2):
            if i < len(vals):
                state[r] = (state[r] + vals[i]) % q
                i += 1
        state = oracle_permutation(state, q)
    assert h == state[0]


def test_transcript_deterministic_and_fork():
    t1 = Transcript("test-proto")
    t2 = Transcript("test-proto")
    for t in (t1, t2):
        t.append_message("data", b"hello")
        t.append_u64("n", 42)
    q = bn254_fr().q
    c1 = t1.challenge_field_element("c", q)
    c2 = t2.challenge_field_element("c", q)
    assert c1 == c2 and 0 < c1 < q
    # Challenges chain: second differs from first
    assert t1.challenge_field_element("c", q) != c1
    # Fork diverges
    f1 = Transcript("test-proto")
    f1.append_message("data", b"hello")
    forked = f1.fork("branch")
    assert forked.challenge_bytes("x") != f1.challenge_bytes("x")


def test_transcript_order_sensitivity():
    a = Transcript("p")
    b = Transcript("p")
    a.append_message("l1", b"x")
    a.append_message("l2", b"y")
    b.append_message("l2", b"y")
    b.append_message("l1", b"x")
    assert a.challenge_bytes("c") != b.challenge_bytes("c")


@pytest.mark.slow
def test_merkle_tree(poseidon):
    f = poseidon.f
    leaves = f.encode(list(range(1, 9)))
    tree = MerkleTree(poseidon, leaves)
    for idx in [0, 3, 7]:
        path = tree.path(idx)
        assert tree.verify(leaves[idx], idx, path, tree.root)
    # wrong leaf fails
    assert not tree.verify(f.encode([999])[0], 0, tree.path(0), tree.root)
    # wrong index fails
    assert not tree.verify(leaves[1], 0, tree.path(0), tree.root)


def test_merkle_pads_to_power_of_two(poseidon):
    f = poseidon.f
    leaves = f.encode([1, 2, 3])
    tree = MerkleTree(poseidon, leaves)
    assert tree.levels[0].shape[0] == 4
    assert tree.verify(leaves[2], 2, tree.path(2), tree.root)


def test_blake2s():
    h = Blake2sHash.hash(b"abc")
    assert len(h) == 32
    import hashlib
    assert h == hashlib.blake2s(b"abc").digest()
