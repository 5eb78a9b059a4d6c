"""Golden vectors pinning the byte-compatibility surfaces.

The repo claims transcript/Poseidon byte-compatibility with the reference
spec (zk_hash.cpp:36-84 LCG-seeded constants; :513-603 transcript
framing).  The reference ships only prebuilt ARM binaries, so parity can't
be executed here — these fixtures pin OUR canonical outputs so the
compatibility surface cannot silently drift across refactors (VERDICT.md
round-1 weak #10).  Any intentional change to these values is a
serialization-breaking event and must be versioned.

Vectors generated 2026-08-18 from zk/hashes.py at commit 8a3c51f.
"""
from node_fhe_accelerate_tpu.zk.hashes import (
    PoseidonHash, Transcript, Blake2sHash,
)

GOLDEN_POSEIDON = {
    (1,): 0x28c8e0346230df0b1332cabf23cd8e12da3e4c0572d9356390a2e4624757d3e8,
    (1, 2): 0x3fc16de2dd45833348e22bc18de0e5f9c12d7f4203ee19f0c34c15229db9082,
    (1, 2, 3, 4, 5):
        0x26cafb1310f69e2b8767092af1f56ef45cd44a2f7142d6eae2fc4f2cc3332a56,
    (0,): 0x2cbf9a86f92a1a17bfc5a2a2bd66eeaaa4b33f77f776341a048da6e0315fba87,
    ("q-1", "q-2"):
        0x4217f3648ac9456546c300e46c996ab8503bc9e1e9d577629a6369ea7f897d9,
}

GOLDEN_TRANSCRIPT_CHALLENGE = (
    "e6c28d044e5649ee1e54ede4e8ebd675645bb0c2c95c5ad3570016d851d36b34")
GOLDEN_TRANSCRIPT_FE = (
    0xcec683da1f5e6d5fa63b1193d32b199f965c5f26e5b8d5c34c9109faadf7470)
GOLDEN_FORK_CHALLENGE = (
    "442bcb54f7dcdbb72e82ecdecf6024a695cb9924b59edc8f52ba82f93dd708af")
GOLDEN_BLAKE2S = (
    "42006ec8a0fb2d21a7ad5dd2b6d857bbafc0891600e8905c7fffdcbe9ced1d74")


class TestPoseidonGolden:
    def test_fixed_vectors(self):
        p = PoseidonHash()
        q = p.f.q
        for ins, want in GOLDEN_POSEIDON.items():
            vals = [q - 1 if v == "q-1" else q - 2 if v == "q-2" else v
                    for v in ins]
            assert p.hash_ints(vals) == want, f"poseidon{ins} drifted"

    def test_constants_are_lcg_seeded(self):
        """First LCG step from the 'Poseidon' seed (zk_hash.cpp:36-84)."""
        seed = 0x506F736569646F6E
        first = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        assert first == 0x19D6AA7AD45CA9A5


class TestTranscriptGolden:
    def _build(self):
        p = PoseidonHash()
        t = Transcript("test-proto")
        t.append_u64("n", 42)
        t.append_field_element("x", 1234567890123456789)
        t.append_point("P", (3, 17, False))
        return t, p.f.q

    def test_challenge_bytes(self):
        t, _ = self._build()
        assert t.challenge_bytes("alpha").hex() == GOLDEN_TRANSCRIPT_CHALLENGE

    def test_challenge_field_element_and_fork(self):
        t, q = self._build()
        t.challenge_bytes("alpha")
        assert t.challenge_field_element("beta", q) == GOLDEN_TRANSCRIPT_FE
        fk = t.fork("branch")
        assert fk.challenge_bytes("gamma").hex() == GOLDEN_FORK_CHALLENGE
        # forking must not disturb the parent
        t2, _ = self._build()
        t2.challenge_bytes("alpha")
        t2.challenge_field_element("beta", q)
        assert t2.fork("branch").challenge_bytes("gamma").hex() == \
            GOLDEN_FORK_CHALLENGE

    def test_blake2s(self):
        assert Blake2sHash.hash(b"node-fhe-accelerate").hex() == GOLDEN_BLAKE2S
