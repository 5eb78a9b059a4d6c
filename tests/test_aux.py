"""Streaming processor, verifiable encryption, speculative PBS, adaptive
dispatcher, public verifier (SURVEY.md §2 components #11, #13, #30, #34)."""
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from node_fhe_accelerate_tpu.core.params import ParameterSet, FHEScheme
from node_fhe_accelerate_tpu.core.keys import KeyManager
from node_fhe_accelerate_tpu.core.encrypt import EncryptionEngine
from node_fhe_accelerate_tpu.core.streaming import (
    ChunkedCiphertextProcessor, StreamingAccumulator,
    CiphertextStreamProcessor, StreamingEquivalenceVerifier,
)
from node_fhe_accelerate_tpu.core.verifiable import (
    VerifiableEncryption, VerifiableDecryption, VoterReceipt,
)
from node_fhe_accelerate_tpu.core import threshold as th
from node_fhe_accelerate_tpu.core.bootstrap import TfheParams, TfheEngine
from node_fhe_accelerate_tpu.core.speculative import SpeculativePBS
from node_fhe_accelerate_tpu.utils.dispatch import AdaptiveDispatcher


def small_params(t=16):
    return ParameterSet(
        scheme=FHEScheme.TFHE, poly_degree=256, moduli=[1073479681],
        lwe_dimension=64, lwe_noise_std=3.2e-11, glwe_dimension=1,
        decomp_base_log=8, decomp_level=4, plaintext_modulus=t,
    )


@pytest.fixture(scope="module")
def eng_keys():
    params = small_params()
    eng = EncryptionEngine(params)
    km = KeyManager(params, eng.ring)
    sk = km.generate_secret_key(jax.random.PRNGKey(0))
    pk = km.generate_public_key(jax.random.PRNGKey(1), sk)
    return eng, sk, pk


class TestStreaming:
    def test_split_merge_round_trip(self, eng_keys):
        eng, sk, pk = eng_keys
        proc = ChunkedCiphertextProcessor(eng, chunk_size=64)
        ct = eng.encrypt(jax.random.PRNGKey(2), 7, pk)
        chunks = proc.split(ct)
        assert len(chunks) == 4
        back = proc.merge(chunks)
        assert eng.decode(eng.phase(back, sk))[0] == 7

    def test_chunked_add_equals_direct(self, eng_keys):
        eng, sk, pk = eng_keys
        proc = ChunkedCiphertextProcessor(eng, chunk_size=100)  # ragged
        a = eng.encrypt(jax.random.PRNGKey(3), 5, pk)
        b = eng.encrypt(jax.random.PRNGKey(4), 6, pk)
        direct = eng.add(a, b)
        chunked = proc.chunked_add(a, b)
        np.testing.assert_array_equal(np.asarray(direct.c0[0]),
                                      np.asarray(chunked.c0[0]))
        assert eng.decode(eng.phase(chunked, sk))[0] == 11

    def test_streaming_equivalence(self, eng_keys):
        eng, sk, pk = eng_keys
        cts = [eng.encrypt(jax.random.PRNGKey(10 + i), i % 4, pk)
               for i in range(10)]
        assert StreamingEquivalenceVerifier.verify_add(eng, cts,
                                                       batch_size=3)

    def test_accumulator_progress_and_count(self, eng_keys):
        eng, sk, pk = eng_keys
        seen = []
        acc = StreamingAccumulator(eng, batch_size=4,
                                   progress=lambda n: seen.append(n))
        for i in range(9):
            acc.push(eng.encrypt(jax.random.PRNGKey(30 + i), 1, pk))
        total = acc.result()
        assert acc.count == 9
        assert eng.decode(eng.phase(total, sk))[0] == 9
        assert seen  # progress fired

    def test_empty_stream_rejected(self, eng_keys):
        eng, sk, pk = eng_keys
        with pytest.raises(ValueError, match="empty"):
            StreamingAccumulator(eng).result()

    def test_chunked_multiply_equals_direct(self, eng_keys):
        eng, sk, pk = eng_keys
        a = eng.encrypt(jax.random.PRNGKey(40), 5, pk)
        b = eng.encrypt(jax.random.PRNGKey(41), 6, pk)
        assert StreamingEquivalenceVerifier.verify_multiply(
            eng, a, b, chunk_size=100)  # ragged chunks

    def test_async_stream_processor_backpressure(self, eng_keys):
        eng, sk, pk = eng_keys
        proc = CiphertextStreamProcessor(eng, batch_size=4, max_in_flight=2)
        for i in range(9):
            proc.push(eng.encrypt(jax.random.PRNGKey(50 + i), 1, pk))
        total = proc.result()
        assert proc.count == 9
        assert eng.decode(eng.phase(total, sk))[0] == 9


class TestVerifiableEncryption:
    def test_proof_round_trip(self, eng_keys):
        eng, sk, pk = eng_keys
        ve = VerifiableEncryption(eng)
        ct, proof = ve.encrypt_with_proof(jax.random.PRNGKey(5), 9, pk)
        assert eng.decode(eng.phase(ct, sk))[0] == 9
        assert ve.verify(ct, proof, pk)

    def test_tampered_ciphertext_rejected(self, eng_keys):
        eng, sk, pk = eng_keys
        ve = VerifiableEncryption(eng)
        ct, proof = ve.encrypt_with_proof(jax.random.PRNGKey(6), 3, pk)
        bad = eng.add_plain(ct, 1)
        assert not ve.verify(bad, proof, pk)

    def test_receipt(self, eng_keys):
        eng, sk, pk = eng_keys
        ve = VerifiableEncryption(eng)
        ct, proof = ve.encrypt_with_proof(jax.random.PRNGKey(7), 2, pk)
        rec = VoterReceipt.create(ct, proof)
        assert rec.matches(ct, proof)
        ct2, proof2 = ve.encrypt_with_proof(jax.random.PRNGKey(8), 2, pk)
        assert not rec.matches(ct2, proof2)


class TestVerifiableDecryption:
    """Decryption proofs (verifiable_encryption.h:96-126)."""

    def test_partial_decryption_proof_round_trip(self, eng_keys):
        eng, sk, pk = eng_keys
        ring = eng.ring
        key = jax.random.PRNGKey(11)
        tk = th.generate_threshold_keys(key, ring, 2, 3)
        ct = eng.encrypt(jax.random.PRNGKey(12), [5], eng_pk_for(eng, tk))
        vd = VerifiableDecryption(ring)
        share = tk.shares[0]
        com, e = vd.commit_share(jax.random.PRNGKey(13), share)
        partial = th.partial_decrypt(ring, ct.c1, share)
        proof = vd.prove(jax.random.PRNGKey(14), share, e, com, ct.c1,
                         partial)
        assert vd.verify(com, ct.c1, partial, proof)

    def test_forged_partial_rejected(self, eng_keys):
        eng, sk, pk = eng_keys
        ring = eng.ring
        tk = th.generate_threshold_keys(jax.random.PRNGKey(21), ring, 2, 3)
        ct = eng.encrypt(jax.random.PRNGKey(22), [1], eng_pk_for(eng, tk))
        vd = VerifiableDecryption(ring)
        share = tk.shares[1]
        com, e = vd.commit_share(jax.random.PRNGKey(23), share)
        partial = th.partial_decrypt(ring, ct.c1, share)
        # an official lying about their partial (shifting the tally)
        forged = th.PartialDecryption(
            share_id=share.share_id,
            partial=ring.add(partial.partial, eng.encode([1])))
        proof = vd.prove(jax.random.PRNGKey(24), share, e, com, ct.c1,
                         partial)
        assert not vd.verify(com, ct.c1, forged, proof)
        # proof bound to a different share's commitment fails too
        com2, _ = vd.commit_share(jax.random.PRNGKey(25), tk.shares[2])
        com2.share_id = share.share_id
        assert not vd.verify(com2, ct.c1, partial, proof)


def eng_pk_for(eng, tk):
    km = KeyManager(eng.params, eng.ring)
    return km.generate_public_key(jax.random.PRNGKey(99), tk.master_sk)


class TestSpeculativePBS:
    @pytest.mark.slow
    def test_multi_lut_and_select(self):
        p = TfheParams(n_lwe=8, poly_degree=64, glwe_dim=1,
                       pbs_base_log=7, pbs_level=3, ks_base_log=4,
                       ks_level=8, lwe_noise_std=0.0, glwe_noise_std=0.0,
                       plaintext_modulus=4)
        eng = TfheEngine(p)
        key = jax.random.PRNGKey(0)
        lwe_sk = eng.lwe_keygen(jax.random.fold_in(key, 0))
        glwe_sk = eng.glwe_keygen(jax.random.fold_in(key, 1))
        bsk = eng.generate_bootstrap_key(jax.random.fold_in(key, 2),
                                         lwe_sk, glwe_sk)
        spec = SpeculativePBS(eng)
        luts = [eng.make_lut(lambda x: x),
                eng.make_lut(lambda x: (x + 1) % 4)]
        ct = eng.lwe_encrypt(jax.random.PRNGKey(3),
                             jnp.array([1], jnp.uint32), lwe_sk)
        all_out = spec.run_all(ct, bsk, luts)
        dec0 = np.asarray(eng.lwe_decrypt(
            type(ct)(a=all_out.a[0], b=all_out.b[0]), lwe_sk))
        dec1 = np.asarray(eng.lwe_decrypt(
            type(ct)(a=all_out.a[1], b=all_out.b[1]), lwe_sk))
        assert dec0[0] == 1 and dec1[0] == 2
        sel = spec.run_and_select(ct, bsk, luts, 1)
        assert np.asarray(eng.lwe_decrypt(sel, lwe_sk))[0] == 2


class TestDispatcher:
    def test_selects_faster_candidate(self):
        d = AdaptiveDispatcher(warmup=1, iters=2)
        calls = {"slow": 0, "fast": 0}

        def slow(x):
            calls["slow"] += 1
            import time
            time.sleep(0.01)
            return x + 1

        def fast(x):
            calls["fast"] += 1
            return x + 1

        d.register("inc", "slow", slow)
        d.register("inc", "fast", fast)
        out = d.dispatch("inc", jnp.ones((4,)))
        np.testing.assert_array_equal(np.asarray(out), 2 * np.ones(4))
        table = d.selection_table()
        assert list(table.values())[0]["winner"] == "fast"
        # cached: dispatch again only calls the winner
        before = dict(calls)
        d.dispatch("inc", jnp.ones((4,)))
        assert calls["slow"] == before["slow"]

    def test_unknown_op_raises(self):
        with pytest.raises(KeyError):
            AdaptiveDispatcher().dispatch("nope", 1)


class TestPublicVerifier:
    def test_verify_clean_election(self):
        from node_fhe_accelerate_tpu.api.voting import VotingSystem
        from node_fhe_accelerate_tpu.api.verify import (
            PublicVerifier, VerificationPackage,
        )
        vs = VotingSystem("pv1", 2, threshold=(2, 3), enable_zk=False)
        vs.register_voter("a")
        vs.register_voter("b")
        vs.start_election()
        vs.submit_ballot("a", 0)
        vs.submit_ballot("b", 1)
        vs.end_election()
        vs.decrypt_tally([1, 2])
        pkg = VerificationPackage.from_voting_system(vs)
        progress = []
        res = PublicVerifier(
            progress=lambda i, n, msg: progress.append(msg)).verify_all(pkg)
        assert res.valid and res.audit_valid and res.nullifiers_unique
        assert res.tally_consistent
        rep = json.loads(PublicVerifier.json_report(pkg, res))
        assert rep["valid"]
        assert "VALID" in PublicVerifier.html_report(pkg, res)
        assert progress

    def test_detects_tampered_audit(self):
        from node_fhe_accelerate_tpu.api.voting import VotingSystem
        from node_fhe_accelerate_tpu.api.verify import (
            PublicVerifier, VerificationPackage,
        )
        vs = VotingSystem("pv2", 2, threshold=(2, 3), enable_zk=False)
        vs.register_voter("a")
        vs.start_election()
        vs.submit_ballot("a", 1)
        pkg = VerificationPackage.from_voting_system(vs)
        tampered = json.loads(pkg.audit_json)
        tampered[0]["actor_id"] = "evil"
        pkg.audit_json = json.dumps(tampered)
        res = PublicVerifier().verify_all(pkg)
        assert not res.valid and not res.audit_valid


class TestResumableUpload:
    """Resumable ballot uploads (SURVEY §5.3; requirements.md:304 req 16.2)."""

    def test_interrupt_resume_round_trip(self, eng_keys):
        from node_fhe_accelerate_tpu.core.streaming import (
            ResumableUpload, ResumableUploadReceiver)
        import os as _os
        payload = _os.urandom(300_000)
        up = ResumableUpload(chunk_size=1 << 16)
        rx = ResumableUploadReceiver(chunk_size=1 << 16)
        # send 2 chunks, then "crash"
        for i, ch in enumerate(up.chunks("b1", payload)):
            if i == 2:
                break
            assert rx.receive(ch)
        assert rx.offset("b1") == 2 * (1 << 16)
        # resume from the receiver's offset
        for ch in up.chunks("b1", payload, start_offset=rx.offset("b1")):
            assert rx.receive(ch)
        assert rx.complete("b1", len(payload)) == payload

    def test_corrupt_chunk_retransmitted(self):
        from node_fhe_accelerate_tpu.core.streaming import (
            ResumableUpload, ResumableUploadReceiver)
        payload = bytes(range(256)) * 1000
        up = ResumableUpload(chunk_size=1 << 12)
        rx = ResumableUploadReceiver(chunk_size=1 << 12)
        chunks = list(up.chunks("b2", payload))
        uid, idx, off, crc, data = chunks[1]
        bad = (uid, idx, off, crc, bytes([data[0] ^ 0xFF]) + data[1:])
        assert rx.receive(chunks[0])
        assert not rx.receive(bad)           # CRC rejects, no exception
        assert rx.offset("b2") == 1 << 12     # progress unchanged
        for ch in chunks[1:]:
            assert rx.receive(ch)
        assert rx.complete("b2", len(payload)) == payload

    def test_incomplete_upload_rejected(self):
        from node_fhe_accelerate_tpu.core.streaming import (
            ResumableUpload, ResumableUploadReceiver)
        import pytest as _pt
        payload = b"x" * 50_000
        up = ResumableUpload(chunk_size=1 << 14)
        rx = ResumableUploadReceiver(chunk_size=1 << 14)
        chunks = list(up.chunks("b3", payload))
        rx.receive(chunks[0])
        rx.receive(chunks[2])                 # gap at 1
        with _pt.raises(ValueError, match="missing"):
            rx.complete("b3", len(payload))
