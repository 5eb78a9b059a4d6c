"""Verifiable encryption: sigma-protocol proofs of correct RLWE encryption.

Twin of the reference's `VerifiableEncryption`
(cpp/include/verifiable_encryption.h:26-126,
cpp/src/verifiable_encryption.cpp:97-242): commitment to fresh randomness,
Fiat-Shamir challenge from hashed commitments, linear response equation
checked over the ring:

    a * z_u + z_e == w + gamma * c     (per ciphertext component)

Plus the application wrappers the reference exposes: ballot validity proof,
voter receipt, decryption (partial-share) proof.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import jax

from .poly import PolyRing
from .encrypt import EncryptionEngine, Ciphertext
from .keys import PublicKey
from ..ops.u64 import u64_to_np, u64_from_np

__all__ = ["EncryptionProof", "VerifiableEncryption", "VoterReceipt",
           "ShareCommitment", "DecryptionProof", "VerifiableDecryption"]


def _hash_polys(*polys, q: int) -> int:
    h = hashlib.sha256()
    for p in polys:
        h.update(np.ascontiguousarray(u64_to_np(p)).tobytes())
    # small challenge space like the reference's hashed-commitment challenge
    return int.from_bytes(h.digest(), "little") % (1 << 32)


@dataclass
class EncryptionProof:
    """(verifiable_encryption.h EncryptionProof)"""
    w0: tuple                 # commitment for the c0 relation
    w1: tuple                 # commitment for the c1 relation
    z_u: tuple                # response: r_u + gamma * u
    z_e0: tuple               # r_e0 + gamma * (e1 + m)
    z_e1: tuple               # r_e1 + gamma * e2
    gamma: int


class VerifiableEncryption:
    def __init__(self, engine: EncryptionEngine):
        self.engine = engine
        self.ring: PolyRing = engine.ring

    # -- prover --------------------------------------------------------------
    def encrypt_with_proof(self, key, value: int, pk: PublicKey
                           ) -> tuple:
        """Encrypt and produce a proof of well-formedness.

        Returns (ciphertext, proof).  The prover re-derives the encryption
        randomness (u, e1, e2) so the relation holds exactly:
            c0 = pk.b * u + (e1 + m),   c1 = pk.a * u + e2.
        """
        ring = self.ring
        eng = self.engine
        m = eng.encode(value)
        k_u, k_e1, k_e2, k_r1, k_r2, k_r3 = jax.random.split(key, 6)
        u = ring.sample_ternary(k_u)
        e1 = ring.sample_gaussian(k_e1, eng._noise_std)
        e2 = ring.sample_gaussian(k_e2, eng._noise_std)
        c0 = ring.add(ring.add(ring.multiply(pk.b, u), e1), m)
        c1 = ring.add(ring.multiply(pk.a, u), e2)
        ct = Ciphertext(c0=c0, c1=c1,
                        noise_budget=eng.initial_noise_budget,
                        key_id=pk.key_id)

        # commitments with fresh randomness
        r_u = ring.sample_uniform(k_r1)
        r_e0 = ring.sample_uniform(k_r2)
        r_e1 = ring.sample_uniform(k_r3)
        w0 = ring.add(ring.multiply(pk.b, r_u), r_e0)
        w1 = ring.add(ring.multiply(pk.a, r_u), r_e1)

        gamma = _hash_polys(pk.a, pk.b, c0, c1, w0, w1, q=ring.q)

        e0_plus_m = ring.add(e1, m)
        z_u = ring.add(r_u, ring.scalar_mul(u, gamma))
        z_e0 = ring.add(r_e0, ring.scalar_mul(e0_plus_m, gamma))
        z_e1 = ring.add(r_e1, ring.scalar_mul(e2, gamma))
        return ct, EncryptionProof(w0=w0, w1=w1, z_u=z_u, z_e0=z_e0,
                                   z_e1=z_e1, gamma=gamma)

    # -- verifier ------------------------------------------------------------
    def verify(self, ct: Ciphertext, proof: EncryptionProof, pk: PublicKey
               ) -> bool:
        """Check both linear relations and the Fiat-Shamir challenge."""
        ring = self.ring
        gamma = _hash_polys(pk.a, pk.b, ct.c0, ct.c1, proof.w0, proof.w1,
                            q=ring.q)
        if gamma != proof.gamma:
            return False
        # pk.b * z_u + z_e0 == w0 + gamma * c0
        lhs0 = ring.add(ring.multiply(pk.b, proof.z_u), proof.z_e0)
        rhs0 = ring.add(proof.w0, ring.scalar_mul(ct.c0, gamma))
        # pk.a * z_u + z_e1 == w1 + gamma * c1
        lhs1 = ring.add(ring.multiply(pk.a, proof.z_u), proof.z_e1)
        rhs1 = ring.add(proof.w1, ring.scalar_mul(ct.c1, gamma))
        return (np.array_equal(u64_to_np(lhs0), u64_to_np(rhs0))
                and np.array_equal(u64_to_np(lhs1), u64_to_np(rhs1)))


# ---------------------------------------------------------------------------
# Decryption proofs (verifiable_encryption.h:96-126)
# ---------------------------------------------------------------------------


@dataclass
class ShareCommitment:
    """Public commitment to a threshold key share: (a, b = a*s_i + e),
    published at key-ceremony time so partial decryptions are verifiable."""
    share_id: int
    a: tuple
    b: tuple


@dataclass
class DecryptionProof:
    """Chaum-Pedersen-style proof that a partial decryption p = c1 * s_i
    used the SAME s_i as the published share commitment:

        a * z_s + z_e == w_a + gamma * b        (knowledge of s_i, e)
        c1 * z_s      == w_c + gamma * p        (same s_i decrypted)
    """
    share_id: int
    w_a: tuple
    w_c: tuple
    z_s: tuple
    z_e: tuple
    gamma: int


class VerifiableDecryption:
    """Prover/verifier for threshold partial decryptions
    (verifiable_encryption.h:96-126 decryption proofs; partial decryption
    itself is core/threshold.py partial_decrypt)."""

    def __init__(self, ring: PolyRing):
        self.ring = ring

    def commit_share(self, key, share) -> tuple:
        """-> (ShareCommitment, e_noise).  The official keeps e_noise
        secret alongside the share; the commitment is published."""
        ring = self.ring
        k_a, k_e = jax.random.split(key)
        a = ring.sample_uniform(k_a)
        e = ring.sample_gaussian(k_e, 3.2)
        b = ring.add(ring.multiply(a, share.share_poly), e)
        return ShareCommitment(share_id=share.share_id, a=a, b=b), e

    def prove(self, key, share, e_noise, commitment: ShareCommitment,
              c1, partial) -> DecryptionProof:
        ring = self.ring
        k_rs, k_re = jax.random.split(key)
        r_s = ring.sample_uniform(k_rs)
        r_e = ring.sample_uniform(k_re)
        w_a = ring.add(ring.multiply(commitment.a, r_s), r_e)
        w_c = ring.multiply(c1, r_s)
        gamma = _hash_polys(commitment.a, commitment.b, c1, partial.partial,
                            w_a, w_c, q=ring.q)
        z_s = ring.add(r_s, ring.scalar_mul(share.share_poly, gamma))
        z_e = ring.add(r_e, ring.scalar_mul(e_noise, gamma))
        return DecryptionProof(share_id=share.share_id, w_a=w_a, w_c=w_c,
                               z_s=z_s, z_e=z_e, gamma=gamma)

    def verify(self, commitment: ShareCommitment, c1, partial,
               proof: DecryptionProof) -> bool:
        ring = self.ring
        if proof.share_id != commitment.share_id:
            return False
        gamma = _hash_polys(commitment.a, commitment.b, c1, partial.partial,
                            proof.w_a, proof.w_c, q=ring.q)
        if gamma != proof.gamma:
            return False
        lhs_a = ring.add(ring.multiply(commitment.a, proof.z_s), proof.z_e)
        rhs_a = ring.add(proof.w_a, ring.scalar_mul(commitment.b, gamma))
        lhs_c = ring.multiply(c1, proof.z_s)
        rhs_c = ring.add(proof.w_c, ring.scalar_mul(partial.partial, gamma))
        return (np.array_equal(u64_to_np(lhs_a), u64_to_np(rhs_a))
                and np.array_equal(u64_to_np(lhs_c), u64_to_np(rhs_c)))


@dataclass
class VoterReceipt:
    """Hash receipt binding a ballot to its proof
    (verifiable_encryption.h voter receipts)."""
    ballot_hash: str
    proof_hash: str

    @classmethod
    def create(cls, ct: Ciphertext, proof: EncryptionProof) -> "VoterReceipt":
        bh = hashlib.sha256(
            np.ascontiguousarray(u64_to_np(ct.c0)).tobytes()
            + np.ascontiguousarray(u64_to_np(ct.c1)).tobytes()).hexdigest()
        ph = hashlib.sha256(
            np.ascontiguousarray(u64_to_np(proof.w0)).tobytes()
            + proof.gamma.to_bytes(8, "little")).hexdigest()
        return cls(ballot_hash=bh, proof_hash=ph)

    def matches(self, ct: Ciphertext, proof: EncryptionProof) -> bool:
        fresh = VoterReceipt.create(ct, proof)
        return (fresh.ballot_hash == self.ballot_hash
                and fresh.proof_hash == self.proof_hash)
