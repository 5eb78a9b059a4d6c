"""Threshold (M-of-N) key sharing and distributed decryption.

Twin of the reference's Shamir sharing + Lagrange combination
(cpp/include/key_manager.h:304-342, cpp/src/key_manager.cpp:480-636):

* sharing polynomial over Z_q applied coefficient-wise to the secret key;
* share_i = sum_j coeff_j * i^j evaluated at points 1..N;
* partial decryption p_i = c1 * share_i (ring product);
* combination: phase = c0 - sum_i lambda_i * p_i with Lagrange weights at 0.

On a TPU pod each official's partial decryption runs on their host and the
combination is a psum_mod across hosts (parallel/collectives.py) — the DCN
gather the reference never had (SURVEY.md §2 parallelism table).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax

from .poly import PolyRing
from .keys import SecretKey

__all__ = ["SecretKeyShare", "PartialDecryption", "ThresholdKeys",
           "generate_threshold_keys", "partial_decrypt",
           "combine_partial_decryptions", "lagrange_coefficient"]


@dataclass
class SecretKeyShare:
    share_id: int          # evaluation point (1-based)
    share_poly: Any        # limb planes (N,)


@dataclass
class PartialDecryption:
    share_id: int
    partial: Any           # limb planes (N,)


@dataclass
class ThresholdKeys:
    threshold: int
    total_shares: int
    shares: list           # of SecretKeyShare
    master_sk: SecretKey   # kept for tests; production would discard


def lagrange_coefficient(i: int, indices: list, q: int) -> int:
    """lambda_i = prod_{j != i} x_j / (x_j - x_i) mod q, evaluated at 0
    (key_manager.cpp lagrange_coefficient)."""
    num, den = 1, 1
    for j in indices:
        if j == i:
            continue
        num = num * j % q
        den = den * ((j - i) % q) % q
    return num * pow(den, -1, q) % q


def generate_threshold_keys(key, ring: PolyRing, threshold: int,
                            total_shares: int) -> ThresholdKeys:
    """Shamir-share a fresh ternary secret key coefficient-wise
    (key_manager.cpp:480-536)."""
    if threshold == 0 or threshold > total_shares:
        raise ValueError("invalid threshold parameters")
    k_sk, key = jax.random.split(key)
    sk_poly = ring.sample_ternary(k_sk)
    coeffs = [sk_poly]
    for _ in range(1, threshold):
        k_c, key = jax.random.split(key)
        coeffs.append(ring.sample_uniform(k_c))

    shares = []
    for i in range(1, total_shares + 1):
        acc = None
        power = 1
        for c in coeffs:
            term = ring.scalar_mul(c, power)
            acc = term if acc is None else ring.add(acc, term)
            power = power * i % ring.q
        shares.append(SecretKeyShare(share_id=i, share_poly=acc))
    return ThresholdKeys(threshold=threshold, total_shares=total_shares,
                         shares=shares,
                         master_sk=SecretKey(poly=sk_poly, key_id=0))


def partial_decrypt(ring: PolyRing, c1, share: SecretKeyShare
                    ) -> PartialDecryption:
    """p_i = c1 * share_i (key_manager.cpp:584-602)."""
    return PartialDecryption(share_id=share.share_id,
                             partial=ring.multiply(c1, share.share_poly))


def combine_partial_decryptions(ring: PolyRing, c0, partials: list,
                                threshold: int):
    """phase = c0 - sum lambda_i * p_i (key_manager.cpp:604-636).

    With >= threshold shares, sum lambda_i * share_i = sk, so this equals
    c0 - c1*sk — the standard decryption phase.
    """
    if len(partials) < threshold:
        raise ValueError(
            f"not enough partial decryptions: {len(partials)} < {threshold}")
    use = partials[:threshold]
    indices = [p.share_id for p in use]
    acc = None
    for p in use:
        lam = lagrange_coefficient(p.share_id, indices, ring.q)
        term = ring.scalar_mul(p.partial, lam)
        acc = term if acc is None else ring.add(acc, term)
    return ring.sub(c0, acc)
