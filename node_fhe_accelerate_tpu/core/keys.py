"""Key generation: secret/public/relinearization keys + threshold sharing.

TPU-native twin of the reference's `KeyManager`
(cpp/include/key_manager.h:219-342, cpp/src/key_manager.cpp:151-330):

* secret key: ternary polynomial (TERNARY default; GAUSSIAN/BINARY/UNIFORM
  distributions supported, key_manager.cpp:151-191)
* public key: RLWE(0) = (a, b = a*s + e)  (key_manager.cpp:232-260)
* relinearization key: per-level encryptions of s^2 * base^i
  (key_manager.cpp:266-330)
* threshold keys: Shamir sharing over Z_q + Lagrange recombination
  (key_manager.h:304-342) — see threshold.py

Keys are pytrees of limb planes, so an entire keygen is one jitted program.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any

import jax
import jax.numpy as jnp

from .poly import PolyRing
from .params import ParameterSet
from ..ops.u64 import u64_from_int

__all__ = ["SecretKey", "PublicKey", "RelinKey", "KeyManager",
           "SecretKeyDistribution"]


class SecretKeyDistribution(Enum):
    TERNARY = "ternary"
    GAUSSIAN = "gaussian"
    BINARY = "binary"
    UNIFORM = "uniform"


@dataclass
class SecretKey:
    poly: Any          # limb planes (..., N)
    key_id: int = 0


@dataclass
class PublicKey:
    a: Any
    b: Any             # b = a*s + e
    key_id: int = 0


@dataclass
class RelinKey:
    """keys[i] = (a_i, b_i) with b_i = a_i*s + e_i + s^2 * base^i."""
    a: list
    b: list
    decomp_base_log: int
    decomp_level: int
    key_id: int = 0


def _register(cls, fields):
    jax.tree_util.register_pytree_node(
        cls,
        lambda x: ([getattr(x, f) for f in fields],
                   {k: v for k, v in x.__dict__.items() if k not in fields}),
        lambda aux, ch: cls(**dict(zip(fields, ch)), **aux),
    )


_register(SecretKey, ["poly"])
_register(PublicKey, ["a", "b"])
_register(RelinKey, ["a", "b"])


class KeyManager:
    """Generates key material for a parameter set (key_manager.cpp)."""

    def __init__(self, params: ParameterSet, ring: PolyRing | None = None,
                 noise_std: float | None = None):
        """`noise_std=None` derives real key noise from the parameter set
        (see ParameterSet.noise_std_absolute); an explicit value — including
        0.0 — overrides it for exactness TESTS ONLY (a noiseless public key
        b = a*s leaks the secret key outright)."""
        self.params = params
        self.ring = ring or PolyRing(params.poly_degree, params.moduli[0])
        self._noise_override = noise_std

    def generate_secret_key(
        self, key, distribution=SecretKeyDistribution.TERNARY, key_id: int = 0
    ) -> SecretKey:
        ring = self.ring
        if distribution == SecretKeyDistribution.TERNARY:
            p = ring.sample_ternary(key)
        elif distribution == SecretKeyDistribution.GAUSSIAN:
            p = ring.sample_gaussian(key, self._noise_std())
        elif distribution == SecretKeyDistribution.BINARY:
            if hasattr(ring, "sample_binary"):
                p = ring.sample_binary(key)
            else:
                from ..ops.sampling import binary_planes
                p = binary_planes(key, (ring.n,))
        else:
            p = ring.sample_uniform(key)
        return SecretKey(poly=p, key_id=key_id)

    def generate_public_key(self, key, sk: SecretKey) -> PublicKey:
        """pk = (a, b = a*s + e) — an RLWE encryption of zero."""
        ring = self.ring
        k_a, k_e = jax.random.split(key)
        a = ring.sample_uniform(k_a)
        e = ring.sample_gaussian(k_e, self._noise_std())
        b = ring.add(ring.multiply(a, sk.poly), e)
        return PublicKey(a=a, b=b, key_id=sk.key_id)

    def generate_relin_key(
        self, key, sk: SecretKey,
        decomp_base_log: int = 0, decomp_level: int = 0,
    ) -> RelinKey:
        """Encrypt s^2 * base^i per level (key_manager.cpp:266-330).

        The level count is raised to ceil(bits(q)/base_log) regardless of
        the preset: relinearization digit-decomposes the full c2 mod q, and
        any uncovered top bits of c2 turn into noise of size 2^uncovered *
        ||s^2|| — instantly fatal.  (The reference reuses its TFHE
        *bootstrap* gadget params baseLog=23/level=1 here, which covers 23
        of 40 bits; its own multiply never round-trips with noise, so the
        bug is invisible there.)"""
        params = self.params
        ring = self.ring
        if getattr(ring, "rings", None) is not None:
            # RNS ring: relinearization uses the RNS gadget (CRT-component
            # decomposition), not binary digits — see core/rns.RnsKeySet.
            from .rns import RnsKeySet
            return RnsKeySet(ring, self._noise_std()).generate_relin_key(
                key, sk)
        base_log = decomp_base_log or params.decomp_base_log
        levels = decomp_level or params.decomp_level
        q_bits = int(ring.q).bit_length()
        levels = max(levels, -(-q_bits // base_log))
        base = 1 << base_log

        s2 = ring.multiply(sk.poly, sk.poly)
        a_list, b_list = [], []
        power = 1
        for i in range(levels):
            k_a, k_e, key = jax.random.split(key, 3)
            a = ring.sample_uniform(k_a)
            e = ring.sample_gaussian(k_e, self._noise_std())
            b = ring.add(ring.multiply(a, sk.poly), e)
            b = ring.add(b, ring.scalar_mul(s2, power))
            a_list.append(a)
            b_list.append(b)
            power = (power * base) % ring.q
        return RelinKey(a=a_list, b=b_list, decomp_base_log=base_log,
                        decomp_level=levels, key_id=sk.key_id)

    def _noise_std(self) -> float:
        if self._noise_override is not None:
            return self._noise_override
        return self.params.noise_std_absolute()
