"""CkksContext — key-owning wrapper for approximate (CKKS) arithmetic.

Companion to api/context.FHEContext for the CKKS engine (core/ckks.py):
the reference's ML-flavoured context (fhe-context.ts createMLContext)
wraps the CKKS_128_ML preset but computes BFV on moduli[0]; this wraps the
REAL leveled CKKS over the full chain — encrypt real/complex vectors,
add/multiply with automatic relinearize + rescale, decrypt back to floats.
"""
from __future__ import annotations

import jax

from ..core.ckks import CkksEngine
from ..core.params import ParameterSet, create_parameter_set

__all__ = ["CkksContext"]


class CkksContext:
    def __init__(self, params: ParameterSet | str = "CKKS_128_ML",
                 scale: int | None = None, rng_seed: int = 0):
        if isinstance(params, str):
            params = create_parameter_set(params)
        self.engine = CkksEngine(params, scale=scale)
        key = jax.random.PRNGKey(rng_seed)
        self.sk = self.engine.generate_secret_key(jax.random.fold_in(key, 0))
        self.pk = self.engine.generate_public_key(
            jax.random.fold_in(key, 1), self.sk)
        self.relin_keys = self.engine.generate_relin_keys(
            jax.random.fold_in(key, 2), self.sk)
        self._ctr = 100

    def _fresh(self):
        self._ctr += 1
        return jax.random.PRNGKey(self._ctr)

    # -- one-call ops ---------------------------------------------------------
    def encrypt(self, values):
        """Real/complex vector (up to N/2 slots) -> ciphertext."""
        return self.engine.encrypt(self._fresh(), values, self.pk)

    def decrypt(self, ct, num_slots: int | None = None):
        return self.engine.decrypt(ct, self.sk, num_slots)

    def add(self, a, b):
        return self.engine.add(a, b)

    def subtract(self, a, b):
        return self.engine.sub(a, b)

    def multiply(self, a, b):
        """Full multiply: tensor, relinearize, rescale (drops one level)."""
        return self.engine.multiply_relin_rescale(a, b, self.relin_keys)

    def add_plain(self, a, values):
        return self.engine.add_plain(a, values)

    @property
    def levels_remaining(self):
        return self.engine.K

    def dot(self, cts: list, weights: list):
        """Encrypted weighted sum sum_i w_i * ct_i (the ML-inference
        primitive the CKKS preset exists for): plaintext weights ride the
        encoder; one rescale at the end keeps scales aligned."""
        if len(cts) != len(weights):
            raise ValueError("weights must match ciphertexts")
        acc = None
        n_slots = self.engine.params.poly_degree // 2
        for ct, w in zip(cts, weights):
            # weight in EVERY slot (slotwise product would zero the rest)
            m = self.engine.encode([complex(w)] * n_slots, level=ct.level)
            ring = self.engine.rings[ct.level - 1]
            term_c0 = ring.multiply(ct.c0, m)
            term_c1 = ring.multiply(ct.c1, m)
            from ..core.ckks import CkksCiphertext
            from fractions import Fraction
            term = CkksCiphertext(
                c0=term_c0, c1=term_c1, level=ct.level,
                scale=ct.scale * Fraction(self.engine.scale),
                key_id=ct.key_id)
            acc = term if acc is None else self.engine.add(acc, term)
        return self.engine.rescale(acc)
