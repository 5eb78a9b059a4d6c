"""BFV-style RLWE encryption engine.

TPU-native twin of the reference's `EncryptionEngine`
(cpp/include/encryption.h:192, cpp/src/encryption.cpp):

* encode: m -> m * Delta with Delta = q / t  (encryption.cpp:109-134)
* encrypt: c0 = pk.b*u + e1 + m,  c1 = pk.a*u + e2  (encryption.cpp:171-205)
* decrypt phase: c0 - c1*s  (encryption.cpp:234-301); degree-2 phase is
  c0 - c1*s + c2*s^2 — **sign fix**: the tensor product of two ciphertexts
  decrypts as (c0 - c1 s)(c0' - c1' s) = d0 - d1 s + d2 s^2, so the +d2 s^2
  convention is the algebraically consistent one (the reference subtracts,
  encryption.cpp:269-284, contradicting its own multiply and relinearize).
* decode: round(coeff * t / q) mod t  (encryption.cpp:142-166)
* multiply: NTT tensor product (encryption.cpp:737-799)
* relinearize: digit-decompose d2 against relin key (encryption.cpp:904-995)
* batch_add: pairwise tree reduction (encryption.cpp:1327-1460)

Everything on-device is pure jnp over limb planes; ciphertexts are pytrees so
whole pipelines (encrypt -> ops -> phase) jit into single TPU programs.
decode/noise-budget run on host (they are host-facing by nature).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .params import ParameterSet
from .poly import PolyRing
from .keys import KeyManager, SecretKey, PublicKey, RelinKey
from ..ops.u64 import u64_from_np, u64_to_np, u64_shr, u64_and_mask

__all__ = ["Ciphertext", "Plaintext", "EncryptionEngine"]


@dataclass
class Ciphertext:
    """RLWE ciphertext (encryption.h:40-89). c2 present => degree-2."""
    c0: Any
    c1: Any
    c2: Optional[Any] = None
    noise_budget: float = 0.0
    key_id: int = 0
    is_ntt: bool = False

    @property
    def is_degree_2(self) -> bool:
        return self.c2 is not None


jax.tree_util.register_pytree_node(
    Ciphertext,
    lambda ct: ((ct.c0, ct.c1, ct.c2),
                (ct.noise_budget, ct.key_id, ct.is_ntt)),
    lambda aux, ch: Ciphertext(c0=ch[0], c1=ch[1], c2=ch[2],
                               noise_budget=aux[0], key_id=aux[1],
                               is_ntt=aux[2]),
)


@dataclass
class Plaintext:
    """Plaintext value(s) mod t (encryption.h:98-116)."""
    values: np.ndarray
    modulus: int

    @classmethod
    def scalar(cls, value: int, t: int) -> "Plaintext":
        return cls(values=np.array([value % t], dtype=np.uint64), modulus=t)

    def value(self) -> int:
        return int(self.values[0])


class EncryptionEngine:
    """BFV-style RLWE engine over a single modulus (RNS chains: first prime,
    matching the reference which also computes on moduli[0] only)."""

    def __init__(self, params: ParameterSet, ring: PolyRing | None = None,
                 noise_std: float | None = None):
        """`noise_std=None` (default) derives real encryption noise from the
        parameter set (fraction-of-q scaled, >= 3.2 absolute — see
        ParameterSet.noise_std_absolute).  Passing an explicit value —
        including 0.0 — overrides it; zero noise is for exactness TESTS ONLY
        and is cryptographically broken (ciphertexts are deterministic in
        the secret)."""
        self.params = params
        self.ring = ring or PolyRing(params.poly_degree, params.moduli[0])
        self.q = self.ring.q
        self.t = params.plaintext_modulus if params.plaintext_modulus > 0 else 4
        self.delta = self.q // self.t  # Delta = floor(q/t), encryption.cpp:46
        noise_std = (params.noise_std_absolute() if noise_std is None
                     else noise_std)
        self._noise_std = noise_std
        # encryption.cpp:52-56
        self.initial_noise_budget = math.log2(self.q) - math.log2(
            2.0 * max(noise_std, 1.0) * math.sqrt(params.poly_degree)
        )

    # -- encode / decode (host <-> device edge) -----------------------------
    def encode(self, values) -> Any:
        """m*Delta packed into coefficient slots (encryption.cpp:109-134)."""
        vals = np.atleast_1d(np.asarray(values, dtype=np.uint64))
        coeffs = np.zeros(self.ring.n, dtype=np.uint64)
        k = min(len(vals), self.ring.n)
        packed = (vals[:k].astype(object) * self.delta) % self.q
        coeffs[:k] = np.array(packed, dtype=np.uint64)
        return self.ring.from_np(coeffs)

    def decode(self, phase_planes, num_values: int = 1) -> np.ndarray:
        """round(coeff * t / q) mod t per slot (encryption.cpp:142-166).

        Exact big-int arithmetic on host (q up to 63 bits * t overflows u64).
        Works on any leading batch shape; slots are the last axis.
        """
        coeffs = u64_to_np(phase_planes)[..., :num_values].astype(object)
        vals = (coeffs * self.t + self.q // 2) // self.q % self.t
        return vals.astype(np.uint64)

    # -- encryption ---------------------------------------------------------
    def encrypt(self, key, values, pk: PublicKey) -> Ciphertext:
        """c0 = pk.b*u + e1 + m, c1 = pk.a*u + e2 (encryption.cpp:171-205)."""
        ring = self.ring
        m = self.encode(values)
        k_u, k_e1, k_e2 = jax.random.split(key, 3)
        u = ring.sample_ternary(k_u)
        e1 = ring.sample_gaussian(k_e1, self._noise_std)
        e2 = ring.sample_gaussian(k_e2, self._noise_std)
        c0 = ring.add(ring.add(ring.multiply(pk.b, u), e1), m)
        c1 = ring.add(ring.multiply(pk.a, u), e2)
        return Ciphertext(c0=c0, c1=c1,
                          noise_budget=self.initial_noise_budget,
                          key_id=pk.key_id)

    def encrypt_symmetric(self, key, values, sk: SecretKey) -> Ciphertext:
        """c = (a*s + e + m, a): same phase convention c0 - c1*s."""
        ring = self.ring
        m = self.encode(values)
        k_a, k_e = jax.random.split(key)
        a = ring.sample_uniform(k_a)
        e = ring.sample_gaussian(k_e, self._noise_std)
        c0 = ring.add(ring.add(ring.multiply(a, sk.poly), e), m)
        return Ciphertext(c0=c0, c1=a,
                          noise_budget=self.initial_noise_budget,
                          key_id=sk.key_id)

    # -- decryption ---------------------------------------------------------
    def phase(self, ct: Ciphertext, sk: SecretKey):
        """Device-side noisy plaintext: c0 - c1*s (+ c2*s^2 for degree-2,
        sign per module docstring)."""
        ring = self.ring
        p = ring.sub(ct.c0, ring.multiply(ct.c1, sk.poly))
        if ct.is_degree_2:
            s2 = ring.multiply(sk.poly, sk.poly)
            p = ring.add(p, ring.multiply(ct.c2, s2))
        return p

    def decrypt(self, ct: Ciphertext, sk: SecretKey, num_values: int = 1):
        """Returns (values mod t, measured noise budget in bits)."""
        ph = self.phase(ct, sk)
        vals = self.decode(ph, num_values)
        budget = self.noise_budget(ph)
        return vals, budget

    def noise_budget(self, phase_planes) -> float:
        """log2(q/t) - log2(2*max_noise) (compute_noise_budget,
        encryption.cpp:364-420)."""
        coeffs = u64_to_np(phase_planes).reshape(-1)
        max_noise = 0
        for c in coeffs.tolist():
            c = int(c)
            rounded = (c * self.t + self.q // 2) // self.q
            recon = (rounded * self.delta) % self.q
            d = abs(c - recon)
            d = min(d, self.q - d)
            max_noise = max(max_noise, d)
        if max_noise == 0:
            return math.log2(self.q / self.t)
        return math.log2(self.q / self.t) - math.log2(2.0 * max_noise)

    # -- homomorphic ops ----------------------------------------------------
    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        ring = self.ring
        nb = min(a.noise_budget, b.noise_budget) - 0.5  # encryption.cpp:594
        c2 = None
        if a.is_degree_2 or b.is_degree_2:
            za = a.c2 if a.is_degree_2 else ring.zeros()
            zb = b.c2 if b.is_degree_2 else ring.zeros()
            c2 = ring.add(za, zb)
        return Ciphertext(c0=ring.add(a.c0, b.c0), c1=ring.add(a.c1, b.c1),
                          c2=c2, noise_budget=nb, key_id=a.key_id,
                          is_ntt=a.is_ntt)

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        ring = self.ring
        nb = min(a.noise_budget, b.noise_budget) - 0.5
        c2 = None
        if a.is_degree_2 or b.is_degree_2:
            za = a.c2 if a.is_degree_2 else ring.zeros()
            zb = b.c2 if b.is_degree_2 else ring.zeros()
            c2 = ring.sub(za, zb)
        return Ciphertext(c0=ring.sub(a.c0, b.c0), c1=ring.sub(a.c1, b.c1),
                          c2=c2, noise_budget=nb, key_id=a.key_id,
                          is_ntt=a.is_ntt)

    def negate(self, a: Ciphertext) -> Ciphertext:
        ring = self.ring
        return Ciphertext(
            c0=ring.neg(a.c0), c1=ring.neg(a.c1),
            c2=ring.neg(a.c2) if a.is_degree_2 else None,
            noise_budget=a.noise_budget, key_id=a.key_id, is_ntt=a.is_ntt)

    def add_plain(self, a: Ciphertext, values) -> Ciphertext:
        ring = self.ring
        return Ciphertext(c0=ring.add(a.c0, self.encode(values)), c1=a.c1,
                          c2=a.c2, noise_budget=a.noise_budget - 0.1,
                          key_id=a.key_id, is_ntt=a.is_ntt)

    def multiply_scalar(self, a: Ciphertext, scalar: int) -> Ciphertext:
        ring = self.ring
        return Ciphertext(c0=ring.scalar_mul(a.c0, scalar),
                          c1=ring.scalar_mul(a.c1, scalar),
                          noise_budget=a.noise_budget - 1.0,
                          key_id=a.key_id, is_ntt=a.is_ntt)

    def multiply_plain(self, a: Ciphertext, values) -> Ciphertext:
        """Multiply by an *unscaled* plaintext polynomial with value slots
        (coefficients m_i, not m_i*Delta — multiplying two Delta-scaled
        operands would leave Delta^2; the reference scales both
        (encryption.cpp:810-830), one of its decode inconsistencies)."""
        ring = self.ring
        vals = np.atleast_1d(np.asarray(values, dtype=np.uint64))
        coeffs = np.zeros(ring.n, dtype=np.uint64)
        coeffs[: len(vals)] = vals % np.uint64(self.t)
        pt = ring.from_np(coeffs)
        return Ciphertext(c0=ring.multiply(a.c0, pt),
                          c1=ring.multiply(a.c1, pt),
                          noise_budget=a.noise_budget - 2.0,
                          key_id=a.key_id, is_ntt=a.is_ntt)

    def multiply(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """Ciphertext multiply = real BFV multiply with t/q rescale.

        Alias for :meth:`multiply_rescale` — the only composition under
        which `decrypt` (which decodes at scale Delta) round-trips with
        real noise.  The raw Delta^2 tensor product survives as
        :meth:`multiply_raw` for phase-algebra tests.
        """
        return self.multiply_rescale(a, b)

    def multiply_raw(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """NTT tensor product -> degree-2 (encryption.cpp:737-799).

        Phase of the result is (Delta*m1 + e1)(Delta*m2 + e2) =
        Delta^2*m1*m2 + cross terms; callers follow with rescale() (correct
        BFV) or decode at Delta^2 (exact when noise is zero).  NOT the
        public multiply: decrypt decodes at Delta, so use multiply /
        multiply_rescale unless you are testing the phase algebra.
        """
        ring = self.ring
        if a.is_degree_2 or b.is_degree_2:
            raise ValueError("relinearize before multiplying degree-2")
        fa0, fa1 = ring.to_ntt(a.c0), ring.to_ntt(a.c1)
        fb0, fb1 = ring.to_ntt(b.c0), ring.to_ntt(b.c1)
        d0 = ring.from_ntt(ring.pointwise(fa0, fb0))
        d1 = ring.from_ntt(ring.add(ring.pointwise(fa0, fb1),
                                    ring.pointwise(fa1, fb0)))
        d2 = ring.from_ntt(ring.pointwise(fa1, fb1))
        nb = min(a.noise_budget, b.noise_budget) - (
            math.log2(self.params.poly_degree) + 5.0)
        return Ciphertext(c0=d0, c1=d1, c2=d2, noise_budget=nb,
                          key_id=a.key_id)

    def square(self, a: Ciphertext) -> Ciphertext:
        return self.multiply_rescale(a, a)

    # -- correct BFV multiply (t/q rescale) ---------------------------------
    @property
    def rescaler(self):
        """Lazily-built exact CRT tensor-multiplier (core/bfv_mul.py)."""
        rs = getattr(self, "_rescaler", None)
        if rs is None:
            from .bfv_mul import RescaleMultiplier

            rs = RescaleMultiplier(self.ring.n, self.q, self.t)
            self._rescaler = rs
            self._rescale_mul_jit = jax.jit(rs.multiply)
        return rs

    def multiply_rescale(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """Real BFV (Fan-Vercauteren) multiply: d_i = round(t/q * (a (x) b))
        — the composition the reference's decrypt semantics require
        (encryption.cpp:737-799 + :234-301) but its code never performs.
        The result is degree-2 at scale Delta (NOT Delta^2): decrypt works
        directly after relinearize, with real noise."""
        if a.is_degree_2 or b.is_degree_2:
            raise ValueError("relinearize before multiplying degree-2")
        rs = self.rescaler
        d0, d1, d2 = self._rescale_mul_jit(a.c0, a.c1, b.c0, b.c1)
        nb = min(a.noise_budget, b.noise_budget) - (
            math.log2(self.t) + math.log2(self.params.poly_degree) + 3.0)
        return Ciphertext(c0=d0, c1=d1, c2=d2, noise_budget=nb,
                          key_id=a.key_id)

    def multiply_relin_rescale(self, a, b, rlk: RelinKey) -> Ciphertext:
        return self.relinearize(self.multiply_rescale(a, b), rlk)

    def relinearize(self, ct: Ciphertext, rlk: RelinKey) -> Ciphertext:
        """Digit-decompose d2 against the relin key (encryption.cpp:904-995).

        c0' = d0 + sum_i digit_i * b_i,  c1' = d1 + sum_i digit_i * a_i
        with b_i = a_i*s + e_i + s^2*base^i, so c0' - c1'*s = d0 - d1*s +
        d2*s^2 + noise — consistent with the degree-2 phase above.
        """
        if not ct.is_degree_2:
            return ct
        ring = self.ring
        base_log = rlk.decomp_base_log
        mask = (1 << base_log) - 1
        c0, c1 = ct.c0, ct.c1
        for lvl in range(rlk.decomp_level):
            shift = lvl * base_log
            digit = u64_and_mask(u64_shr(ct.c2, shift), mask)
            dn = ring.to_ntt(digit)
            c0 = ring.add(c0, ring.from_ntt(
                ring.pointwise(dn, ring.to_ntt(rlk.b[lvl]))))
            c1 = ring.add(c1, ring.from_ntt(
                ring.pointwise(dn, ring.to_ntt(rlk.a[lvl]))))
        return Ciphertext(c0=c0, c1=c1, noise_budget=ct.noise_budget - 1.0,
                          key_id=ct.key_id)

    def multiply_relin(self, a, b, rlk: RelinKey) -> Ciphertext:
        return self.relinearize(self.multiply_rescale(a, b), rlk)

    # -- voting primitives (encryption.h:613-693) ---------------------------
    def tally_votes(self, ballots: list) -> Ciphertext:
        """Homomorphic tally of one-hot ballots (tally_votes)."""
        return self.batch_add(ballots)

    def tally_weighted(self, ballots: list, weights: list) -> Ciphertext:
        """sum w_i * ballot_i (tally_weighted_votes)."""
        if len(ballots) != len(weights):
            raise ValueError("weights must match ballots")
        scaled = [self.multiply_scalar(b, w) for b, w in zip(ballots, weights)]
        return self.batch_add(scaled)

    def tally_multi_candidate(self, ballots: list) -> Ciphertext:
        """Per-slot counts for packed one-hot ballots (coefficient slots
        carry candidates — tally_multi_candidate)."""
        return self.batch_add(ballots)

    def update_tally(self, tally: Ciphertext, ballot: Ciphertext
                     ) -> Ciphertext:
        """Incremental tally update (update_tally)."""
        return self.add(tally, ballot)

    # -- batch reductions ---------------------------------------------------
    def batch_add(self, cts: list) -> Ciphertext:
        """Tree reduction (batch_add_tree, encryption.cpp:1366-1460).

        On TPU the tree is XLA's problem: we stack the ciphertext batch and
        let a single fused reduction handle it; cross-chip batches use psum
        (parallel/collectives.py).
        """
        if not cts:
            raise ValueError("empty batch")
        ring = self.ring
        acc = cts[0]
        # Stack and reduce along the batch axis in one fused op.
        c0_lo = jnp.stack([c.c0[0] for c in cts])
        c0_hi = jnp.stack([c.c0[1] for c in cts])
        c1_lo = jnp.stack([c.c1[0] for c in cts])
        c1_hi = jnp.stack([c.c1[1] for c in cts])
        c0 = _tree_reduce_mod(ring, (c0_lo, c0_hi))
        c1 = _tree_reduce_mod(ring, (c1_lo, c1_hi))
        nb = min(c.noise_budget for c in cts) - 0.5 * math.log2(max(len(cts), 2))
        return Ciphertext(c0=c0, c1=c1, noise_budget=nb, key_id=acc.key_id)


def _tree_reduce_mod(ring: PolyRing, planes):
    """Pairwise modular tree reduction along axis 0 (log2(B) fused adds)."""
    lo, hi = planes
    while lo.shape[0] > 1:
        n = lo.shape[0]
        half = n // 2
        a = (lo[:half], hi[:half])
        b = (lo[half: 2 * half], hi[half: 2 * half])
        s = ring.add(a, b)
        if n % 2:
            lo = jnp.concatenate([s[0], lo[-1:]], axis=0)
            hi = jnp.concatenate([s[1], hi[-1:]], axis=0)
        else:
            lo, hi = s
    return (lo[0], hi[0])
