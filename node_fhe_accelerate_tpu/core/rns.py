"""RNS (multi-modulus) polynomial rings and BFV engine.

The reference is "RNS-ready" — `PolynomialRing` carries a moduli chain
(cpp/include/polynomial_ring.h:504-508) and the BFV_128_SIMD / CKKS_128_ML
presets ship 3-5 moduli (cpp/src/parameter_set.cpp:193-259) — but its
compute path only ever touches moduli[0].  This module supplies the real
thing: ciphertext polynomials are RESIDUE TUPLES (one u64 limb-plane pair
per prime q_i), every elementwise/NTT op runs per-prime (independent fused
kernels; the chain unrolls at trace time, K <= 8), and the cross-prime
couplings happen exactly where RNS theory puts them:

* encode/decode: m * Delta mod Q with Delta = floor(Q/t), CRT recombination
  on the host decode edge (host big-int, same edge the single-modulus
  engine uses);
* multiply: exact tensor product + t/Q rescale via
  core/bfv_mul.RnsRescaleMultiplier (digit-plane CRT — no floating-point
  basis-conversion approximations);
* relinearize: RNS gadget decomposition — d2 decomposes into its CRT
  components t_j = |d2 * (Q/q_j)^-1|_{q_j} (a LOCAL per-prime multiply),
  against relin keys encrypting (Q/q_j) * s^2 mod Q.  This is the standard
  RNS keyswitch (Bajard et al. / Halevi-Polyakov-Shoup shape) and costs
  K^2 NTT pointwise products.

Correlated randomness (the same integer noise/ternary sample reduced mod
every prime) is what makes a residue tuple a single ciphertext over Z_Q;
the samplers here draw the signed integer once and map it per prime.

Security note: same contract as core/encrypt.py — noise derives from
ParameterSet.noise_std_absolute() (fraction-of-Q scaled, >= 3.2 absolute).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from .params import ParameterSet
from .poly import PolyRing
from .encrypt import Ciphertext
from ..ops.u64 import u64_to_np, u64_from_np, U32

__all__ = ["RnsPolyRing", "RnsKeySet", "RnsRelinKey", "RnsEncryptionEngine"]


def _signed_to_planes(s, q: int):
    """int32 array of signed values (|v| < 2^31) -> u64 planes mod q."""
    mag = jnp.abs(s).astype(U32)
    q_lo = np.uint32(q & 0xFFFFFFFF)
    q_hi = np.uint32((q >> 32) & 0xFFFFFFFF)
    neg_lo = q_lo - mag
    neg_hi = q_hi - (q_lo < mag).astype(U32)
    is_neg = s < 0
    lo = jnp.where(is_neg, neg_lo, mag)
    hi = jnp.where(is_neg, neg_hi, jnp.uint32(0))
    return (lo, hi)


class RnsPolyRing:
    """Z_Q[X]/(X^N+1) with Q = prod q_i: a list of per-prime PolyRings.

    A polynomial is a tuple of K u64-plane pairs; batch axes lead as in
    PolyRing.  Elementwise ops map per prime; sampling draws ONE integer
    sample and reduces it mod every prime (CRT-consistent randomness).
    """

    def __init__(self, degree: int, moduli: list, ring_factory=None):
        """ring_factory(degree, q) -> per-prime ring; defaults to the
        single-chip PolyRing.  Pass e.g.
        ``lambda n, q: DistPolyRing(n, q, mesh=mesh)`` to run the whole
        RNS stack (and CKKS on top of it) over the 4-step sharded ring —
        coefficient planes are identical in both, so everything above is
        oblivious to the distribution."""
        self.n = degree
        self.moduli = list(moduli)
        self.K = len(self.moduli)
        self.Q = math.prod(self.moduli)
        # `q` aliases the composite so modulus-generic callers (Shamir
        # thresholding, Lagrange weights, scalar reductions) work over Z_Q
        # unchanged; small-integer inverses exist mod Q because every prime
        # factor is 29+ bits.
        self.q = self.Q
        factory = ring_factory or PolyRing
        self.rings = [factory(degree, q) for q in self.moduli]

    # -- construction --------------------------------------------------------
    def zeros(self, batch=()):
        return tuple(r.zeros(batch) for r in self.rings)

    def from_int_coeffs(self, coeffs) -> tuple:
        """Host object-dtype (or uint64) coefficients mod Q -> residues."""
        c = np.asarray(coeffs, dtype=object)
        return tuple(
            u64_from_np(np.array(c % q, dtype=np.uint64))
            for q in self.moduli)

    def to_np(self, poly) -> np.ndarray:
        """Residues -> uint64 array (K, ..., N) (serialization edge)."""
        return np.stack([r.to_np(p) for r, p in zip(self.rings, poly)])

    def from_np(self, arr):
        """(K, ..., N) or flat uint64 residues -> residue tuple."""
        a = np.asarray(arr, dtype=np.uint64).reshape(self.K, -1, self.n)
        a = a.squeeze(1) if a.shape[1] == 1 else a
        return tuple(r.from_np(a[i]) for i, r in enumerate(self.rings))

    def to_int_coeffs(self, poly) -> np.ndarray:
        """Residues -> object-dtype coefficients in [0, Q) via CRT."""
        res = [u64_to_np(p).astype(object) for p in poly]
        x = np.zeros_like(res[0])
        for i, q in enumerate(self.moduli):
            qi_star = self.Q // q
            inv = pow(qi_star % q, -1, q)
            x = x + (res[i] * inv % q) * qi_star
        return x % self.Q

    # -- sampling (shared integer sample across primes) ----------------------
    def sample_uniform(self, key, batch=()):
        # CRT bijection: independent uniforms per prime ARE uniform mod Q.
        return tuple(
            r.sample_uniform(jax.random.fold_in(key, i), batch)
            for i, r in enumerate(self.rings))

    def sample_ternary(self, key, batch=()):
        s = jax.random.randint(key, batch + (self.n,), 0, 3,
                               dtype=jnp.int32) - 1
        return tuple(_signed_to_planes(s, q) for q in self.moduli)

    def sample_gaussian(self, key, std_dev: float, batch=()):
        z = jax.random.normal(key, batch + (self.n,), dtype=jnp.float32)
        s = jnp.round(z * std_dev).astype(jnp.int32)
        return tuple(_signed_to_planes(s, q) for q in self.moduli)

    def sample_binary(self, key, batch=()):
        s = jax.random.bernoulli(key, 0.5, batch + (self.n,)).astype(jnp.int32)
        return tuple(_signed_to_planes(s, q) for q in self.moduli)

    # -- ring ops (per-prime maps) --------------------------------------------
    def add(self, a, b):
        return tuple(r.add(x, y) for r, x, y in zip(self.rings, a, b))

    def sub(self, a, b):
        return tuple(r.sub(x, y) for r, x, y in zip(self.rings, a, b))

    def neg(self, a):
        return tuple(r.neg(x) for r, x in zip(self.rings, a))

    def scalar_mul(self, a, scalar: int):
        return tuple(r.scalar_mul(x, scalar % r.q)
                     for r, x in zip(self.rings, a))

    def pointwise(self, a, b):
        return tuple(r.pointwise(x, y) for r, x, y in zip(self.rings, a, b))

    def to_ntt(self, a):
        return tuple(r.to_ntt(x) for r, x in zip(self.rings, a))

    def from_ntt(self, a):
        return tuple(r.from_ntt(x) for r, x in zip(self.rings, a))

    def multiply(self, a, b):
        """Negacyclic product per prime (coefficient-form in/out)."""
        return tuple(r.multiply(x, y) for r, x, y in zip(self.rings, a, b))


@dataclass
class RnsRelinKey:
    """RNS keyswitch key: component j encrypts (Q/q_j) * s^2 over Z_Q.

    a[j] / b[j] are residue tuples (length K each); b_j = a_j*s + e_j +
    (Q/q_j)*s^2 mod Q."""
    a: list
    b: list
    key_id: str = "rns-relin"


class RnsKeySet:
    """Keygen over the RNS ring (secret/public/relin).

    Reuses the single-modulus SecretKey/PublicKey dataclasses with residue
    tuples in their poly slots, so the API layer handles both engines
    uniformly."""

    def __init__(self, ring: RnsPolyRing, noise_std: float):
        self.ring = ring
        self.noise_std = noise_std

    def generate_secret_key(self, key):
        from .keys import SecretKey
        return SecretKey(poly=self.ring.sample_ternary(key),
                         key_id="rns-sk")

    def generate_public_key(self, key, sk):
        from .keys import PublicKey
        k_a, k_e = jax.random.split(key)
        a = self.ring.sample_uniform(k_a)
        e = self.ring.sample_gaussian(k_e, self.noise_std)
        b = self.ring.add(self.ring.multiply(a, sk.poly), e)
        return PublicKey(a=a, b=b, key_id="rns-pk")

    def generate_relin_key(self, key, sk) -> RnsRelinKey:
        ring = self.ring
        s2 = ring.multiply(sk.poly, sk.poly)
        a_list, b_list = [], []
        for j, qj in enumerate(ring.moduli):
            kj = jax.random.fold_in(key, j)
            k_a, k_e = jax.random.split(kj)
            a = ring.sample_uniform(k_a)
            e = ring.sample_gaussian(k_e, self.noise_std)
            qj_star = ring.Q // qj
            # b = a*s + e + (Q/q_j) * s^2, residue-wise
            gs2 = ring.scalar_mul(s2, qj_star)
            b = ring.add(ring.add(ring.multiply(a, sk.poly), e), gs2)
            a_list.append(a)
            b_list.append(b)
        return RnsRelinKey(a=a_list, b=b_list)


class RnsEncryptionEngine:
    """BFV over the full RNS moduli chain; duck-types EncryptionEngine.

    Same phase convention (phase = c0 - c1*s + c2*s^2) and decode semantics
    (round(phase * t / Q) mod t) as core/encrypt.py, with q -> Q = prod q_i.
    """

    def __init__(self, params: ParameterSet, noise_std: float | None = None):
        self.params = params
        self.ring = RnsPolyRing(params.poly_degree, params.moduli)
        self.q = self.ring.Q
        self.t = params.plaintext_modulus if params.plaintext_modulus > 0 else 4
        self.delta = self.q // self.t
        noise_std = (params.noise_std_absolute() if noise_std is None
                     else noise_std)
        self._noise_std = noise_std
        self.initial_noise_budget = math.log2(self.q) - math.log2(
            2.0 * max(noise_std, 1.0) * math.sqrt(params.poly_degree))
        self.keyset = RnsKeySet(self.ring, noise_std)
        self._mul_jit = None
        self._relin_jit = None

    # -- encode / decode (host <-> device edge) ------------------------------
    def encode(self, values):
        vals = np.atleast_1d(np.asarray(values, dtype=np.uint64))
        coeffs = np.zeros(self.ring.n, dtype=object)
        k = min(len(vals), self.ring.n)
        coeffs[:k] = (vals[:k].astype(object) * self.delta) % self.q
        return self.ring.from_int_coeffs(coeffs)

    def decode(self, phase_poly, num_values: int = 1) -> np.ndarray:
        x = self.ring.to_int_coeffs(phase_poly)[..., :num_values]
        vals = (x * self.t + self.q // 2) // self.q % self.t
        return vals.astype(np.uint64)

    # -- encryption -----------------------------------------------------------
    def encrypt(self, key, values, pk) -> Ciphertext:
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

    def encrypt_symmetric(self, key, values, sk) -> Ciphertext:
        ring = self.ring
        m = self.encode(values)
        k_a, k_e = jax.random.split(key)
        a = ring.sample_uniform(k_a)
        e = ring.sample_gaussian(k_e, self._noise_std)
        c0 = ring.add(ring.add(ring.multiply(a, sk.poly), e), m)
        return Ciphertext(c0=c0, c1=a,
                          noise_budget=self.initial_noise_budget,
                          key_id=sk.key_id)

    # -- decryption -----------------------------------------------------------
    def phase(self, ct: Ciphertext, sk):
        ring = self.ring
        p = ring.sub(ct.c0, ring.multiply(ct.c1, sk.poly))
        if ct.is_degree_2:
            s2 = ring.multiply(sk.poly, sk.poly)
            p = ring.add(p, ring.multiply(ct.c2, s2))
        return p

    def decrypt(self, ct: Ciphertext, sk, num_values: int = 1):
        ph = self.phase(ct, sk)
        return self.decode(ph, num_values), self.noise_budget(ph)

    def noise_budget(self, phase_poly) -> float:
        x = self.ring.to_int_coeffs(phase_poly).reshape(-1)
        max_noise = 0
        for c in x.tolist():
            rounded = (c * self.t + self.q // 2) // self.q
            recon = (rounded * self.delta) % self.q
            d = abs(c - recon)
            d = min(d, self.q - d)
            max_noise = max(max_noise, d)
        if max_noise == 0:
            return math.log2(self.q / self.t)
        return math.log2(self.q / self.t) - math.log2(2.0 * max_noise)

    # -- homomorphic ops -------------------------------------------------------
    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        ring = self.ring
        nb = min(a.noise_budget, b.noise_budget) - 0.5
        c2 = None
        if a.is_degree_2 or b.is_degree_2:
            za = a.c2 if a.is_degree_2 else ring.zeros()
            zb = b.c2 if b.is_degree_2 else ring.zeros()
            c2 = ring.add(za, zb)
        return Ciphertext(c0=ring.add(a.c0, b.c0), c1=ring.add(a.c1, b.c1),
                          c2=c2, noise_budget=nb, key_id=a.key_id)

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        ring = self.ring
        nb = min(a.noise_budget, b.noise_budget) - 0.5
        return Ciphertext(c0=ring.sub(a.c0, b.c0), c1=ring.sub(a.c1, b.c1),
                          noise_budget=nb, key_id=a.key_id)

    def negate(self, a: Ciphertext) -> Ciphertext:
        ring = self.ring
        return Ciphertext(
            c0=ring.neg(a.c0), c1=ring.neg(a.c1),
            c2=ring.neg(a.c2) if a.is_degree_2 else None,
            noise_budget=a.noise_budget, key_id=a.key_id)

    def add_plain(self, a: Ciphertext, values) -> Ciphertext:
        ring = self.ring
        return Ciphertext(c0=ring.add(a.c0, self.encode(values)), c1=a.c1,
                          c2=a.c2, noise_budget=a.noise_budget - 0.1,
                          key_id=a.key_id)

    def multiply_scalar(self, a: Ciphertext, scalar: int) -> Ciphertext:
        ring = self.ring
        return Ciphertext(c0=ring.scalar_mul(a.c0, scalar),
                          c1=ring.scalar_mul(a.c1, scalar),
                          noise_budget=a.noise_budget - 1.0,
                          key_id=a.key_id)

    def multiply_plain(self, a: Ciphertext, values) -> Ciphertext:
        ring = self.ring
        vals = np.atleast_1d(np.asarray(values, dtype=np.uint64))
        coeffs = np.zeros(ring.n, dtype=object)
        coeffs[: len(vals)] = vals.astype(object) % self.t
        pt = ring.from_int_coeffs(coeffs)
        return Ciphertext(c0=ring.multiply(a.c0, pt),
                          c1=ring.multiply(a.c1, pt),
                          noise_budget=a.noise_budget - 2.0,
                          key_id=a.key_id)

    # -- multiply (exact tensor + t/Q rescale) ---------------------------------
    @property
    def rescaler(self):
        if self._mul_jit is None:
            from .bfv_mul import RnsRescaleMultiplier
            self._rescaler = RnsRescaleMultiplier(
                self.ring.n, self.ring.moduli, self.t)
            self._mul_jit = jax.jit(self._rescaler.multiply)
        return self._rescaler

    def multiply(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        return self.multiply_rescale(a, b)

    def multiply_rescale(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        if a.is_degree_2 or b.is_degree_2:
            raise ValueError("relinearize before multiplying degree-2")
        _ = self.rescaler
        d0, d1, d2 = self._mul_jit(tuple(a.c0), tuple(a.c1),
                                   tuple(b.c0), tuple(b.c1))
        nb = min(a.noise_budget, b.noise_budget) - (
            math.log2(self.t) + math.log2(self.params.poly_degree) + 3.0)
        return Ciphertext(c0=d0, c1=d1, c2=d2, noise_budget=nb,
                          key_id=a.key_id)

    def square(self, a: Ciphertext) -> Ciphertext:
        return self.multiply_rescale(a, a)

    # -- RNS relinearization ----------------------------------------------------
    def _build_relin_jit(self):
        ring = self.ring
        K = ring.K

        def relin(d0, d1, d2, ka, kb):
            c0, c1 = list(d0), list(d1)
            for j in range(K):
                # t_j = |d2 * (Q/q_j)^-1|_{q_j}: the j-th CRT component.
                inv = pow((ring.Q // ring.moduli[j]) % ring.moduli[j],
                          -1, ring.moduli[j])
                w = ring.rings[j].scalar_mul(d2[j], inv)
                for i in range(K):
                    ri = ring.rings[i]
                    if i == j:
                        t_ji = w
                    else:
                        z = jnp.zeros_like(w[0])
                        t_ji = ri.ctx.reduce_128((w[0], w[1], z, z))
                    c0[i] = ri.add(c0[i], ri.multiply(t_ji, kb[j][i]))
                    c1[i] = ri.add(c1[i], ri.multiply(t_ji, ka[j][i]))
            return tuple(c0), tuple(c1)

        return jax.jit(relin)

    def relinearize(self, ct: Ciphertext, rlk: RnsRelinKey) -> Ciphertext:
        if not ct.is_degree_2:
            return ct
        if self._relin_jit is None:
            self._relin_jit = self._build_relin_jit()
        c0, c1 = self._relin_jit(
            tuple(ct.c0), tuple(ct.c1), tuple(ct.c2),
            tuple(tuple(a) for a in rlk.a), tuple(tuple(b) for b in rlk.b))
        return Ciphertext(c0=c0, c1=c1, noise_budget=ct.noise_budget - 1.0,
                          key_id=ct.key_id)

    def multiply_relin(self, a, b, rlk: RnsRelinKey) -> Ciphertext:
        return self.relinearize(self.multiply_rescale(a, b), rlk)

    multiply_relin_rescale = multiply_relin

    # -- voting primitives (parity with EncryptionEngine) ----------------------
    def tally_votes(self, ballots: list) -> Ciphertext:
        return self.batch_add(ballots)

    def tally_multi_candidate(self, ballots: list) -> Ciphertext:
        return self.batch_add(ballots)

    def tally_weighted(self, ballots: list, weights: list) -> Ciphertext:
        if len(ballots) != len(weights):
            raise ValueError("weights must match ballots")
        return self.batch_add([self.multiply_scalar(b, w)
                               for b, w in zip(ballots, weights)])

    def update_tally(self, tally: Ciphertext, ballot: Ciphertext) -> Ciphertext:
        return self.add(tally, ballot)

    def batch_add(self, cts: list) -> Ciphertext:
        if not cts:
            raise ValueError("empty ciphertext list")
        out = cts[0]
        for ct in cts[1:]:
            out = self.add(out, ct)
        return out
