"""Groth16 zk-SNARK over BN254 with a REAL pairing check.

Twin of the reference's Groth16 stack (cpp/include/groth16.h:80-701,
cpp/src/groth16.cpp) — R1CS constraints + circuit builder + setup/prove/
verify — with the critical upgrade that verification runs the genuine
optimal-ate pairing (zk/pairing.py); the reference's G2 ops are G1
placeholders and its pairing check is structural (groth16.cpp:822,870,
1113-1139).

QAP math runs on device (VERDICT round-1 item 8): constraints are
compiled once into padded sparse gather tables, witness evaluation is a
batched gather+mul+tree-add over Fr digit planes, and the quotient
polynomial h comes out of the device Fr NTT (zk/fr_ntt.py) with NO
polynomial division — the QAP lives on the negacyclic domain x^d + 1,
where h is simply the upper half of the full product A*B.  The prover's
G1 MSMs run on device (Pippenger, zk/curve.py); B-in-G2 uses a host
Jacobian Pippenger (zk/pairing.py g2_msm).
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield

import numpy as np
import jax
import jax.numpy as jnp

from .curve import bn254_g1
from .rand import ScalarRng
from .field import BN254_FR as R, bn254_fr
from .fr_ntt import FrNtt
from .bulletproofs import _scalars, _stack_points
from .commitments import _affine_or_none
from . import pairing as pr

__all__ = ["R1CS", "CircuitBuilder", "Groth16Setup", "Groth16Proof",
           "Groth16Prover", "Groth16Verifier"]


# ---------------------------------------------------------------------------
# R1CS + circuit builder (groth16.h:80-226)
# ---------------------------------------------------------------------------


@dataclass
class R1CS:
    """Constraints <a,w> * <b,w> = <c,w>; w = [1, publics..., privates...]."""
    num_vars: int
    num_public: int          # not counting the constant-1 wire
    constraints: list        # [(a: {idx: coeff}, b, c), ...]

    @property
    def num_constraints(self):
        return len(self.constraints)


class CircuitBuilder:
    """Minimal gate-level builder (groth16.h CircuitBuilder)."""

    def __init__(self):
        self._num_vars = 1      # wire 0 = constant 1
        self._public: list = []
        self._constraints: list = []

    def public_input(self) -> int:
        v = self._num_vars
        self._num_vars += 1
        self._public.append(v)
        return v

    def private_input(self) -> int:
        v = self._num_vars
        self._num_vars += 1
        return v

    def mul(self, x: int, y: int) -> int:
        """z = x * y."""
        z = self.private_input()
        self._constraints.append(({x: 1}, {y: 1}, {z: 1}))
        return z

    def add(self, x: int, y: int) -> int:
        """z = x + y (one linear constraint via mul by 1)."""
        z = self.private_input()
        self._constraints.append(({x: 1, y: 1}, {0: 1}, {z: 1}))
        return z

    def mul_const(self, x: int, k: int) -> int:
        z = self.private_input()
        self._constraints.append(({x: k % R}, {0: 1}, {z: 1}))
        return z

    def assert_equal(self, x: int, y: int):
        self._constraints.append(({x: 1}, {0: 1}, {y: 1}))

    def assert_bool(self, x: int):
        """x * (x - 1) = 0."""
        self._constraints.append(({x: 1}, {x: 1, 0: R - 1}, {}))

    def build(self) -> R1CS:
        # Reorder wires so publics come right after the constant wire
        order = [0] + self._public + [
            v for v in range(1, self._num_vars) if v not in self._public]
        remap = {old: new for new, old in enumerate(order)}
        cons = [tuple({remap[k]: v for k, v in part.items()}
                      for part in con) for con in self._constraints]
        return R1CS(num_vars=self._num_vars, num_public=len(self._public),
                    constraints=cons)


def evaluate_witness(r1cs: R1CS, assignment: dict) -> list:
    """Full witness vector from {wire: value}; wire 0 forced to 1."""
    w = [0] * r1cs.num_vars
    w[0] = 1
    for k, v in assignment.items():
        w[k] = v % R
    for a, b, c in r1cs.constraints:
        av = sum(co * w[i] for i, co in a.items()) % R
        bv = sum(co * w[i] for i, co in b.items()) % R
        cv = sum(co * w[i] for i, co in c.items()) % R
        if av * bv % R != cv:
            raise ValueError("witness does not satisfy constraints")
    return w


# ---------------------------------------------------------------------------
# Compiled circuit: device sparse R1CS evaluator + NTT h-pipeline
# ---------------------------------------------------------------------------


class _CompiledCircuit:
    """R1CS compiled to device tables (the TPU analog of the reference's
    AMXConstraintEvaluator, cpp/include/zk_hardware_accel.h).

    Each constraint part (a/b/c) becomes (d, kmax) wire-index + Montgomery
    coefficient tables; evaluating the whole system against a witness is a
    gather + batched field mul + log(kmax) tree adds.  The h-polynomial
    pipeline then runs entirely on device: interpolate A,B over the psi
    domain, full 2d-wide product, take the upper half (see fr_ntt.py
    docstring for why that IS (AB - C)/t), and repack the canonical digits
    into u32 limbs ready for the G1 MSM."""

    def __init__(self, r1cs: R1CS, d: int):
        self.f = bn254_fr()
        self.d = d
        self.r1cs = r1cs
        self.ntt = FrNtt(self.f, d)
        # psi twist tables for the cyclic product (see _pipeline).  Keeping
        # every transform at size d (not 2d) halves peak HBM in the QAP leg
        # — the 2d pipeline OOM-crashed the v5e worker at d = 2^16.
        q = self.f.q
        pows = [1] * d
        for i in range(1, d):
            pows[i] = pows[i - 1] * self.ntt.psi_inv % q
        self._tw_inv = self.f.encode(pows)                   # psi^-i, (d, L)
        for i in range(1, d):
            pows[i] = pows[i - 1] * self.ntt.psi % q
        self._tw_fwd = self.f.encode(pows)                   # psi^+k, (d, L)
        self._inv2 = self.f.encode([pow(2, -1, q)])[0]
        kmax = 1
        for con in r1cs.constraints:
            for part in con:
                kmax = max(kmax, len(part))
        self.kmax = kmax

        def build(part_idx):
            cols = np.zeros((d, kmax), np.int32)
            coeffs = [0] * (d * kmax)
            for j, con in enumerate(r1cs.constraints):
                for k, (i, co) in enumerate(con[part_idx].items()):
                    cols[j, k] = i
                    coeffs[j * kmax + k] = co % R
            planes = self.f.encode(coeffs).reshape(d, kmax, -1)
            return jnp.asarray(cols), planes

        self.tables = [build(i) for i in range(3)]
        self._jit = jax.jit(self._pipeline)

    def _eval_part(self, w, cols, cf):
        p = self.f.mul(cf, w[cols])            # (d, kmax, L)
        while p.shape[-2] > 1:
            half = p.shape[-2] // 2
            lo = p[..., :half, :]
            hi = p[..., half: 2 * half, :]
            rest = p[..., 2 * half:, :]
            p = jnp.concatenate([self.f.add(lo, hi), rest], axis=-2)
        return p[..., 0, :]                     # (d, L)

    def _pipeline(self, w):
        f = self.f
        ae = self._eval_part(w, *self.tables[0])
        be = self._eval_part(w, *self.tables[1])
        ce = self._eval_part(w, *self.tables[2])
        pe = f.mul(ae, be)
        ok = jnp.all(f.eq(pe, ce))
        # h = (A*B) div (x^d + 1) by upper-half CRT, all transforms size d:
        #   Pn = A*B mod (x^d+1)  — pointwise in the existing psi domain,
        #   Pc = A*B mod (x^d-1)  — psi-untwist, negacyclic mul, psi-retwist
        #   (cyclic conv of a_i psi^-i is psi^-k times the negacyclic conv),
        #   h_k = p_{d+k} = (Pc_k - Pn_k) / 2.
        A = self.ntt.interpolate(ae)
        B = self.ntt.interpolate(be)
        Pn = self.ntt.interpolate(pe)
        Pc = f.mul(self.ntt.negacyclic_mul(f.mul(A, self._tw_inv),
                                           f.mul(B, self._tw_inv)),
                   self._tw_fwd)
        h_mont = f.mul(f.sub(Pc, Pn), self._inv2)
        h = f.from_mont(h_mont)                 # canonical 8-bit digits
        dd = h.reshape(self.d, -1, 4).astype(jnp.uint32)
        limbs = (dd[..., 0] | (dd[..., 1] << 8)
                 | (dd[..., 2] << 16) | (dd[..., 3] << 24))
        return limbs, ok

    def h_limbs(self, w_ints):
        """Witness ints -> (d, 8) u32 limb array of h coefficients; raises
        if the witness fails the constraint check.

        On the CPU backend this runs the identical algebra on host big
        ints (fr_ntt.py *_ints twins) — the device pipeline is shaped for
        the TPU and costs minutes of XLA:CPU compile per circuit size."""
        if jax.default_backend() == "cpu":
            return self._h_limbs_host(w_ints)
        w = self.f.encode([int(x) % R for x in w_ints])
        limbs, ok = self._jit(w)
        if not bool(ok):
            raise ValueError("witness does not satisfy constraints (device)")
        return limbs

    def _h_limbs_host(self, w_ints):
        d = self.d
        w = [int(x) % R for x in w_ints]
        ae = [0] * d
        be = [0] * d
        ce = [0] * d
        for j, (a, b, c) in enumerate(self.r1cs.constraints):
            ae[j] = sum(co * w[i] for i, co in a.items()) % R
            be[j] = sum(co * w[i] for i, co in b.items()) % R
            ce[j] = sum(co * w[i] for i, co in c.items()) % R
            if ae[j] * be[j] % R != ce[j]:
                raise ValueError(
                    "witness does not satisfy constraints (host)")
        # same size-d CRT pipeline as _pipeline, on host big ints
        q = self.f.q
        ntt = self.ntt
        A = ntt.interpolate_ints(np.array(ae, dtype=object))
        B = ntt.interpolate_ints(np.array(be, dtype=object))
        Pn = ntt.interpolate_ints(
            np.array([a * b % q for a, b in zip(ae, be)], dtype=object))
        tw = [1] * d
        for i in range(1, d):
            tw[i] = tw[i - 1] * ntt.psi_inv % q
        At = np.array([a * t % q for a, t in zip(A, tw)], dtype=object)
        Bt = np.array([b * t % q for b, t in zip(B, tw)], dtype=object)
        Pc_t = ntt.negacyclic_mul_ints(At, Bt)
        for i in range(1, d):
            tw[i] = tw[i - 1] * ntt.psi % q
        inv2 = pow(2, -1, q)
        h = [(int(pc) * t - int(pn)) % q * inv2 % q
             for pc, t, pn in zip(Pc_t, tw, Pn)]
        buf = b"".join(int(x).to_bytes(32, "little") for x in h)
        return np.frombuffer(buf, dtype=np.uint32).reshape(d, 8).copy()


# ---------------------------------------------------------------------------
# Setup / prove / verify
# ---------------------------------------------------------------------------


@dataclass
class Groth16Setup:
    r1cs: R1CS
    # proving key (device G1 batched points + host G2)
    alpha_g1: object
    beta_g1: object
    delta_g1: object
    a_query: object          # (n_vars,) G1
    b_query_g1: object
    l_query: object          # private-wire query /delta
    h_query: object          # [tau^i t(tau)/delta]
    beta_g2: object          # FQ2 affine
    delta_g2: object
    gamma_g2: object
    b_query_g2: list         # per-var G2 points
    # verifying key
    ic: object               # (num_public+1,) G1 for the public input MSM


@dataclass
class Groth16Proof:
    a: tuple                 # affine ints
    b: tuple                 # FQ2 affine pair
    c: tuple                 # affine ints


class Groth16Prover:
    def __init__(self, rng_seed: int | None = None):
        self.curve = bn254_g1()
        # Default: OS CSPRNG.  Seeded mode is for reproducible tests ONLY —
        # predictable setup randomness (tau, alpha, beta, gamma, delta) is
        # recoverable toxic waste and allows proof forgery.
        self._rng = ScalarRng(R, rng_seed)

    def _rand(self):
        return self._rng.scalar()

    def _b_g2_device(self, setup: "Groth16Setup", w: list, s_s: int):
        """Device G2 MSM for the proof's B: one Pippenger over
        [beta, delta, B_0..B_{n-1}] with scalars [1, s, w_0..w_{n-1}].
        Device-encoded points are cached on the setup (proving-key reuse)."""
        from .curve_g2 import bn254_g2
        g2c = getattr(self, "_g2_curve", None)
        if g2c is None:
            g2c = self._g2_curve = bn254_g2()
        dev = getattr(setup, "_b_query_g2_dev", None)
        if dev is None:
            aff = [setup.beta_g2, setup.delta_g2] + list(setup.b_query_g2)
            dev = g2c.from_affine_pairs(aff)       # None -> infinity
            setup._b_query_g2_dev = dev
        out = g2c.msm(_scalars([1, s_s] + list(w)), dev)
        return g2c.to_affine_pairs((out[0][None], out[1][None],
                                    out[2][None]))[0]

    # -- setup (groth16.cpp setup, with real G2) -----------------------------
    def setup(self, r1cs: R1CS) -> Groth16Setup:
        c = self.curve
        m = max(r1cs.num_constraints, 2)
        d = 1 << (m - 1).bit_length()
        circuit = _CompiledCircuit(r1cs, d)
        points = circuit.ntt.points              # roots of x^d + 1
        while True:
            tau, alpha, beta, gamma, delta = (self._rand() for _ in range(5))
            if tau not in points:                # keep tau - x_j invertible
                break

        # Lagrange-at-tau over the psi domain has a closed form:
        # L_j(tau) = t(tau) * x_j * (-1/d) / (tau - x_j), t(x) = x^d + 1.
        t_tau = (pow(tau, d, R) + 1) % R
        neg_dinv = (-pow(d, -1, R)) % R
        L = [t_tau * x % R * neg_dinv % R * pow((tau - x) % R, -1, R) % R
             for x in points[:m]]
        A = [0] * r1cs.num_vars
        B = [0] * r1cs.num_vars
        C = [0] * r1cs.num_vars
        for j, (a, b, cc) in enumerate(r1cs.constraints):
            for i, co in a.items():
                A[i] = (A[i] + co * L[j]) % R
            for i, co in b.items():
                B[i] = (B[i] + co * L[j]) % R
            for i, co in cc.items():
                C[i] = (C[i] + co * L[j]) % R

        gi = pow(gamma, -1, R)
        di = pow(delta, -1, R)
        n_pub = r1cs.num_public
        ic_scalars = [((beta * A[i] + alpha * B[i] + C[i]) % R) * gi % R
                      for i in range(n_pub + 1)]
        l_scalars = [((beta * A[i] + alpha * B[i] + C[i]) % R) * di % R
                     for i in range(n_pub + 1, r1cs.num_vars)]
        h_scalars = [pow(tau, i, R) * t_tau % R * di % R for i in range(d)]

        def g1s(scalars):
            if not scalars:
                return c.infinity((1,))
            return c.fixed_base_mul(scalars)

        # G2 query: per-wire host g2_mul on the CPU backend; on TPU one
        # device fixed-base ladder computes every [B_i(tau)]*G2 in a single
        # fused program (zk/curve_g2.py — the batch is the wire axis).
        if jax.default_backend() == "cpu":
            b_query_g2 = [pr.g2_mul(pr.G2_GENERATOR, bi) if bi else None
                          for bi in B]
        else:
            from .curve_g2 import bn254_g2
            g2c = getattr(self, "_g2_curve", None)
            if g2c is None:
                g2c = self._g2_curve = bn254_g2()
            dev = g2c.fixed_base_mul(B, backend="device")
            aff = g2c.to_affine_pairs(dev)
            b_query_g2 = [a if bi else None for a, bi in zip(aff, B)]

        setup = Groth16Setup(
            r1cs=r1cs,
            alpha_g1=g1s([alpha]), beta_g1=g1s([beta]), delta_g1=g1s([delta]),
            a_query=g1s(A), b_query_g1=g1s(B),
            l_query=g1s(l_scalars) if l_scalars else None,
            h_query=g1s(h_scalars),
            beta_g2=pr.g2_mul(pr.G2_GENERATOR, beta),
            delta_g2=pr.g2_mul(pr.G2_GENERATOR, delta),
            gamma_g2=pr.g2_mul(pr.G2_GENERATOR, gamma),
            b_query_g2=b_query_g2,
            ic=g1s(ic_scalars),
        )
        setup._circuit = circuit
        return setup

    # -- prove (groth16.cpp prove) -------------------------------------------
    def prove(self, setup: Groth16Setup, assignment: dict) -> Groth16Proof:
        c = self.curve
        r1cs = setup.r1cs
        w = evaluate_witness(r1cs, assignment)

        # h coefficients on device: sparse R1CS eval -> Fr NTT pipeline
        h_limbs = setup._circuit.h_limbs(w)

        r_s = self._rand()
        s_s = self._rand()

        # A = alpha + sum w_i A_i(tau) + r*delta
        pts_a = _stack_points([setup.alpha_g1, setup.a_query,
                               setup.delta_g1])
        A_pt = c.msm(_scalars([1] + w + [r_s]), pts_a)
        # B (G2) = beta + sum w_i B_i + s*delta.  On TPU this is ONE device
        # Pippenger MSM over Fq2 (zk/curve_g2.py — the same sorted-scan
        # kernel as G1; the reference's G2 never left the CPU, and its
        # Groth16 G2 ops are G1 placeholders, groth16.cpp:822-870).  On the
        # CPU test backend it stays on the host FQ2 Jacobian Pippenger.
        if jax.default_backend() == "cpu":
            g2_pts = []
            g2_scs = []
            for i, wi in enumerate(w):
                if wi and setup.b_query_g2[i] is not None:
                    g2_pts.append(setup.b_query_g2[i])
                    g2_scs.append(wi)
            B_g2 = pr.g2_add(setup.beta_g2, pr.g2_mul(setup.delta_g2, s_s))
            if g2_pts:
                B_g2 = pr.g2_add(B_g2, pr.g2_msm(g2_pts, g2_scs))
        else:
            B_g2 = self._b_g2_device(setup, w, s_s)
        # B in G1 for C computation
        pts_b1 = _stack_points([setup.beta_g1, setup.b_query_g1,
                                setup.delta_g1])
        B_g1 = c.msm(_scalars([1] + w + [s_s]), pts_b1)

        # C = sum_priv w_i L_i + sum h_i H_i + s*A + r*B1 - r*s*delta
        n_pub = r1cs.num_public
        priv_w = w[n_pub + 1:]
        pieces = [setup.h_query]
        scalar_arrays = [h_limbs]
        if setup.l_query is not None and priv_w:
            pieces.insert(0, setup.l_query)
            scalar_arrays.insert(0, _scalars(priv_w))
        pieces += [A_pt, B_g1, setup.delta_g1]
        scalar_arrays.append(_scalars([s_s, r_s, (-r_s * s_s) % R]))
        C_pt = c.msm(jnp.concatenate(scalar_arrays, axis=0),
                     _stack_points(pieces))

        return Groth16Proof(
            a=_affine_or_none(c, A_pt),
            b=B_g2,
            c=_affine_or_none(c, C_pt),
        )


class Groth16Verifier:
    def __init__(self):
        self.curve = bn254_g1()

    def verify(self, setup: Groth16Setup, public_inputs: list,
               proof: Groth16Proof) -> bool:
        """e(A, B) == e(alpha, beta) * e(pub, gamma) * e(C, delta) — the
        real pairing product (the check the reference fakes)."""
        c = self.curve
        if len(public_inputs) != setup.r1cs.num_public:
            return False
        pub_scalars = [1] + [p % R for p in public_inputs]
        pub_pt = c.msm(_scalars(pub_scalars), setup.ic)
        pub_aff = _affine_or_none(c, pub_pt)
        alpha_aff = _affine_or_none(c, _one(setup.alpha_g1))
        q = c.fq.q

        def neg(p):
            return None if p is None else (p[0], (-p[1]) % q)

        # e(-A, B) * e(alpha, beta) * e(pub, gamma) * e(C, delta) == 1
        return pr.pairing_check([
            (neg(proof.a), proof.b),
            (alpha_aff, setup.beta_g2),
            (pub_aff, setup.gamma_g2),
            (proof.c, setup.delta_g2),
        ])


def _one(p):
    return (p[0][0], p[1][0], p[2][0]) if p[0].ndim == 2 else p
