"""Groth16 zk-SNARK over BN254 with a REAL pairing check.

Twin of the reference's Groth16 stack (cpp/include/groth16.h:80-701,
cpp/src/groth16.cpp) — R1CS constraints + circuit builder + setup/prove/
verify — with the critical upgrade that verification runs the genuine
optimal-ate pairing (zk/pairing.py); the reference's G2 ops are G1
placeholders and its pairing check is structural (groth16.cpp:822,870,
1113-1139).

Scalars/QAP work in host big-ints (circuits here are small); the prover's
MSMs run on device via zk/curve.py.
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield

import numpy as np

from .curve import bn254_g1
from .rand import ScalarRng
from .field import BN254_FR as R
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
# QAP (evaluation-form over points 1..m)
# ---------------------------------------------------------------------------


def _lagrange_at(points, j, x):
    """L_j(x) over the given interpolation points."""
    num, den = 1, 1
    xj = points[j]
    for i, xi in enumerate(points):
        if i == j:
            continue
        num = num * ((x - xi) % R) % R
        den = den * ((xj - xi) % R) % R
    return num * pow(den, -1, R) % R


def _vanishing_at(points, x):
    t = 1
    for xi in points:
        t = t * ((x - xi) % R) % R
    return t


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

    # -- setup (groth16.cpp setup, with real G2) -----------------------------
    def setup(self, r1cs: R1CS) -> Groth16Setup:
        c = self.curve
        m = max(r1cs.num_constraints, 2)
        points = list(range(1, m + 1))
        tau, alpha, beta, gamma, delta = (self._rand() for _ in range(5))

        # QAP evaluations A_i(tau), B_i(tau), C_i(tau)
        L = [_lagrange_at(points, j, tau) for j in range(m)]
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
        t_tau = _vanishing_at(points, tau)

        g = c.generator()
        gi = pow(gamma, -1, R)
        di = pow(delta, -1, R)
        n_pub = r1cs.num_public
        ic_scalars = [((beta * A[i] + alpha * B[i] + C[i]) % R) * gi % R
                      for i in range(n_pub + 1)]
        l_scalars = [((beta * A[i] + alpha * B[i] + C[i]) % R) * di % R
                     for i in range(n_pub + 1, r1cs.num_vars)]
        h_scalars = [pow(tau, i, R) * t_tau % R * di % R for i in range(m)]

        def g1s(scalars):
            if not scalars:
                return c.infinity((1,))
            return c.scalar_mul(_scalars(scalars), g)

        setup = Groth16Setup(
            r1cs=r1cs,
            alpha_g1=g1s([alpha]), beta_g1=g1s([beta]), delta_g1=g1s([delta]),
            a_query=g1s(A), b_query_g1=g1s(B),
            l_query=g1s(l_scalars) if l_scalars else None,
            h_query=g1s(h_scalars),
            beta_g2=pr.g2_mul(pr.G2_GENERATOR, beta),
            delta_g2=pr.g2_mul(pr.G2_GENERATOR, delta),
            gamma_g2=pr.g2_mul(pr.G2_GENERATOR, gamma),
            b_query_g2=[pr.g2_mul(pr.G2_GENERATOR, bi) if bi else None
                        for bi in B],
            ic=g1s(ic_scalars),
        )
        setup._points = points
        setup._taus = None  # toxic waste discarded
        return setup

    # -- prove (groth16.cpp prove) -------------------------------------------
    def prove(self, setup: Groth16Setup, assignment: dict) -> Groth16Proof:
        c = self.curve
        r1cs = setup.r1cs
        w = evaluate_witness(r1cs, assignment)
        m = max(r1cs.num_constraints, 2)
        points = list(range(1, m + 1))

        # h(x) coefficients: (A(x)B(x) - C(x)) / t(x) — via evaluations at
        # shifted points to avoid division by zero of t at interpolation pts.
        a_evals = []
        b_evals = []
        c_evals = []
        for j, (a, b, cc) in enumerate(r1cs.constraints):
            a_evals.append(sum(co * w[i] for i, co in a.items()) % R)
            b_evals.append(sum(co * w[i] for i, co in b.items()) % R)
            c_evals.append(sum(co * w[i] for i, co in cc.items()) % R)
        a_evals += [0] * (m - len(a_evals))
        b_evals += [0] * (m - len(b_evals))
        c_evals += [0] * (m - len(c_evals))

        # interpolate A(x), B(x), C(x) through the constraint evaluations,
        # then compute h = (AB - C)/t by polynomial division (host ints).
        a_poly = _interpolate(points, a_evals)
        b_poly = _interpolate(points, b_evals)
        c_poly = _interpolate(points, c_evals)
        ab = _poly_mul(a_poly, b_poly)
        num = _poly_sub(ab, c_poly)
        t_poly = _vanishing_poly(points)
        h_poly, rem = _poly_divmod(num, t_poly)
        if any(rem):
            raise ValueError("AB - C not divisible by t: bad witness")
        h_poly += [0] * (m - len(h_poly))

        r_s = self._rand()
        s_s = self._rand()

        # A = alpha + sum w_i A_i(tau) + r*delta
        pts_a = _stack_points([setup.alpha_g1, setup.a_query,
                               setup.delta_g1])
        A_pt = c.msm(_scalars([1] + w + [r_s]), pts_a)
        # B (G2, host) = beta + sum w_i B_i + s*delta
        B_g2 = setup.beta_g2
        for i, wi in enumerate(w):
            if wi and setup.b_query_g2[i] is not None:
                B_g2 = pr.g2_add(B_g2, pr.g2_mul(setup.b_query_g2[i], wi))
        B_g2 = pr.g2_add(B_g2, pr.g2_mul(setup.delta_g2, s_s))
        # B in G1 for C computation
        pts_b1 = _stack_points([setup.beta_g1, setup.b_query_g1,
                                setup.delta_g1])
        B_g1 = c.msm(_scalars([1] + w + [s_s]), pts_b1)

        # C = sum_priv w_i L_i + sum h_i H_i + s*A + r*B1 - r*s*delta
        n_pub = r1cs.num_public
        priv_w = w[n_pub + 1:]
        pieces = [setup.h_query]
        scalars = list(h_poly[:m])
        if setup.l_query is not None and priv_w:
            pieces.insert(0, setup.l_query)
            scalars = priv_w + scalars
        pieces += [A_pt, B_g1, setup.delta_g1]
        scalars += [s_s, r_s, (-r_s * s_s) % R]
        C_pt = c.msm(_scalars(scalars), _stack_points(pieces))

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


# -- host polynomial helpers over R ------------------------------------------


def _interpolate(points, values):
    """Lagrange interpolation -> coefficient list (host, O(m^2))."""
    m = len(points)
    coeffs = [0] * m
    for j in range(m):
        if values[j] == 0:
            continue
        # numerator poly prod_{i!=j} (x - x_i)
        num = [1]
        for i, xi in enumerate(points):
            if i == j:
                continue
            num = _poly_mul(num, [(-xi) % R, 1])
        den = 1
        for i, xi in enumerate(points):
            if i != j:
                den = den * ((points[j] - xi) % R) % R
        scale = values[j] * pow(den, -1, R) % R
        for k, co in enumerate(num):
            coeffs[k] = (coeffs[k] + co * scale) % R
    return coeffs


def _vanishing_poly(points):
    t = [1]
    for xi in points:
        t = _poly_mul(t, [(-xi) % R, 1])
    return t


def _poly_mul(a, b):
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        if x:
            for j, y in enumerate(b):
                out[i + j] = (out[i + j] + x * y) % R
    return out


def _poly_sub(a, b):
    n = max(len(a), len(b))
    a = a + [0] * (n - len(a))
    b = b + [0] * (n - len(b))
    return [(x - y) % R for x, y in zip(a, b)]


def _poly_divmod(num, den):
    num = list(num)
    out = [0] * max(1, len(num) - len(den) + 1)
    dinv = pow(den[-1], -1, R)
    for i in range(len(num) - len(den), -1, -1):
        q = num[i + len(den) - 1] * dinv % R
        out[i] = q
        if q:
            for j, dc in enumerate(den):
                num[i + j] = (num[i + j] - q * dc) % R
    return out, num[: len(den) - 1]
