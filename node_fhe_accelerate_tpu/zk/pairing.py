"""BN254 (alt_bn128) optimal-ate pairing — real, host-side.

The reference never implements a pairing: its Groth16 "pairing check" is
structural ("Real implementation would use optimal ate pairing",
groth16.cpp:1113-1139) and its G2 operations reuse G1 placeholders
(groth16.cpp:822,870).  This module provides an actual pairing so Groth16
and KZG verification are cryptographically meaningful (SURVEY.md hard part
(f)).

Design: verification evaluates O(1) pairings on the host, so this is plain
Python big-int arithmetic over the Fq12 extension (the generic polynomial
representation with modulus w^12 - 18 w^6 + 82, the standard BN254 tower
flattening).  Prover-side bulk work (MSMs) stays on device in zk/curve.py.

Attribution: the Miller-loop structure (linefunc over Fq12, twist/untwist
into E(Fq12), final exponentiation by (p^12-1)/r) follows the public
py_ecc bn128 implementation (github.com/ethereum/py_ecc, MIT license) —
the standard textbook formulation of the BN254 optimal-ate pairing.  The
code here is written fresh against that algorithmic shape; constants are
the universal alt_bn128 parameters.

Checked against bilinearity and the standard generator pairing identities in
tests/test_pairing.py.
"""
from __future__ import annotations

# Standalone int constants (keep this module jax-free: it is host-side
# verifier code and must import instantly even where the TPU plugin is slow)
P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

__all__ = ["FQ2", "FQ12", "pairing", "pairing_check",
           "G2_GENERATOR", "g2_add", "g2_mul", "g2_neg", "is_on_g2"]

# BN parameter and ate loop count
ATE_LOOP_COUNT = 29793968203157093288  # 6u + 2 for u = 4965661367192848881

# Fq12 modulus: w^12 - 18 w^6 + 82  (coefficients of the reduction poly)
FQ12_MODULUS_COEFFS = [82, 0, 0, 0, 0, 0, -18, 0, 0, 0, 0, 0]


# ---------------------------------------------------------------------------
# Generic polynomial extension field elements (tuples of ints mod P)
# ---------------------------------------------------------------------------


class _Poly:
    """Element of Fq[x]/(modulus); subclasses fix degree + modulus."""

    degree = 0
    modulus_coeffs: list = []

    def __init__(self, coeffs):
        if len(coeffs) != self.degree:
            raise ValueError(f"need {self.degree} coeffs")
        self.coeffs = [c % P for c in coeffs]

    # arithmetic
    def __add__(self, other):
        return type(self)([a + b for a, b in zip(self.coeffs, other.coeffs)])

    def __sub__(self, other):
        return type(self)([a - b for a, b in zip(self.coeffs, other.coeffs)])

    def __neg__(self):
        return type(self)([-a for a in self.coeffs])

    def __mul__(self, other):
        if isinstance(other, int):
            return type(self)([a * other for a in self.coeffs])
        d = self.degree
        tmp = [0] * (2 * d - 1)
        for i, a in enumerate(self.coeffs):
            if a:
                for j, b in enumerate(other.coeffs):
                    tmp[i + j] += a * b
        # reduce by the modulus polynomial
        for i in range(2 * d - 2, d - 1, -1):
            top = tmp[i] % P
            if top:
                tmp[i] = 0
                for j, mc in enumerate(self.modulus_coeffs):
                    tmp[i - d + j] -= top * mc
        return type(self)([c % P for c in tmp[:d]])

    __rmul__ = __mul__

    def __pow__(self, e: int):
        result = type(self).one()
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base * base
            e >>= 1
        return result

    def inv(self):
        """Extended Euclid over Fq[x] against the modulus polynomial."""
        lm, hm = [1] + [0] * self.degree, [0] * (self.degree + 1)
        low = self.coeffs + [0]
        high = self.modulus_coeffs + [1]
        while _deg(low):
            r_ = _poly_rounded_div(high, low)
            r_ = r_ + [0] * (self.degree + 1 - len(r_))
            nm = list(hm)
            new = list(high)
            for i in range(self.degree + 1):
                for j in range(self.degree + 1 - i):
                    nm[i + j] -= lm[i] * r_[j]
                    new[i + j] -= low[i] * r_[j]
            nm = [x % P for x in nm]
            new = [x % P for x in new]
            lm, low, hm, high = nm, new, lm, low
        inv_low0 = pow(low[0], -1, P)
        return type(self)([c * inv_low0 % P for c in lm[: self.degree]])

    def __truediv__(self, other):
        if isinstance(other, int):
            return self * pow(other, -1, P)
        return self * other.inv()

    def __eq__(self, other):
        return self.coeffs == other.coeffs

    def __ne__(self, other):
        return not self == other

    @classmethod
    def one(cls):
        return cls([1] + [0] * (cls.degree - 1))

    @classmethod
    def zero(cls):
        return cls([0] * cls.degree)

    def is_zero(self):
        return all(c == 0 for c in self.coeffs)

    def __repr__(self):
        return f"{type(self).__name__}({self.coeffs})"


def _deg(p):
    d = len(p) - 1
    while d and p[d] % P == 0:
        d -= 1
    return d


def _poly_rounded_div(a, b):
    dega, degb = _deg(a), _deg(b)
    temp = list(a)
    out = [0] * len(a)
    binv = pow(b[degb], -1, P)
    for i in range(dega - degb, -1, -1):
        out[i] = (out[i] + temp[degb + i] * binv) % P
        for c in range(degb + 1):
            temp[c + i] = (temp[c + i] - out[i] * b[c]) % P
    return [x % P for x in out[: dega - degb + 1]]


class FQ2(_Poly):
    degree = 2
    modulus_coeffs = [1, 0]  # i^2 = -1


class FQ12(_Poly):
    degree = 12
    modulus_coeffs = FQ12_MODULUS_COEFFS


# ---------------------------------------------------------------------------
# G2 (points over Fq2) — affine with None = infinity
# ---------------------------------------------------------------------------

# b2 = 3 / (9 + i)
_B2 = FQ2([3, 0]) / FQ2([9, 1])

G2_GENERATOR = (
    FQ2([10857046999023057135944570762232829481370756359578518086990519993285655852781,
         11559732032986387107991004021392285783925812861821192530917403151452391805634]),
    FQ2([8495653923123431417604973247489272438418190587263600148770280649306958101930,
         4082367875863433681332203403145435568316851327593401208105741076214120093531]),
)


def is_on_g2(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return y * y - x * x * x == _B2


def g2_neg(pt):
    if pt is None:
        return None
    x, y = pt
    return (x, -y)


def g2_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and y1 == y2:
        return g2_double(p1)
    if x1 == x2:
        return None
    lam = (y2 - y1) / (x2 - x1)
    x3 = lam * lam - x1 - x2
    return (x3, lam * (x1 - x3) - y1)


def g2_double(pt):
    x, y = pt
    lam = (3 * (x * x)) / (2 * y)
    x3 = lam * lam - x - x
    return (x3, lam * (x - x3) - y)


def g2_mul(pt, k: int):
    acc = None
    base = pt
    k = k % R if k >= R else k
    while k:
        if k & 1:
            acc = g2_add(acc, base)
        base = g2_double(base)
        k >>= 1
    return acc


# -- Jacobian G2 + host Pippenger MSM ----------------------------------------
# The prover's B-in-G2 is an MSM over every circuit wire; per-point affine
# g2_mul (one Fq2 inversion PER ADD) is minutes at 2^13 wires.  Jacobian
# coordinates (inversion-free) + bucketed Pippenger bring it to seconds.
# G1's MSM runs on device (curve.py); G2 stays host because Fq2 digit-plane
# arithmetic isn't implemented (yet) — same split as the reference, whose
# G2 is CPU-only (zk_elliptic_curve.cpp).

def _g2j_double(P):
    X, Y, Z = P
    A = X * X
    B = Y * Y
    C = B * B
    t = X + B
    D = t * t - A - C
    D = D + D
    E = A + A + A
    X3 = E * E - D - D
    eight_c = C + C
    eight_c = eight_c + eight_c
    eight_c = eight_c + eight_c
    Y3 = E * (D - X3) - eight_c
    Z3 = (Y + Y) * Z
    return (X3, Y3, Z3)


_FQ2_ZERO = FQ2([0, 0])
_FQ2_ONE = FQ2([1, 0])


def _g2j_add(P, Q):
    if P is None:
        return Q
    if Q is None:
        return P
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = Z1 * Z1
    Z2Z2 = Z2 * Z2
    U1 = X1 * Z2Z2
    U2 = X2 * Z1Z1
    S1 = Y1 * Z2 * Z2Z2
    S2 = Y2 * Z1 * Z1Z1
    if U1 == U2:
        if S1 == S2:
            return _g2j_double(P)
        return None
    H = U2 - U1
    rr = S2 - S1
    rr = rr + rr
    I = H + H
    I = I * I
    J = H * I
    V = U1 * I
    X3 = rr * rr - J - V - V
    S1J = S1 * J
    Y3 = rr * (V - X3) - S1J - S1J
    Z3 = ((Z1 + Z2) * (Z1 + Z2) - Z1Z1 - Z2Z2) * H
    return (X3, Y3, Z3)


def _g2j_from_affine(pt):
    return None if pt is None else (pt[0], pt[1], _FQ2_ONE)


def _g2j_to_affine(P):
    if P is None:
        return None
    X, Y, Z = P
    zinv = _FQ2_ONE / Z
    zi2 = zinv * zinv
    return (X * zi2, Y * zi2 * zinv)


def g2_msm(points, scalars, c: int = 8):
    """sum_i scalars[i] * points[i] over G2: host Pippenger, Jacobian
    buckets.  points: affine-or-None list; scalars: ints mod R."""
    n = len(points)
    assert len(scalars) == n
    jac = [_g2j_from_affine(p) for p in points]
    ss = [s % R for s in scalars]
    nbits = R.bit_length()
    W = -(-nbits // c)
    acc = None
    for w in range(W - 1, -1, -1):
        if acc is not None:
            for _ in range(c):
                acc = _g2j_double(acc)
        buckets = [None] * (1 << c)
        shift = w * c
        for p, s in zip(jac, ss):
            if p is None:
                continue
            d = (s >> shift) & ((1 << c) - 1)
            if d:
                buckets[d] = _g2j_add(buckets[d], p)
        run = None
        tot = None
        for d in range((1 << c) - 1, 0, -1):
            run = _g2j_add(run, buckets[d])
            tot = _g2j_add(tot, run)
        acc = _g2j_add(acc, tot)
    return _g2j_to_affine(acc)


# ---------------------------------------------------------------------------
# Twist into E(Fq12) and the Miller loop
# ---------------------------------------------------------------------------

_W = FQ12([0, 1] + [0] * 10)
_W2 = _W * _W
_W3 = _W2 * _W


def _twist(pt):
    """Map a G2 point (Fq2 coords) to E(Fq12) (py_ecc-style untwist)."""
    if pt is None:
        return None
    x, y = pt
    xc = [x.coeffs[0] - 9 * x.coeffs[1], x.coeffs[1]]
    yc = [y.coeffs[0] - 9 * y.coeffs[1], y.coeffs[1]]
    nx = FQ12([xc[0]] + [0] * 5 + [xc[1]] + [0] * 5)
    ny = FQ12([yc[0]] + [0] * 5 + [yc[1]] + [0] * 5)
    return (nx * _W2, ny * _W3)


def _cast_g1(pt):
    """G1 affine ints -> E(Fq12)."""
    if pt is None:
        return None
    x, y = pt
    return (FQ12([x] + [0] * 11), FQ12([y] + [0] * 11))


def _linefunc(p1, p2, t):
    """Evaluate the line through p1, p2 at t (all in E(Fq12))."""
    x1, y1 = p1
    x2, y2 = p2
    xt, yt = t
    if x1 != x2:
        m = (y2 - y1) / (x2 - x1)
        return m * (xt - x1) - (yt - y1)
    if y1 == y2:
        m = 3 * (x1 * x1) / (2 * y1)
        return m * (xt - x1) - (yt - y1)
    return xt - x1


def _ec_double(pt):
    x, y = pt
    m = 3 * (x * x) / (2 * y)
    nx = m * m - x - x
    return (nx, m * (x - nx) - y)


def _ec_add(p1, p2):
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and y1 == y2:
        return _ec_double(p1)
    m = (y2 - y1) / (x2 - x1)
    nx = m * m - x1 - x2
    return (nx, m * (x1 - nx) - y1)


def pairing(q_g2, p_g1) -> FQ12:
    """e(P, Q) for P in G1 (affine ints or None), Q in G2 (FQ2 affine)."""
    if p_g1 is None or q_g2 is None:
        return FQ12.one()
    return final_exponentiation(miller_loop_raw(q_g2, p_g1))


# ---------------------------------------------------------------------------
# Fast verification path (round 5, VERDICT r4 #4)
# ---------------------------------------------------------------------------
#
# The naive pairing spent 80% of its 335 ms in the square-and-multiply
# final exponentiation by the full (p^12-1)/r (measured 2026-08-21:
# miller 65 ms, final exp 261 ms), and pairing_check paid BOTH per pair.
# Three standard optimizations, all host-side big-int:
#
#  1. One shared final exponentiation over the product of Miller loops
#     (prod e_i == 1  <=>  final_exp(prod miller_i) == 1).
#  2. Frobenius maps via precomputed w^(p^k) power tables — x^(p^k) is
#     Fq-linear in the flat Fq[w]/(w^12-18w^6+82) representation — which
#     unlock the easy part (p^6-1)(p^2+1) by conjugation + one inversion
#     and the BN hard-part addition chain (Scott et al. 2009) with three
#     63-bit exponentiations by the BN parameter u instead of a 2790-bit
#     generic exponent.
#  3. Prepared G2: the Miller line slopes/intercepts depend only on Q, so
#     for the fixed verification keys (KZG [tau]_2, Groth16 beta/gamma/
#     delta, PLONK h2) they are computed once and cached; each check then
#     only evaluates the lines at P (two scalar muls per line).
#
# pairing_check auto-caches preparations keyed by the G2 coordinates, so
# every verifier (KZG, PLONK, Groth16, voting receipts) gets the fast
# path with no call-site changes.

BN_U = 4965661367192848881          # BN254 curve parameter u

_frob_tables: dict = {}


def _frob_table(k: int):
    """[ (w^(p^k))^i for i in 0..11 ] — lazily built, ~30 ms total."""
    tab = _frob_tables.get(k)
    if tab is None:
        w1 = _frob_tables.get("_w1")
        if w1 is None:
            w = FQ12([0, 1] + [0] * 10)
            w1 = w ** P                      # one 254-bit exponentiation
            _frob_tables["_w1"] = w1
        # w^(p^k) by repeated Frobenius of w^(p^(k-1)) (ring hom)
        base = w1
        for _ in range(k - 1):
            base = frobenius(base, 1)
        tab = [FQ12.one()]
        for _ in range(11):
            tab.append(tab[-1] * base)
        _frob_tables[k] = tab
    return tab


def frobenius(f: FQ12, k: int) -> FQ12:
    """f^(p^k): coefficients are Fq (fixed by x -> x^p), so the map is
    the Fq-linear substitution w^i -> (w^p...^p)^i."""
    tab = _frob_table(k)
    acc = FQ12.zero()
    for i, c in enumerate(f.coeffs):
        if c:
            acc = acc + tab[i] * c
    return acc


def _pow_u(f: FQ12) -> FQ12:
    return f ** BN_U


def final_exponentiation(f: FQ12) -> FQ12:
    """f^((p^12-1)/r) via easy part + the BN hard-part chain
    (Scott-Benger-Charlemagne-Dominguez-Kachisa 2009); verified against
    the generic exponentiation in tests/test_pairing.py."""
    # easy part: f^((p^6-1)(p^2+1))
    m = frobenius(f, 6) * f.inv()            # f^(p^6-1)
    m = frobenius(m, 2) * m                  # ^(p^2+1)
    # hard part: m^((p^4-p^2+1)/r).  In the cyclotomic subgroup
    # m^(p^6) = m^-1, so conjugation (frob6) replaces inversions.
    conj = lambda x: frobenius(x, 6)         # noqa: E731
    mx = _pow_u(m)
    mx2 = _pow_u(mx)
    mx3 = _pow_u(mx2)
    y0 = frobenius(m, 1) * frobenius(m, 2) * frobenius(m, 3)
    y1 = conj(m)
    y2 = frobenius(mx2, 2)
    y3 = conj(frobenius(mx, 1))
    y4 = conj(mx * frobenius(mx2, 1))
    y5 = conj(mx2)
    y6 = conj(mx3 * frobenius(mx3, 1))
    t0 = y6 * y6 * y4 * y5
    t1 = y3 * y5 * t0
    t0 = t0 * y2
    t1 = (t1 * t1 * t0)
    t1 = t1 * t1
    t0 = t1 * y1
    t1 = t1 * y0
    t0 = t0 * t0 * t1
    return t0


class G2Prepared:
    """Miller-loop line constants for a FIXED G2 point Q.

    Each line is (a, c, has_y): line(P=(px, py)) = a*px + c - py (slope
    lines) or a*px + c (vertical lines), with a, c in Fq12 — evaluating
    costs two scalar-by-Fq12 products instead of the Fq12 division the
    on-the-fly _linefunc pays."""

    __slots__ = ("lines",)

    def __init__(self, q_g2):
        q = _twist(q_g2)
        self.lines = []
        r_pt = q

        def push(p1, p2):
            x1, y1 = p1
            x2, y2 = p2
            if x1 != x2:
                mm = (y2 - y1) / (x2 - x1)
                self.lines.append((mm, y1 - mm * x1, True))
            elif y1 == y2:
                mm = 3 * (x1 * x1) / (2 * y1)
                self.lines.append((mm, y1 - mm * x1, True))
            else:
                self.lines.append((FQ12.one(), -x1, False))

        for i in range(ATE_LOOP_COUNT.bit_length() - 2, -1, -1):
            push(r_pt, r_pt)
            r_pt = _ec_double(r_pt)
            if ATE_LOOP_COUNT & (1 << i):
                push(r_pt, q)
                r_pt = _ec_add(r_pt, q)
        q1 = (q[0] ** P, q[1] ** P)
        nq2 = (q1[0] ** P, -(q1[1] ** P))
        push(r_pt, q1)
        r_pt = _ec_add(r_pt, q1)
        push(r_pt, nq2)

    def miller_loop(self, p_g1) -> FQ12:
        """Raw Miller value (NO final exponentiation)."""
        px, py = int(p_g1[0]) % P, int(p_g1[1]) % P
        idx = 0
        lines = self.lines
        f = FQ12.one()

        def ev(i):
            a, c, has_y = lines[i]
            out = a * px + c
            if has_y:
                cs = list(out.coeffs)
                cs[0] = (cs[0] - py) % P
                out = FQ12(cs)
            return out

        for i in range(ATE_LOOP_COUNT.bit_length() - 2, -1, -1):
            f = f * f * ev(idx)
            idx += 1
            if ATE_LOOP_COUNT & (1 << i):
                f = f * ev(idx)
                idx += 1
        f = f * ev(idx) * ev(idx + 1)
        return f


def miller_loop_raw(q_g2, p_g1) -> FQ12:
    """Miller loop WITHOUT final exponentiation (for product checks)."""
    if p_g1 is None or q_g2 is None:
        return FQ12.one()
    q = _twist(q_g2)
    p = _cast_g1(p_g1)
    r_pt = q
    f = FQ12.one()
    for i in range(ATE_LOOP_COUNT.bit_length() - 2, -1, -1):
        f = f * f * _linefunc(r_pt, r_pt, p)
        r_pt = _ec_double(r_pt)
        if ATE_LOOP_COUNT & (1 << i):
            f = f * _linefunc(r_pt, q, p)
            r_pt = _ec_add(r_pt, q)
    q1 = (q[0] ** P, q[1] ** P)
    nq2 = (q1[0] ** P, -(q1[1] ** P))
    f = f * _linefunc(r_pt, q1, p)
    r_pt = _ec_add(r_pt, q1)
    f = f * _linefunc(r_pt, nq2, p)
    return f


_prepared_cache: dict = {}


def _prepare_cached(q_g2) -> G2Prepared:
    key = (tuple(q_g2[0].coeffs), tuple(q_g2[1].coeffs))
    prep = _prepared_cache.get(key)
    if prep is None:
        prep = G2Prepared(q_g2)
        if len(_prepared_cache) < 64:    # bounded: verification keys only
            _prepared_cache[key] = prep
    return prep


def pairing_check(pairs) -> bool:
    """prod e(P_i, Q_i) == 1 for [(p_g1, q_g2), ...] — one shared final
    exponentiation over the product of (prepared, cached) Miller loops."""
    acc = FQ12.one()
    for p_g1, q_g2 in pairs:
        if p_g1 is None or q_g2 is None:
            continue
        acc = acc * _prepare_cached(q_g2).miller_loop(p_g1)
    return final_exponentiation(acc) == FQ12.one()
