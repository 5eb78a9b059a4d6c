"""Short-Weierstrass curves (a=0): BN254 G1 and BLS12-381 G1.

Twin of the reference's `EllipticCurve256/384`
(cpp/include/zk_elliptic_curve.h:149-254, cpp/src/zk_elliptic_curve.cpp):
Jacobian coordinates, add/double/negate/scalar-mul, MSM.

TPU design: points are (X, Y, Z) limb arrays with arbitrary batch axes and
every operation is **branchless** — the doubling/infinity/mixed cases of
Jacobian addition are all computed and selected with masks (SURVEY.md hard
part (e)), so thousands of point ops run as one fused program.  Scalar
multiplication is a fori_loop over scalar bits; MSM sums batched
scalar-muls with a tree reduction (Pippenger windowing planned on top).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from .field import Field, bn254_fq, bls12_381_fq, BN254_FR, BLS12_381_FR
from ..ops import limbs as lb

__all__ = ["Curve", "bn254_g1", "bls12_381_g1", "Point",
           "msm_chunk_spans"]


def msm_chunk_spans(n: int, max_chunk: int) -> list:
    """(offset, size) cover of n for the device MSM's binary-decomposition
    chunking: DESCENDING power-of-two chunks (each <= max_chunk, assumed a
    power of two >= 1024) plus one ragged tail < 1024.  Factored out of
    Curve.msm so the span logic is unit-testable without paying the
    device Pippenger's XLA:CPU compile (ADVICE r4)."""
    spans = []
    off = 0
    rem = n
    while rem >= 1024:
        size = min(1 << (rem.bit_length() - 1), max_chunk)
        spans.append((off, size))
        off += size
        rem -= size
    if rem:
        spans.append((off, rem))            # tail: recursive pad/ladder
    return spans


Point = tuple  # (X, Y, Z) limb arrays; Z == 0 encodes infinity


# ---------------------------------------------------------------------------
# Host big-int Jacobian arithmetic (a = 0 curves)
#
# The device paths below are shaped for the TPU: thousands of branchless
# point ops per fused program.  On the CPU test backend the same programs
# pay ~minutes of XLA compile per shape and run far below Python big-int
# speed, so `msm`/`fixed_base_mul` auto-route to these host kernels when
# jax.default_backend() == "cpu" (never on TPU: any device->host transfer
# poisons the axon dispatch path — docs/OPERATIONS.md).
# ---------------------------------------------------------------------------


_J_INF = (1, 1, 0)


def _jdbl(q: int, P: tuple) -> tuple:
    """dbl-2009-l for a=0 on host ints."""
    X, Y, Z = P
    if Z == 0:
        return P
    A = X * X % q
    B = Y * Y % q
    C = B * B % q
    t = (X + B) % q
    D = 2 * (t * t - A - C) % q
    E = 3 * A % q
    F = E * E % q
    X3 = (F - 2 * D) % q
    Y3 = (E * (D - X3) - 8 * C) % q
    Z3 = 2 * Y * Z % q
    return (X3, Y3, Z3)


def _jadd(q: int, P: tuple, Q: tuple) -> tuple:
    """add-2007-bl on host ints with explicit special cases."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    if Z1 == 0:
        return Q
    if Z2 == 0:
        return P
    Z1Z1 = Z1 * Z1 % q
    Z2Z2 = Z2 * Z2 % q
    U1 = X1 * Z2Z2 % q
    U2 = X2 * Z1Z1 % q
    S1 = Y1 * Z2 * Z2Z2 % q
    S2 = Y2 * Z1 * Z1Z1 % q
    if U1 == U2:
        if S1 != S2:
            return _J_INF
        return _jdbl(q, P)
    H = (U2 - U1) % q
    I = 4 * H * H % q
    J = H * I % q
    rr = 2 * (S2 - S1) % q
    V = U1 * I % q
    X3 = (rr * rr - J - 2 * V) % q
    Y3 = (rr * (V - X3) - 2 * S1 * J) % q
    Z3 = ((Z1 + Z2) * (Z1 + Z2) - Z1Z1 - Z2Z2) % q * H % q
    return (X3, Y3, Z3)


def _host_pippenger(q: int, scalars: list, jac_pts: list, c: int = 8) -> tuple:
    """Classic bucketed Pippenger over host ints (the direct analog of
    zk_elliptic_curve.h:193-254, which the device path re-derives as
    sort + prefix-scan)."""
    nbuck = 1 << c
    maxbits = max((s.bit_length() for s in scalars), default=1)
    W = max(1, -(-maxbits // c))
    acc = _J_INF
    for w in range(W - 1, -1, -1):
        if acc[2] != 0:
            for _ in range(c):
                acc = _jdbl(q, acc)
        shift = w * c
        buckets = [None] * nbuck
        for s, P in zip(scalars, jac_pts):
            if P[2] == 0:
                continue
            d = (s >> shift) & (nbuck - 1)
            if d:
                buckets[d] = P if buckets[d] is None \
                    else _jadd(q, buckets[d], P)
        run = _J_INF
        s_w = _J_INF
        for k in range(nbuck - 1, 0, -1):
            if buckets[k] is not None:
                run = _jadd(q, run, buckets[k])
            if run[2] != 0:
                s_w = _jadd(q, s_w, run)
        acc = _jadd(q, acc, s_w)
    return acc


# ---------------------------------------------------------------------------
# Branchless Jacobian group-law FORMULAS, parameterized over a field-ops
# object `f` (add/sub/mul/square/neg/is_zero/select).  Extracted from the
# Curve methods so the fused Pallas point kernels (ops/digits_pallas.py)
# evaluate the IDENTICAL algebra on VMEM-resident values — bit-exactness
# between the XLA and Pallas paths is by construction, and tests assert it.
# ---------------------------------------------------------------------------


def jdbl_formula(f, p):
    """dbl-2009-l for a=0: 3M + 5S (zk_elliptic_curve.cpp double)."""
    X, Y, Z = p
    A = f.square(X)
    B = f.square(Y)
    C = f.square(B)
    t = f.square(f.add(X, B))
    D = f.add(f.sub(f.sub(t, A), C), f.sub(f.sub(t, A), C))  # 2(t-A-C)
    E = f.add(f.add(A, A), A)                                 # 3A
    F = f.square(E)
    X3 = f.sub(F, f.add(D, D))
    eight_c = f.add(f.add(f.add(C, C), f.add(C, C)),
                    f.add(f.add(C, C), f.add(C, C)))
    Y3 = f.sub(f.mul(E, f.sub(D, X3)), eight_c)
    Z3 = f.mul(f.add(Y, Y), Z)
    # Doubling infinity stays infinity (Z=0 -> Z3=0 automatically)
    return (X3, Y3, Z3)


def jadd_formula(f, p, q, select, where_zero):
    """add-2007-bl with doubling/infinity cases resolved by masks.

    `select(pred, a, b)` picks per-element between same-shape digit
    arrays; `where_zero(pred, a)` zeroes a where pred (for the
    to-infinity case).  Split out so the Pallas kernel can supply its
    in-VMEM implementations."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = f.square(Z1)
    Z2Z2 = f.square(Z2)
    U1 = f.mul(X1, Z2Z2)
    U2 = f.mul(X2, Z1Z1)
    S1 = f.mul(Y1, f.mul(Z2, Z2Z2))
    S2 = f.mul(Y2, f.mul(Z1, Z1Z1))
    H = f.sub(U2, U1)
    rr = f.add(f.sub(S2, S1), f.sub(S2, S1))      # r = 2(S2-S1)
    I = f.square(f.add(H, H))
    J = f.mul(H, I)
    V = f.mul(U1, I)
    X3 = f.sub(f.sub(f.square(rr), J), f.add(V, V))
    Y3 = f.sub(f.mul(rr, f.sub(V, X3)),
               f.add(f.mul(S1, J), f.mul(S1, J)))
    # Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) * H = 2 Z1 Z2 H, consistent with
    # r = 2(S2-S1) and I = (2H)^2 per add-2007-bl.
    Z3 = f.mul(f.sub(f.sub(f.square(f.add(Z1, Z2)), Z1Z1), Z2Z2), H)

    same_x = f.is_zero(H)
    same_y = f.is_zero(f.sub(S2, S1))
    p_inf = f.is_zero(Z1)
    q_inf = f.is_zero(Z2)

    dbl = jdbl_formula(f, p)
    use_dbl = same_x & same_y & ~p_inf & ~q_inf
    to_inf = same_x & ~same_y & ~p_inf & ~q_inf

    X3 = select(use_dbl, dbl[0], X3)
    Y3 = select(use_dbl, dbl[1], Y3)
    Z3 = select(use_dbl, dbl[2], Z3)
    Z3 = where_zero(to_inf, Z3)
    # p or q at infinity -> the other operand
    X3 = select(p_inf, X2, X3)
    Y3 = select(p_inf, Y2, Y3)
    Z3 = select(p_inf, Z2, Z3)
    X3 = select(q_inf, X1, X3)
    Y3 = select(q_inf, Y1, Y3)
    Z3 = select(q_inf, Z1, Z3)
    return (X3, Y3, Z3)


class Curve:
    """y^2 = x^3 + b over fq; scalar field order r."""

    def __init__(self, fq: Field, b: int, gx: int, gy: int, order: int):
        self.fq = fq
        self.b = b
        self.b_mont = fq.encode([b])[0]
        self.order = order
        self.gen_affine = (gx, gy)
        # Jitted entry points (cached per input shape): protocol code calls
        # these thousands of times eagerly — per-op dispatch would dominate.
        self.add = jax.jit(self._add_impl)
        self.double = jax.jit(self._double_impl)
        self.scalar_mul = jax.jit(self._scalar_mul_impl,
                                  static_argnames=("window",))
        self.eq = jax.jit(self._eq_impl)
        self._fb_tables: dict = {}      # host fixed-base window tables

    # -- construction --------------------------------------------------------
    def generator(self, batch=()):
        gx, gy = self.gen_affine
        X = jnp.broadcast_to(self.fq.encode([gx])[0], batch + (self.fq.n_limbs,))
        Y = jnp.broadcast_to(self.fq.encode([gy])[0], batch + (self.fq.n_limbs,))
        Z = jnp.broadcast_to(self.fq.one_mont, batch + (self.fq.n_limbs,))
        return (X, Y, Z)

    def infinity(self, batch=()):
        z = jnp.zeros(batch + (self.fq.n_limbs,), jnp.int32)
        one = jnp.broadcast_to(self.fq.one_mont, batch + (self.fq.n_limbs,))
        return (one, one, z)

    def from_affine_ints(self, xs, ys):
        X = self.fq.encode(xs)
        Y = self.fq.encode(ys)
        Z = jnp.broadcast_to(self.fq.one_mont, X.shape)
        return (X, Y, Z)

    def to_affine_ints(self, p) -> tuple:
        """Host: decode to (x, y) int arrays + infinity flags.

        The result is host data by definition, so the Z-inversions run on
        host too (Montgomery batch trick, one modexp total) — a device
        f.inv would add a ~254-round compile per input shape for work that
        ends in a host fetch anyway."""
        q = self.fq.q
        jac = self._points_to_host(p)
        nz = [pz if pz else 1 for (_, _, pz) in jac]
        prefix = [1] * (len(nz) + 1)
        for i, z in enumerate(nz):
            prefix[i + 1] = prefix[i] * z % q
        inv_all = pow(prefix[-1], -1, q)
        xs = np.zeros(len(jac), dtype=object)
        ys = np.zeros(len(jac), dtype=object)
        inf = np.zeros(len(jac), dtype=bool)
        for i in range(len(jac) - 1, -1, -1):
            zi = prefix[i] * inv_all % q
            inv_all = inv_all * nz[i] % q
            X, Y, Z = jac[i]
            if Z == 0:
                inf[i] = True
            else:
                zi2 = zi * zi % q
                xs[i] = X * zi2 % q
                ys[i] = Y * zi2 % q * zi % q
        if p[0].ndim == 1:                   # unbatched single point
            return xs.reshape(()), ys.reshape(()), inf.reshape(())
        return xs, ys, inf

    def is_infinity(self, p):
        return self.fq.is_zero(p[2])

    def is_on_curve_affine(self, x: int, y: int) -> bool:
        q = self.fq.q
        return (y * y - (x * x * x + self.b)) % q == 0

    # -- group law (branchless) ---------------------------------------------
    def _pallas_geometry(self, p, q=None):
        """Total point count if the fused Pallas point kernels apply,
        else 0 (NFA_PALLAS_CURVE=0 disables).  The DEFAULT-ON variant is
        the TRANSPOSED-domain one (ops/digits_pallas.py pallas_jadd_t):
        digit-major (D, lanes) tiles fill all 128 VPU lanes, measured on
        v5e 2026-08-20 at 1.96 ms per 131k-wide field mul vs 14.9 ms XLA
        (chained, floor-free) and msm_bn254_4096 370 ms vs 521 ms XLA,
        bit-identical.  Two earlier variants lost and are kept only as
        measured alternatives: a fully-fused Jacobian kernel (>40 min
        Mosaic compile — super-linear in unrolled size) and row-major
        level-stacked muls (2.28 s MSM: 32/128 lanes + per-level HBM
        round trips)."""
        import os
        from .field import Field
        from .field2 import Field2
        if os.environ.get("NFA_PALLAS_CURVE", "1") == "0":
            return 0
        if type(self.fq) is not Field and type(self.fq) is not Field2:
            return 0
        shapes = [x.shape for x in (p if q is None else p + q)]
        if any(s != shapes[0] for s in shapes):
            return 0            # broadcasting left to the XLA path
        total = 1
        for d in shapes[0][:-1]:
            total *= d
        return total if total >= 2048 and total % 8 == 0 else 0

    def _double_impl(self, p):
        """dbl-2009-l for a=0: 3M + 5S (zk_elliptic_curve.cpp double)."""
        n = self._pallas_geometry(p)
        if n:
            from ..ops.digits_pallas import pallas_jdbl_t
            return pallas_jdbl_t(self.fq, p)
        return jdbl_formula(self.fq, p)

    def _add_impl(self, p, q):
        """add-2007-bl with doubling/infinity cases resolved by masks."""
        n = self._pallas_geometry(p, q)
        if n:
            from ..ops.digits_pallas import pallas_jadd_t
            return pallas_jadd_t(self.fq, p, q)
        f = self.fq
        return jadd_formula(
            f, p, q,
            select=f.select,
            where_zero=lambda pred, a: f.select(pred, jnp.zeros_like(a), a))

    def negate(self, p):
        X, Y, Z = p
        return (X, self.fq.neg(Y), Z)

    # -- scalar multiplication ----------------------------------------------
    def _scalar_mul_impl(self, scalar_limbs, p, window: int = 4):
        """[s]P via fixed-window (2^w-entry table) double-and-add, batched.

        scalar_limbs: (..., Ls) uint32 little-endian (Fr residues, NOT
        Montgomery form).  The per-point multiples table is built with
        2^w - 2 batched adds; the main loop runs ceil(bits/w) iterations of
        w doubles + one table-gather + one add — about half the field muls
        of bit-serial double-and-add.
        """
        f = self.fq
        Ls = scalar_limbs.shape[-1]
        nbits = 32 * Ls
        w = window
        assert 32 % w == 0
        batch = scalar_limbs.shape[:-1]
        base = (jnp.broadcast_to(p[0], batch + (f.n_limbs,)),
                jnp.broadcast_to(p[1], batch + (f.n_limbs,)),
                jnp.broadcast_to(p[2], batch + (f.n_limbs,)))

        # table[j] = [j]P, j in [0, 2^w), built with a scan (one add body)
        def tstep(prev, _):
            nxt = self._add_impl(prev, base)
            return nxt, nxt

        _, rest = jax.lax.scan(tstep, base, None, length=(1 << w) - 2)
        inf = self.infinity(batch)
        tX = jnp.concatenate([inf[0][None], base[0][None], rest[0]])
        tY = jnp.concatenate([inf[1][None], base[1][None], rest[1]])
        tZ = jnp.concatenate([inf[2][None], base[2][None], rest[2]])

        n_steps = nbits // w

        def body(i, acc):
            # process window starting at bit (nbits - (i+1)*w), MSB first
            for _ in range(w):
                acc = self._double_impl(acc)
            shift_bits = nbits - (i + 1) * w
            limb = jax.lax.dynamic_index_in_dim(
                scalar_limbs, shift_bits // 32, axis=-1, keepdims=False)
            nib = (limb >> (shift_bits % 32)) & ((1 << w) - 1)
            idx = nib.astype(jnp.int32)[None, ..., None]
            sel = (jnp.take_along_axis(tX, idx, axis=0)[0],
                   jnp.take_along_axis(tY, idx, axis=0)[0],
                   jnp.take_along_axis(tZ, idx, axis=0)[0])
            return self._add_impl(acc, sel)

        acc = self.infinity(batch)
        return jax.lax.fori_loop(0, n_steps, body, acc)

    # -- multi-scalar multiplication -----------------------------------------
    def _msm_pippenger_impl(self, scalar_limbs, points, c: int = 8):
        """Pippenger bucket MSM, redesigned for TPU (zk_elliptic_curve.h:193-254).

        The classic formulation scatters points into 2^c buckets per window
        — a data-dependent scatter-accumulate that is poison for XLA.  This
        version gets identical bucket sums with only sorts, gathers and an
        associative scan:

          1. split every scalar into W = bits/c unsigned c-bit digits;
          2. per window, sort the points by digit (argsort + gather);
          3. a Hillis-Steele prefix scan of the (branchless, abelian) group
             add over the sorted points gives all prefix sums C_i, batched
             over every window at once — log2(n) full-width adds.  (A
             masked `jnp.roll` inside `fori_loop` rather than
             `lax.associative_scan`: the scan combine would be inlined
             ~2*log2(n) times and each branchless add is thousands of HLO
             ops, which blows XLA compile time; the fori body compiles the
             add exactly once.);
          4. the sum of points with digit <= k is C[e_k] where
             e_k = searchsorted(digits, k, 'right') - 1, so the window sum
             is   S_w = sum_j j*B_j = sum_j R_j  with suffix sums
             R_j = C_tot - C[e_{j-1}]:
             S_w = (2^c - 1)*C_tot  -  sum_{k=0}^{2^c-2} C[e_k]
             — a 255-wide gather plus one tree reduction, no scatter;
          5. Horner over windows: acc = 2^c * acc + S_w (c doubles + 1 add).

        Group-op count is ~2nW + (2^c)W + bits, versus n*(bits/w_naive)*...
        for the per-point windowed ladder — ~6x fewer field muls at n=4096,
        with every add a wide batched VPU op.
        """
        f = self.fq
        X, Y, Z = points
        n, Ls = scalar_limbs.shape
        per = 32 // c
        W = Ls * per
        nbuck = 1 << c

        # 1. digits (n, W), window 0 = least significant
        shifts = jnp.arange(per, dtype=jnp.uint32) * c
        d = (scalar_limbs[..., None] >> shifts[None, None, :]) & (nbuck - 1)
        digits = d.reshape(n, W)

        # 2. per-window sort of points by digit
        order = jnp.argsort(digits, axis=0)                    # (n, W)
        dsort = jnp.take_along_axis(digits, order, axis=0)     # (n, W)
        Xs = jnp.take(X, order, axis=0)                        # (n, W, L)
        Ys = jnp.take(Y, order, axis=0)
        Zs = jnp.take(Z, order, axis=0)

        # 3. batched prefix sums of the group op over the point axis.
        #    Work-efficient two-level segmented scan: a flat Hillis-Steele
        #    costs log2(n) full-width adds, but the prefixes are only ever
        #    read at the 2^c-1 bucket boundaries (step 4), so it suffices
        #    to scan WITHIN groups of g (log2(g) full-width adds), scan the
        #    group totals (log2(n/g) adds at 1/g width), and combine the
        #    two at the gathered boundaries (one 255-wide add) — ~4.4n add
        #    work instead of 12n at n=4096.  Each fori body compiles the
        #    branchless add exactly once, as before.
        g = 8
        while n % g:
            g //= 2
        ngroups = n // g
        shp = Xs.shape[1:]
        Xg = Xs.reshape((ngroups, g) + shp)
        Yg = Ys.reshape((ngroups, g) + shp)
        Zg = Zs.reshape((ngroups, g) + shp)
        posg = jnp.arange(g).reshape((1, g) + (1,) * len(shp))

        def wbody(i, acc):
            ax, ay, az = acc
            sh = jnp.int32(1) << i
            sx = jnp.roll(ax, sh, axis=1)
            sy = jnp.roll(ay, sh, axis=1)
            sz = jnp.where(posg < sh, 0, jnp.roll(az, sh, axis=1))
            return self._add_impl(acc, (sx, sy, sz))

        Wx, Wy, Wz = jax.lax.fori_loop(
            0, max(1, g.bit_length() - 1), wbody, (Xg, Yg, Zg)) \
            if g > 1 else (Xg, Yg, Zg)
        # inclusive prefix over per-group totals (width n/g)
        Tx, Ty, Tz = self._prefix_scan_add((Wx[:, -1], Wy[:, -1], Wz[:, -1]))
        # exclusive version: shift down one group, identity (Z=0) in front
        Ex = jnp.concatenate([Tx[:1], Tx[:-1]], axis=0)
        Ey = jnp.concatenate([Ty[:1], Ty[:-1]], axis=0)
        Ez = jnp.concatenate([jnp.zeros_like(Tz[:1]), Tz[:-1]], axis=0)
        Wxf = Wx.reshape((n,) + shp)
        Wyf = Wy.reshape((n,) + shp)
        Wzf = Wz.reshape((n,) + shp)

        # 4. C[e_k] for k = 0..2^c-2 per window: within-group prefix at e_k
        #    plus the exclusive sum of the groups before it
        ks = jnp.arange(nbuck - 1, dtype=digits.dtype)          # (255,)
        e = jax.vmap(lambda col: jnp.searchsorted(col, ks, side="right"),
                     in_axes=1, out_axes=1)(dsort) - 1          # (255, W)
        empty = e < 0
        idx = jnp.maximum(e, 0)[..., None]                      # (255, W, 1)

        def bound_gather(Wf, T):
            i1 = jnp.broadcast_to(idx, idx.shape[:2] + (Wf.shape[-1],))
            i2 = jnp.broadcast_to(idx // g, idx.shape[:2] + (T.shape[-1],))
            return (jnp.take_along_axis(Wf, i1, axis=0),
                    jnp.take_along_axis(T, i2, axis=0))

        wx, ex = bound_gather(Wxf, Ex)
        wy, ey = bound_gather(Wyf, Ey)
        wz, ez = bound_gather(Wzf, Ez)
        Gx, Gy, Gz = self._add_impl((wx, wy, wz), (ex, ey, ez))
        Gz = jnp.where(empty[..., None], jnp.zeros_like(Gz), Gz)  # -> infinity

        # sum the 255 gathered prefixes per window (negated): last element
        # of another prefix scan (same single-add-instance trick)
        sums = self._prefix_scan_add((Gx, f.neg(Gy), Gz))
        negsum = (sums[0][-1], sums[1][-1], sums[2][-1])        # (W, L)

        # (2^c - 1) * C_tot  =  2^c * C_tot - C_tot
        ctot = (Tx[-1], Ty[-1], Tz[-1])
        m = self._double_n(ctot, c)
        m = self._add_impl(m, self.negate(ctot))
        Sx, Sy, Sz = self._add_impl(m, negsum)                  # (W, L)

        # 5. Horner over windows, most significant first
        def body(i, acc):
            w = W - 1 - i
            acc = self._double_n(acc, c)
            sw = (jax.lax.dynamic_index_in_dim(Sx, w, 0, keepdims=False),
                  jax.lax.dynamic_index_in_dim(Sy, w, 0, keepdims=False),
                  jax.lax.dynamic_index_in_dim(Sz, w, 0, keepdims=False))
            return self._add_impl(acc, sw)

        top = (Sx[-1], Sy[-1], Sz[-1])
        return jax.lax.fori_loop(1, W, body, top)

    def _double_n(self, p, k: int):
        """[2^k]p via fori_loop — one compiled double instance, not k."""
        return jax.lax.fori_loop(0, k, lambda _, q: self._double_impl(q), p)

    def _prefix_scan_add(self, pts):
        """Inclusive prefix sums of the group op along axis 0, batched over
        trailing axes: Hillis-Steele with a masked roll, log2(n) iterations
        of ONE compiled add.  Wrapped-around entries are masked to the
        identity (Z = 0)."""
        X, Y, Z = pts
        n = X.shape[0]
        steps = max(1, (n - 1).bit_length())
        pos = jnp.arange(n).reshape((n,) + (1,) * (X.ndim - 1))

        def body(i, acc):
            ax, ay, az = acc
            sh = jnp.int32(1) << i
            sx = jnp.roll(ax, sh, axis=0)
            sy = jnp.roll(ay, sh, axis=0)
            sz = jnp.where(pos < sh, 0, jnp.roll(az, sh, axis=0))
            return self._add_impl(acc, (sx, sy, sz))

        return jax.lax.fori_loop(0, steps, body, (X, Y, Z))

    # -- host <-> device point conversion -------------------------------------
    def _scalars_to_ints(self, scalar_limbs) -> list:
        arr = np.asarray(scalar_limbs, dtype=np.uint32)
        out = []
        for row in arr.reshape(-1, arr.shape[-1]):
            s = 0
            for i, v in enumerate(row):
                s |= int(v) << (32 * i)
            out.append(s)
        return out

    def _points_to_host(self, pts) -> list:
        """Device Montgomery planes -> Jacobian host int tuples."""
        f = self.fq
        X = np.atleast_1d(f.decode(pts[0]))
        Y = np.atleast_1d(f.decode(pts[1]))
        Z = np.atleast_1d(f.decode(pts[2]))
        return [(int(x), int(y), int(z)) for x, y, z in zip(X, Y, Z)]

    def _points_from_host(self, jac_list: list):
        """Jacobian host int tuples -> (n,) device Montgomery planes
        (batch Z-inversion with the Montgomery trick: one modexp)."""
        q = self.fq.q
        zs = [p[2] for p in jac_list]
        nz = [z if z else 1 for z in zs]
        prefix = [1] * (len(nz) + 1)
        for i, z in enumerate(nz):
            prefix[i + 1] = prefix[i] * z % q
        inv_all = pow(prefix[-1], -1, q)
        xs, ys, zflags = [0] * len(zs), [0] * len(zs), [0] * len(zs)
        for i in range(len(nz) - 1, -1, -1):
            zi = prefix[i] * inv_all % q
            inv_all = inv_all * nz[i] % q
            X, Y, Z = jac_list[i]
            if Z == 0:
                xs[i] = ys[i] = 1          # matches infinity(): X=Y=1, Z=0
            else:
                zi2 = zi * zi % q
                xs[i] = X * zi2 % q
                ys[i] = Y * zi2 % q * zi % q
                zflags[i] = 1
        f = self.fq
        return (f.encode(xs), f.encode(ys), f.encode(zflags))

    def fixed_base_mul(self, scalars, base_affine: tuple | None = None,
                       backend: str | None = None):
        """[s_i]B for one shared base point -> (n,) device points.

        scalars: host ints.  On the CPU backend this runs on host with a
        cached 8-bit-window fixed-base table (the shared base makes every
        scalar cost <= 32 additions); on TPU it is the batched device
        ladder (one fused program for all n scalars)."""
        if base_affine is None:
            base_affine = self.gen_affine
        if backend is None:
            backend = "host" if jax.default_backend() == "cpu" else "device"
        scalars = [int(s) % self.order for s in scalars]
        if backend == "device":
            g = self.from_affine_ints([base_affine[0]], [base_affine[1]])
            return self.scalar_mul(lb.limbs_from_ints(scalars, 8),
                                   (g[0][0], g[1][0], g[2][0]))
        q = self.fq.q
        tbl = self._fb_tables.get(base_affine)
        if tbl is None:
            # tbl[w][d] = [d * 256^w] B, built with ~32*255 additions
            tbl = []
            P = (base_affine[0], base_affine[1], 1)
            for _ in range(32):
                row = [_J_INF] * 256
                acc = _J_INF
                for d in range(1, 256):
                    acc = _jadd(q, acc, P)
                    row[d] = acc
                tbl.append(row)
                P = _jadd(q, acc, P)            # [256] B_w
            self._fb_tables[base_affine] = tbl
        out = []
        for s in scalars:
            acc = _J_INF
            w = 0
            while s:
                d = s & 255
                if d:
                    acc = _jadd(q, acc, tbl[w][d])
                s >>= 8
                w += 1
            out.append(acc)
        return self._points_from_host(out)

    def msm(self, scalar_limbs, points, pad_pow2: bool = True,
            min_pippenger: int = 128, backend: str | None = None):
        """sum_i s_i * P_i.

        Backend dispatch: on the CPU test backend (and never under a jit
        trace) the sum runs as a classic host big-int Pippenger — the
        device program pays minutes of XLA:CPU compile per shape and still
        runs slower than Python ints.  On TPU it dispatches to the device
        Pippenger path (above) for batches >= `min_pippenger`; small
        batches use per-point windowed ladders + a tree reduction, which
        wins while the 2^c bucket overhead dominates.  Pads the batch to
        the next power of two (zero scalars x infinity) so proof-system
        MSMs of ragged sizes share compiled shapes.
        """
        import numpy as _np

        if backend is None:
            traced = isinstance(scalar_limbs, jax.core.Tracer) or \
                isinstance(points[0], jax.core.Tracer)
            backend = "host" if (not traced
                                 and jax.default_backend() == "cpu") \
                else "device"
        if backend == "host":
            svals = self._scalars_to_ints(scalar_limbs)
            jac = self._points_to_host(points)
            res = _host_pippenger(self.fq.q, svals, jac)
            X, Y, Z = self._points_from_host([res])
            return (X[0], Y[0], Z[0])

        n = scalar_limbs.shape[0]
        import os as _os
        max_chunk = int(_os.environ.get("NFA_MSM_CHUNK", "16384"))
        # Sanitize (ADVICE r4): <= 0 would make the span loop emit
        # zero-size chunks forever, and a non-power-of-two silently
        # defeats the compiled-shape dedup the chunking exists for.
        if max_chunk < 1024:
            max_chunk = 1024
        max_chunk = 1 << (max_chunk.bit_length() - 1)   # round down to 2^k
        traced0 = isinstance(scalar_limbs, jax.core.Tracer)
        # Binary-decomposition chunking (eager only): cover n with
        # DESCENDING power-of-two chunks (each <= max_chunk) plus one
        # small tail, summed with single point adds.  This replaces the
        # old pad-to-next-pow2, which DOUBLED the work of the Groth16
        # prove MSMs (n = m+2 / 2m+3 padded to 2m / 4m — measured 2x on
        # every prove phase, scripts/profile_groth16.py v5e 2026-08-20),
        # and it also bounds peak memory: the sort/prefix-scan pipeline
        # materializes O(n * limbs * windows) int32 temporaries, which
        # OOM'd the v5e at the 2^16-constraint prove before chunking.
        # Chunk sizes are powers of two, so compiled shapes still dedupe
        # across proof systems (4096/8192/16384 recur everywhere).
        if not traced0 and n > 1024 and (n & (n - 1) or n > max_chunk):
            spans = msm_chunk_spans(n, max_chunk)
            acc = None
            for o, sz in spans:
                part = self.msm(
                    scalar_limbs[o:o + sz],
                    (points[0][o:o + sz], points[1][o:o + sz],
                     points[2][o:o + sz]),
                    pad_pow2=True, min_pippenger=min_pippenger,
                    backend="device")
                if acc is None:
                    acc = part
                else:
                    s = self.add((acc[0][None], acc[1][None], acc[2][None]),
                                 (part[0][None], part[1][None],
                                  part[2][None]))
                    acc = (s[0][0], s[1][0], s[2][0])
            return acc
        if pad_pow2 and n & (n - 1):
            size = 1 << (n - 1).bit_length()
            pad = size - n
            scalar_limbs = jnp.concatenate(
                [scalar_limbs,
                 jnp.zeros((pad,) + scalar_limbs.shape[1:],
                           scalar_limbs.dtype)], axis=0)
            inf = self.infinity((pad,))
            points = (jnp.concatenate([points[0], inf[0]]),
                      jnp.concatenate([points[1], inf[1]]),
                      jnp.concatenate([points[2], inf[2]]))
        n_pad = scalar_limbs.shape[0]
        # Canonical small-MSM shape (round 5): every n < 256 pads to 256.
        # The ladder is batch-parallel with a fixed 254-bit step chain, so
        # a 2-point and a 256-point MSM cost the SAME device time — but
        # distinct shapes each pay a minutes-scale axon remote compile of
        # the whole-ladder program.  A Bulletproofs prove+verify alone
        # touches sizes {2,4,8,...,256} across its IPA rounds; without
        # canonicalization that is ~10 cold compiles (plus the dispatch
        # race doubling them), which is what stalled the round-5 zk_ps
        # bench refresh for 37 minutes.  One shape -> one compile.
        traced = isinstance(scalar_limbs, jax.core.Tracer)
        if not traced and n_pad < 256:
            pad = 256 - n_pad
            scalar_limbs = jnp.concatenate(
                [scalar_limbs,
                 jnp.zeros((pad,) + scalar_limbs.shape[1:],
                           scalar_limbs.dtype)], axis=0)
            inf = self.infinity((pad,))
            points = (jnp.concatenate([points[0], inf[0]]),
                      jnp.concatenate([points[1], inf[1]]),
                      jnp.concatenate([points[2], inf[2]]))
            n_pad = 256
        jit_pip = getattr(self, "_jit_pippenger", None)
        if jit_pip is None:
            jit_pip = jax.jit(self._msm_pippenger_impl,
                              static_argnames=("c",))
            self._jit_pippenger = jit_pip
        # The Pippenger-vs-ladder crossover is resolved by MEASUREMENT
        # inside the ambiguous band (utils/dispatch.py; the reference
        # bakes winners in, adaptive_dispatcher.h:34-70).  Outside the
        # band the winner is unambiguous; under a jit trace timing is
        # impossible, so the static min_pippenger threshold applies.
        if not traced and 32 <= n_pad <= 1024:
            from ..utils.dispatch import global_dispatcher
            disp = global_dispatcher()
            op = f"msm_{self.fq.q % 100003}_{id(self)}"
            if op not in disp._candidates:
                disp.register(op, "pippenger",
                              lambda s, p_: self._jit_pippenger(s, p_))
                disp.register(op, "ladder",
                              lambda s, p_: self._msm_ladder(s, p_))
            return disp.dispatch(op, scalar_limbs, points)
        if n_pad >= min_pippenger:
            return jit_pip(scalar_limbs, points)
        return self._msm_ladder(scalar_limbs, points)

    def _msm_ladder_impl(self, scalar_limbs, points):
        """Small-batch MSM body: per-point windowed ladders + tree
        reduction.  Jitted WHOLE (see _msm_ladder) — the eager form paid
        one ~32 ms relay dispatch per reduction level (~9 per call at
        n=256), which dominated every proof-system verify (VERDICT r4
        weak #3: bp_range_verify 419 ms was dispatch floor, not compute)."""
        acc = self._scalar_mul_impl(scalar_limbs, points)  # (B, ...) points
        X, Y, Z = acc
        while X.shape[0] > 1:
            half = X.shape[0] // 2
            s = self._add_impl(
                (X[:half], Y[:half], Z[:half]),
                (X[half:2 * half], Y[half:2 * half], Z[half:2 * half]))
            if X.shape[0] % 2:
                X = jnp.concatenate([s[0], X[-1:]], 0)
                Y = jnp.concatenate([s[1], Y[-1:]], 0)
                Z = jnp.concatenate([s[2], Z[-1:]], 0)
            else:
                X, Y, Z = s
        return (X[0], Y[0], Z[0])

    def _msm_ladder(self, scalar_limbs, points):
        jit_ladder = getattr(self, "_jit_ladder", None)
        if jit_ladder is None:
            jit_ladder = jax.jit(self._msm_ladder_impl)
            self._jit_ladder = jit_ladder
        return jit_ladder(scalar_limbs, points)

    def _eq_impl(self, p, q):
        """Projective equality: X1 Z2^2 == X2 Z1^2 and Y1 Z2^3 == Y2 Z1^3."""
        f = self.fq
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        Z1Z1, Z2Z2 = f.square(Z1), f.square(Z2)
        ex = f.eq(f.mul(X1, Z2Z2), f.mul(X2, Z1Z1))
        ey = f.eq(f.mul(Y1, f.mul(Z2, Z2Z2)), f.mul(Y2, f.mul(Z1, Z1Z1)))
        both_inf = f.is_zero(Z1) & f.is_zero(Z2)
        one_inf = f.is_zero(Z1) ^ f.is_zero(Z2)
        return (ex & ey & ~one_inf) | both_inf


def bn254_g1() -> Curve:
    """BN254 (alt_bn128): y^2 = x^3 + 3, generator (1, 2)."""
    return Curve(bn254_fq(), b=3, gx=1, gy=2, order=BN254_FR)


def bls12_381_g1() -> Curve:
    """BLS12-381 G1: y^2 = x^3 + 4, standard generator."""
    gx = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
    gy = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1
    return Curve(bls12_381_fq(), b=4, gx=gx, gy=gy, order=BLS12_381_FR)
