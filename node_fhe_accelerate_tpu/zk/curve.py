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

__all__ = ["Curve", "bn254_g1", "bls12_381_g1", "Point"]


Point = tuple  # (X, Y, Z) limb arrays; Z == 0 encodes infinity


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
        """Host: decode to (x, y) int arrays; infinity -> (None entries)."""
        X, Y, Z = p
        f = self.fq
        zinv = f.inv(Z)
        zinv2 = f.square(zinv)
        x = f.decode(f.mul(X, zinv2))
        y = f.decode(f.mul(Y, f.mul(zinv2, zinv)))
        inf = np.asarray(self.is_infinity(p))
        return x, y, inf

    def is_infinity(self, p):
        return self.fq.is_zero(p[2])

    def is_on_curve_affine(self, x: int, y: int) -> bool:
        q = self.fq.q
        return (y * y - (x * x * x + self.b)) % q == 0

    # -- group law (branchless) ---------------------------------------------
    def _double_impl(self, p):
        """dbl-2009-l for a=0: 3M + 5S (zk_elliptic_curve.cpp double)."""
        f = self.fq
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

    def _add_impl(self, p, q):
        """add-2007-bl with doubling/infinity cases resolved by masks."""
        f = self.fq
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

        dbl = self._double_impl(p)
        use_dbl = same_x & same_y & ~p_inf & ~q_inf
        to_inf = same_x & ~same_y & ~p_inf & ~q_inf

        X3 = f.select(use_dbl, dbl[0], X3)
        Y3 = f.select(use_dbl, dbl[1], Y3)
        Z3 = f.select(use_dbl, dbl[2], Z3)
        Z3 = f.select(to_inf, jnp.zeros_like(Z3), Z3)
        # p or q at infinity -> the other operand
        X3 = f.select(p_inf, X2, X3)
        Y3 = f.select(p_inf, Y2, Y3)
        Z3 = f.select(p_inf, Z2, Z3)
        X3 = f.select(q_inf, X1, X3)
        Y3 = f.select(q_inf, Y1, Y3)
        Z3 = f.select(q_inf, Z1, Z3)
        return (X3, Y3, Z3)

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

    def msm(self, scalar_limbs, points, pad_pow2: bool = True):
        """sum_i s_i * P_i: batched double-and-add + tree reduction.

        Pads the batch to the next power of two (zero scalars x infinity)
        so proof-system MSMs of ragged sizes share compiled shapes.
        (The reference's `msm`/`msm_gpu` is Pippenger on CPU,
        zk_elliptic_curve.h:193-254; a windowed Pippenger over these batched
        primitives is the planned fast path.)
        """
        import numpy as _np

        n = scalar_limbs.shape[0]
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
        acc = self.scalar_mul(scalar_limbs, points)   # (B, ...) points
        X, Y, Z = acc
        while X.shape[0] > 1:
            half = X.shape[0] // 2
            s = self.add((X[:half], Y[:half], Z[:half]),
                         (X[half:2 * half], Y[half:2 * half], Z[half:2 * half]))
            if X.shape[0] % 2:
                X = jnp.concatenate([s[0], X[-1:]], 0)
                Y = jnp.concatenate([s[1], Y[-1:]], 0)
                Z = jnp.concatenate([s[2], Z[-1:]], 0)
            else:
                X, Y, Z = s
        return (X[0], Y[0], Z[0])

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
