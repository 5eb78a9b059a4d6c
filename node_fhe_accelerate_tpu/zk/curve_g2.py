"""BN254 G2 on device: the Jacobian group law + Pippenger MSM of
zk/curve.py instantiated over the device Fq2 (zk/field2.py).

The device paths (add/double/scalar_mul/_msm_pippenger_impl) are inherited
UNCHANGED — they are written against the abstract field interface and an
Fq2 element is just a 2L-wide limb row.  Only the host-side plumbing is
G2-specific: affine extraction/injection works in coefficient pairs, the
CPU-backend MSM fallback routes to the host Jacobian Pippenger of
zk/pairing.py (g2_msm), and on-curve checks use the twist constant
b2 = 3/(9+u).

This closes the reference's G2 gap for real: its Groth16 G2 ops are G1
placeholders (cpp/src/groth16.cpp:822-870) and its hardware MSM is
G1-only (cpp/src/zk_hardware_accel.mm:118-123); here the prover's
B-in-G2 MSM (zk/groth16.py) dispatches to the same device Pippenger as G1.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .curve import Curve
from .field2 import Field2, bn254_fq2
from . import pairing as pr

__all__ = ["G2Curve", "bn254_g2", "bls12_381_g2"]


class G2Curve(Curve):
    """Short-Weierstrass curve over Fq2 (a = 0, b = twist constant).

    ``host_mod`` supplies the matching host FQ2 tower (zk/pairing.py for
    BN254, zk/pairing_bls.py for BLS12-381) used by the CPU-backend
    fallbacks and affine extraction; the device paths never touch it."""

    def __init__(self, fq2, b, gx, gy, order, host_mod):
        super().__init__(fq2, b, gx, gy, order)
        self._hm = host_mod

    @property
    def FQ2(self):
        return self._hm.FQ2

    # -- host-side checks ------------------------------------------------------
    def is_on_curve_affine(self, x, y) -> bool:
        FQ2 = self.FQ2
        xf, yf = FQ2(list(self.fq._pair(x))), FQ2(list(self.fq._pair(y)))
        return yf * yf - xf * xf * xf == FQ2(list(self.fq._pair(self.b)))

    # -- host <-> device (pair-aware) -------------------------------------------
    def to_affine_pairs(self, pts) -> list:
        """Device Jacobian points -> list of affine (FQ2, FQ2) | None."""
        f: Field2 = self.fq
        x0, x1 = f.decode(pts[0])
        y0, y1 = f.decode(pts[1])
        z0, z1 = f.decode(pts[2])
        x0, x1, y0, y1, z0, z1 = (np.atleast_1d(a)
                                  for a in (x0, x1, y0, y1, z0, z1))
        FQ2 = self.FQ2
        out = []
        for i in range(len(x0)):
            if z0[i] == 0 and z1[i] == 0:
                out.append(None)
                continue
            Z = FQ2([int(z0[i]), int(z1[i])])
            zi = FQ2([1, 0]) / Z
            zi2 = zi * zi
            X = FQ2([int(x0[i]), int(x1[i])]) * zi2
            Y = FQ2([int(y0[i]), int(y1[i])]) * zi2 * zi
            out.append((X, Y))
        return out

    def from_affine_pairs(self, pts: list):
        """Affine (FQ2, FQ2) | None list -> device Jacobian points."""
        xs, ys, zs = [], [], []
        for p in pts:
            if p is None:
                xs.append((1, 0))
                ys.append((1, 0))
                zs.append((0, 0))
            else:
                xs.append(tuple(int(c) for c in p[0].coeffs))
                ys.append(tuple(int(c) for c in p[1].coeffs))
                zs.append((1, 0))
        f: Field2 = self.fq
        return (f.encode(xs), f.encode(ys), f.encode(zs))

    # -- dispatching entry points -------------------------------------------------
    def msm(self, scalar_limbs, points, pad_pow2: bool = True,
            min_pippenger: int = 128, backend: str | None = None):
        """Same dispatch contract as Curve.msm; the CPU-backend fallback is
        the host Jacobian Pippenger over FQ2 (pairing.py g2_msm)."""
        if backend is None:
            traced = isinstance(scalar_limbs, jax.core.Tracer) or \
                isinstance(points[0], jax.core.Tracer)
            backend = "host" if (not traced
                                 and jax.default_backend() == "cpu") \
                else "device"
        if backend == "host":
            svals = self._scalars_to_ints(scalar_limbs)
            aff = self.to_affine_pairs(points)
            msm_fn = getattr(self._hm, "g2_msm", None)
            if msm_fn is not None:
                res = msm_fn(aff, svals)
            else:                     # affine fold (pairing_bls has no MSM)
                res = None
                for p_i, s_i in zip(aff, svals):
                    if p_i is None or s_i % self.order == 0:
                        continue
                    res = self._hm.g2_add(res, self._hm.g2_mul(p_i, s_i))
            X, Y, Z = self.from_affine_pairs([res])
            return (X[0], Y[0], Z[0])
        return super().msm(scalar_limbs, points, pad_pow2=pad_pow2,
                           min_pippenger=min_pippenger, backend="device")

    def fixed_base_mul(self, scalars, base_affine: tuple | None = None,
                       backend: str | None = None):
        """[s_i]B for a shared G2 base; host path = per-scalar double-and-
        add over FQ2 (no int window tables — those are G1-specific)."""
        if base_affine is None:
            base_affine = self.gen_affine
        if backend is None:
            backend = "host" if jax.default_backend() == "cpu" else "device"
        scalars = [int(s) % self.order for s in scalars]
        if backend == "device":
            return super().fixed_base_mul(scalars, base_affine,
                                          backend="device")
        FQ2 = self.FQ2
        base = (FQ2(list(self.fq._pair(base_affine[0]))),
                FQ2(list(self.fq._pair(base_affine[1]))))
        return self.from_affine_pairs(
            [self._hm.g2_mul(base, s) for s in scalars])


def bn254_g2() -> G2Curve:
    """BN254 G2: y^2 = x^3 + 3/(9+u) over Fq2; generator + order from the
    standard parameterization (pairing.py G2_GENERATOR, order = r since we
    only ever hold points in the r-torsion subgroup)."""
    f2 = bn254_fq2()
    b2 = tuple(int(c) for c in pr._B2.coeffs)
    gx = tuple(int(c) for c in pr.G2_GENERATOR[0].coeffs)
    gy = tuple(int(c) for c in pr.G2_GENERATOR[1].coeffs)
    from .field import BN254_FR
    return G2Curve(f2, b2, gx, gy, BN254_FR, pr)


def bls12_381_g2() -> G2Curve:
    """BLS12-381 G2: y^2 = x^3 + 4(1+u) over Fq2 (pairing_bls.py _B2);
    same device stack, 48-digit base field; host fallbacks use the
    pairing_bls tower (affine fold — no Jacobian MSM there yet)."""
    from .field2 import bls12_381_fq2
    from .field import BLS12_381_FR
    from . import pairing_bls as prb
    f2 = bls12_381_fq2()
    b2 = tuple(int(c) for c in prb._B2.coeffs)
    gx = tuple(int(c) for c in prb.G2_GENERATOR[0].coeffs)
    gy = tuple(int(c) for c in prb.G2_GENERATOR[1].coeffs)
    return G2Curve(f2, b2, gx, gy, BLS12_381_FR, prb)
