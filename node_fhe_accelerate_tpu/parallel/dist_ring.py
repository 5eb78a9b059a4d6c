"""Sharded polynomial ring: PolyRing API over a device mesh.

Wires the 4-step distributed NTT (dist_ntt.py) behind the same surface as
the single-chip `PolyRing` (core/poly.py), for degrees or batches beyond
one chip (SURVEY.md §5.7 — the ring-attention analog: the only collective
is the all-to-all coefficient transpose between radix-stage groups).

Coefficients enter and leave as ordinary (..., N) limb planes; internally
they are laid out as an (n1, n2) grid with j2/k1 sharded over the mesh
axis.  Elementwise ring ops shard trivially; multiply runs
twist -> local N1 DFTs -> all-to-all -> local N2 DFTs -> pointwise ->
inverse, bit-exact against the single-chip negacyclic NTT (tested at
N=8192 with real 40-bit primes on an 8-device mesh).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from .dist_ntt import DistNTT
from .mesh import make_mesh
from ..ops.u64 import u64_from_np, u64_to_np

__all__ = ["DistPolyRing"]


class DistPolyRing:
    """Negacyclic ring Z_q[X]/(X^N+1) sharded over a mesh axis.

    API mirrors core/poly.py's PolyRing for the ops that matter at scale:
    add/sub/neg/pointwise/to_ntt/from_ntt/multiply.  NTT-domain values use
    the dist-NTT layout (grid (..., n2, n1), k1 sharded) — opaque to
    callers, consistent between to_ntt/pointwise/from_ntt.
    """

    def __init__(self, degree: int, modulus: int, mesh=None,
                 n1: int | None = None, axis: str = "data"):
        self.n = degree
        self.q = modulus
        if mesh is None:
            ndev = len(jax.devices())
            mesh = make_mesh(ndev, **{axis: ndev})
        self.mesh = mesh
        self.axis = axis
        p = mesh.shape[axis]
        if n1 is None:
            # balanced split with both n1 and n2 divisible by the axis size
            n1 = 1 << ((degree.bit_length() - 1) // 2)
            while n1 % p or (degree // n1) % p:
                n1 *= 2
                if n1 > degree:
                    raise ValueError("degree too small for this mesh axis")
        if degree % n1 or n1 % p or (degree // n1) % p:
            raise ValueError("n1 and N/n1 must be divisible by the axis size")
        self.n1 = n1
        self.n2 = degree // n1
        self.dntt = DistNTT(degree, modulus, n1=n1, axis_name=axis)
        self.ctx = self.dntt.ctx

        # rank-3 local layout (B, rows, cols): batch axes are always
        # flattened into one leading axis so the shard specs line up.
        grid3 = (P(None, None, axis), P(None, None, axis))
        self._fwd = jax.jit(shard_map(
            self.dntt.forward_local, mesh=mesh,
            in_specs=(grid3,), out_specs=grid3))
        self._inv = jax.jit(shard_map(
            self.dntt.inverse_local, mesh=mesh,
            in_specs=(grid3,), out_specs=grid3))
        self._mul = jax.jit(shard_map(
            self.dntt.negacyclic_mul_local, mesh=mesh,
            in_specs=(grid3, grid3), out_specs=grid3))
        self._pw = jax.jit(shard_map(
            self.dntt.pointwise_local, mesh=mesh,
            in_specs=(grid3, grid3), out_specs=grid3))
        # Elementwise ops as SINGLE cached executables: eager limb-plane
        # arithmetic dispatches ~6 primitive compiles per ring op, and at
        # N=16384 the XLA:CPU compile pipeline intermittently aborts under
        # that load (see tests/conftest.py); one jitted program per op
        # shape also cuts dispatch overhead for key-generation loops.
        self._add_j = jax.jit(self.ctx.add)
        self._sub_j = jax.jit(self.ctx.sub)
        self._neg_j = jax.jit(self.ctx.neg)
        self._mul_j = jax.jit(self.ctx.mul)

    # -- layout ---------------------------------------------------------------
    def to_grid(self, planes):
        """(..., N) -> (B, n1, n2) coefficient grid + batch shape."""
        batch = planes[0].shape[:-1]
        shp = (-1, self.n1, self.n2)
        return ((planes[0].reshape(shp), planes[1].reshape(shp)), batch)

    def from_grid(self, grid, batch):
        shp = batch + (self.n,)
        return (grid[0].reshape(shp), grid[1].reshape(shp))

    # -- construction / host edges -------------------------------------------
    def from_np(self, coeffs):
        return u64_from_np(np.asarray(coeffs, dtype=np.uint64))

    def to_np(self, planes):
        return u64_to_np(planes)

    def zeros(self, batch=()):
        z = jnp.zeros(batch + (self.n,), jnp.uint32)
        return (z, z)

    def constant(self, value: int, batch=()):
        coeffs = np.zeros(self.n, dtype=np.uint64)
        coeffs[0] = value % self.q
        pl = self.from_np(coeffs)
        if batch:
            pl = (jnp.broadcast_to(pl[0], batch + (self.n,)),
                  jnp.broadcast_to(pl[1], batch + (self.n,)))
        return pl

    # -- sampling (same samplers as core/poly.PolyRing: the coefficient
    # layout is identical (..., N) planes; only transforms are sharded) ------
    def sample_uniform(self, key, batch=()):
        from ..ops import sampling
        return sampling.uniform_mod_q(key, batch + (self.n,), self.ctx)

    def sample_ternary(self, key, batch=()):
        from ..ops import sampling
        return sampling.ternary(key, batch + (self.n,), self.q)

    def sample_gaussian(self, key, std_dev: float, batch=()):
        from ..ops import sampling
        return sampling.gaussian(key, batch + (self.n,), std_dev, self.q)

    # -- elementwise (shard trivially under jit) -------------------------------
    def add(self, a, b):
        return self._add_j(a, b)

    def scalar_mul(self, a, scalar: int):
        from ..ops.u64 import u64_from_int
        return self._mul_j(a, u64_from_int(scalar % self.q))

    def sub(self, a, b):
        return self._sub_j(a, b)

    def neg(self, a):
        return self._neg_j(a)

    # -- transforms ------------------------------------------------------------
    @staticmethod
    def _flat3(planes):
        """batch + (d2, d1) planes -> rank-3 (B, d2, d1) for shard specs."""
        lo, hi = planes
        return (lo.reshape((-1,) + lo.shape[-2:]),
                hi.reshape((-1,) + hi.shape[-2:]))

    def to_ntt(self, a):
        """(..., N) coefficients -> dist-NTT-domain planes of shape
        batch + (n2, n1).  Plain (lo, hi) limb planes — the same contract
        as PolyRing.to_ntt — so elementwise ring ops (add/sub/neg) work on
        NTT-domain values unchanged (CKKS's d1 = a0*b1 + a1*b0 adds in
        the transform domain)."""
        g, batch = self.to_grid(a)
        lo, hi = self._fwd(g)
        shp = batch + lo.shape[-2:]
        return (lo.reshape(shp), hi.reshape(shp))

    def from_ntt(self, a_hat):
        lo, hi = a_hat
        batch = lo.shape[:-2]
        return self.from_grid(self._inv(self._flat3(a_hat)), batch)

    def pointwise(self, a_hat, b_hat):
        batch = a_hat[0].shape[:-2]
        lo, hi = self._pw(self._flat3(a_hat), self._flat3(b_hat))
        shp = batch + lo.shape[-2:]
        return (lo.reshape(shp), hi.reshape(shp))

    def multiply(self, a, b):
        """Full distributed negacyclic product on (..., N) planes."""
        ga, batch = self.to_grid(a)
        gb, _ = self.to_grid(b)
        return self.from_grid(self._mul(ga, gb), batch)
