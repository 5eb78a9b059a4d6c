"""Polynomial ring R_q = Z_q[X]/(X^N+1) with RNS support.

TPU-native twin of the reference's `Polynomial`/`PolynomialRing`
(cpp/include/polynomial_ring.h:101-516, cpp/src/polynomial_ring.cpp).  Where
the reference stores heap buffers with a cache-aligned allocator and mutates
in place, this build is functional: a polynomial is a uint32 limb-plane pair
of shape (..., N) (or a tuple of pairs for RNS), and every op is pure jnp so
`jit` fuses chains of ring ops into a few TPU kernels.  Batch axes lead — a
"batch of polynomials" is just (..., B, N) and every op is batched for free.

The NTT-domain flag that the reference keeps on the Polynomial object
(`is_ntt`, polynomial_ring.h) is the caller's responsibility here (carried by
Ciphertext metadata in core/encrypt.py), keeping the array types uniform.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.modular import ModCtx
from ..ops.ntt import NTTContext
from ..ops.u64 import u64_from_np, u64_to_np, u64_from_int, U32
from ..ops import sampling

__all__ = ["PolyRing"]


class PolyRing:
    """Arithmetic in Z_q[X]/(X^N+1) for one modulus (RNS = list of rings).

    Mirrors `PolynomialRing` (polynomial_ring.cpp): add/sub/negate/scalar-mul
    elementwise, multiply = NTT -> pointwise -> INTT — with the corrected
    negacyclic NTT (see ops/ntt.py).
    """

    def __init__(self, degree: int, modulus: int):
        self.n = degree
        self.q = modulus
        self.ntt = NTTContext(degree, modulus)
        self.ctx: ModCtx = self.ntt.ctx
        # Jit the transform chains once per ring: eager op-by-op dispatch of
        # the log2(N)-stage limb-plane butterflies is orders of magnitude
        # slower than the fused compiled form (and jit-in-jit just inlines).
        self._fwd = jax.jit(self.ntt.forward)
        self._inv = jax.jit(self.ntt.inverse)
        self._mul = jax.jit(self.ntt.negacyclic_mul)
        self._pw = jax.jit(self.ctx.mul)

    # -- construction --------------------------------------------------------
    def zeros(self, batch=()):
        z = jnp.zeros(batch + (self.n,), U32)
        return (z, z)

    def constant(self, value: int, batch=()):
        """Polynomial with coeff[0] = value mod q, rest zero."""
        coeffs = np.zeros(self.n, dtype=np.uint64)
        coeffs[0] = value % self.q
        p = self.from_np(coeffs)
        if batch:
            p = (jnp.broadcast_to(p[0], batch + (self.n,)),
                 jnp.broadcast_to(p[1], batch + (self.n,)))
        return p

    def from_np(self, coeffs):
        return u64_from_np(np.asarray(coeffs, dtype=np.uint64))

    def to_np(self, p):
        return u64_to_np(p)

    # -- sampling ------------------------------------------------------------
    def sample_uniform(self, key, batch=()):
        return sampling.uniform_mod_q(key, batch + (self.n,), self.ctx)

    def sample_ternary(self, key, batch=()):
        return sampling.ternary(key, batch + (self.n,), self.q)

    def sample_gaussian(self, key, std_dev: float, batch=()):
        return sampling.gaussian(key, batch + (self.n,), std_dev, self.q)

    # -- elementwise ring ops ------------------------------------------------
    def add(self, a, b):
        return self.ctx.add(a, b)

    def sub(self, a, b):
        return self.ctx.sub(a, b)

    def neg(self, a):
        return self.ctx.neg(a)

    def scalar_mul(self, a, scalar: int):
        return self.ctx.mul(a, u64_from_int(scalar % self.q))

    def pointwise(self, a, b):
        return self._pw(a, b)

    # -- transforms ----------------------------------------------------------
    def to_ntt(self, a):
        return self._fwd(a)

    def from_ntt(self, a):
        return self._inv(a)

    def multiply(self, a, b):
        """Full negacyclic product of coefficient-form polynomials."""
        return self._mul(a, b)

    # -- host helpers --------------------------------------------------------
    def multiply_np(self, a, b):
        """Host oracle (Kronecker substitution)."""
        from ..ops.ntt import negacyclic_mul_np

        return negacyclic_mul_np(a, b, self.q)
