"""Randomness for keys/encryption: uniform, ternary, gaussian, binary.

TPU-native twin of the reference's `SecureRandom`
(cpp/include/key_manager.h:170-211, cpp/src/key_manager.cpp:60-120), built on
jax.random (threefry) so sampling is reproducible, jit-able, and batchable.
Semantics match the reference:

* ternary: uniform over {-1, 0, 1} mapped to {q-1, 0, 1} (sample_ternary)
* gaussian: round(N(0, std_dev)) mod q, std_dev in *absolute integer units*
  (sample_gaussian, key_manager.cpp:85-110).  The reference passes fractional
  `lwe_noise_std` (e.g. 3.2e-11) directly, so TFHE-preset errors round to 0
  and LWE security collapses; this build does NOT reproduce that — callers
  (EncryptionEngine/KeyManager) scale fractional stds by q and clamp to
  >= 3.2 absolute via ParameterSet.noise_std_absolute().
* uniform: uniform in [0, q) (random_u64_range)

All samplers return uint32 limb-plane pairs of the requested shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .modular import ModCtx
from .u64 import U32

__all__ = ["uniform_mod_q", "ternary", "gaussian", "binary_planes"]


def uniform_mod_q(key, shape, ctx: ModCtx):
    """Uniform in [0, q): 64 random bits reduced mod q (bias < 2^-(64-logq),
    comparable to the reference's modulo-range draw)."""
    lo = jax.random.bits(key, shape, dtype=jnp.uint32)
    hi = jax.random.bits(jax.random.fold_in(key, 1), shape, dtype=jnp.uint32)
    z = jnp.zeros(shape, U32)
    return ctx.reduce_128((lo, hi, z, z))


def ternary(key, shape, q: int):
    """Uniform over {q-1, 0, 1} as limb planes."""
    r = jax.random.randint(key, shape, 0, 3, dtype=jnp.int32)
    qm1_lo = np.uint32((q - 1) & 0xFFFFFFFF)
    qm1_hi = np.uint32(((q - 1) >> 32) & 0xFFFFFFFF)
    lo = jnp.where(r == 0, jnp.uint32(0),
                   jnp.where(r == 1, jnp.uint32(1), qm1_lo))
    hi = jnp.where(r == 2, qm1_hi, jnp.uint32(0))
    return (lo, hi)


def gaussian(key, shape, std_dev: float, q: int):
    """round(N(0, std_dev)) mod q as limb planes; |sample| must be < 2^31.

    Implemented without 64-bit dtypes (JAX x64 stays off): positive samples
    map to (s, 0); negative to q - |s| computed limb-wise.
    """
    z = jax.random.normal(key, shape, dtype=jnp.float32) * std_dev
    s = jnp.round(z).astype(jnp.int32)
    mag = jnp.abs(s).astype(U32)
    q_lo = np.uint32(q & 0xFFFFFFFF)
    q_hi = np.uint32((q >> 32) & 0xFFFFFFFF)
    # q - mag: borrow when mag > q_lo
    neg_lo = q_lo - mag
    neg_hi = q_hi - (q_lo < mag).astype(U32)
    is_neg = s < 0
    lo = jnp.where(is_neg, neg_lo, mag)
    hi = jnp.where(is_neg, neg_hi, jnp.uint32(0))
    # s == 0 stays 0 (is_neg false), consistent with mod q canonical form.
    return (lo, hi)


def binary_planes(key, shape):
    """Uniform over {0, 1} as limb planes (sample_binary)."""
    b = jax.random.bernoulli(key, 0.5, shape).astype(U32)
    return (b, jnp.zeros(shape, U32))
