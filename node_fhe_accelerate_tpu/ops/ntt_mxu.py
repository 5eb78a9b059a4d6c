"""MXU matrix NTT: the four-step NTT as exact f32 matrix multiplies.

The VPU limb-plane NTT (ops/ntt.py) tops out around 1.5M NTT-1024/s on a
v5e chip and is the bound on TFHE bootstrap throughput.  This module moves
the FLOPs to the MXU (the reference's AMX "matrix NTT" idea,
matrix_ntt.cpp:346, done exactly instead of with float roundoff):

* modulus P_MXU = 2^56 - 2^24 + 1 (prime, two-adicity 24), chosen so
  elements are EXACTLY 7 8-bit digits and Solinas folding is digit-aligned
  (2^56 = 7 digits -> fold is a 3-digit shift minus identity);
* a 32-point sub-NTT is ONE f32 matmul against a precomputed
  (32*7, 32*13) block matrix that simultaneously performs the twiddle
  contraction and the digit convolution — every output column sums
  32 * 7 * 255^2 < 2^24, so f32 accumulation is exact on the MXU;
* N = 1024 = 32 x 32 runs as the classic four-step: row sub-NTTs,
  inter-step twiddles, column sub-NTTs (same factorization as
  parallel/dist_ntt.py, so the sharded all-to-all version lifts directly).

Forward-only prototype, bit-exact against the scalar oracle
(tests/test_ntt_mxu.py).  **Measured result (v5e): 42K NTT-1024/s — 35x
SLOWER than the VPU limb-plane path.**  The matmuls are fine; the loss is
layout: the trailing digit axis (7-16 wide) leaves 90% of the 128-wide
vector lanes idle through every fold/carry sweep.  Round-2 direction:
digit-major layout (digits as a leading axis, polynomial/batch on the
lane axis) with the conv matrix acting on a transposed operand, so folds
run at full lane width and only the matmul pays a transpose.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .primes import is_prime
from .ntt import find_primitive_2n_root

__all__ = ["P_MXU", "MxuNTT"]

P_MXU = (1 << 56) - (1 << 24) + 1
D = 7          # digits per element (exactly 56 bits)
COLS = 2 * D - 1


def _to_digits(x: np.ndarray) -> np.ndarray:
    """uint64-ish ints -> (..., D) int32 digits (host)."""
    out = np.empty(x.shape + (D,), dtype=np.int32)
    v = x.astype(object)
    for i in range(D):
        out[..., i] = np.asarray(v & 0xFF, dtype=np.int32)
        v >>= 8
    return out


class MxuNTT:
    """Cyclic/negacyclic NTT of size n1*n2 over P_MXU via digit matmuls."""

    def __init__(self, degree: int, n1: int = 32):
        if degree % n1:
            raise ValueError("n1 must divide N")
        self.n = degree
        self.n1 = n1
        self.n2 = degree // n1
        p = P_MXU
        assert is_prime(p)
        self.psi = find_primitive_2n_root(degree, p)
        self.omega = self.psi * self.psi % p
        self.w1 = pow(self.omega, self.n2, p)   # order n1
        self.w2 = pow(self.omega, self.n1, p)   # order n2

        # Sub-NTT block matrices: M[j*D + d, k*COLS + (d+e)] += W[j,k]_digit_e
        self.m1 = jnp.asarray(self._sub_ntt_matrix(self.w1, n1))
        self.m2 = jnp.asarray(self._sub_ntt_matrix(self.w2, self.n2))

        # twist (negacyclic) and inter-step twiddle digit tables
        tw = np.array([pow(self.psi, j, p) for j in range(degree)],
                      dtype=object)
        self.twist_digits = jnp.asarray(
            _to_digits_obj(tw).astype(np.float32))
        step = np.empty((n1, self.n2), dtype=object)
        for k1 in range(n1):
            for j2 in range(self.n2):
                step[k1, j2] = pow(self.omega, k1 * j2, p)
        self.step_digits = jnp.asarray(
            _to_digits_obj(step).astype(np.float32))

    @staticmethod
    def _sub_ntt_matrix(w: int, m: int) -> np.ndarray:
        """(m*D, m*COLS) f32 matrix: digit-expanded DFT matrix with the
        digit-convolution column mapping baked in."""
        p = P_MXU
        out = np.zeros((m * D, m * COLS), dtype=np.float32)
        for j in range(m):
            for k in range(m):
                wjk = pow(w, j * k, p)
                for e in range(D):
                    digit = (wjk >> (8 * e)) & 0xFF
                    if digit == 0:
                        continue
                    for d in range(D):
                        out[j * D + d, k * COLS + d + e] += digit
        # NOTE: the digit value multiplies the INPUT digit d; since the
        # matrix entry must be sum_e [col==d+e] * digit_e(W[j,k]), the loop
        # above accumulates digit_e at column d+e for every input digit d —
        # the multiplication by the input digit happens in the matmul.
        return out

    # -- digit-domain modular reduction -------------------------------------
    @staticmethod
    def _carry_fix(cols, rounds: int = 3):
        """Reduce column magnitudes (< 2^24) toward 8-bit digits.  Leaves
        digits in [0, 256] (redundant top bit handled by the fold)."""
        x = cols
        for _ in range(rounds):
            lo = x & 255
            hi = x >> 8
            x = lo + jnp.concatenate(
                [jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)
        return x

    @staticmethod
    def _fold_mod_p(cols):
        """(..., C<=16) int32 digit columns (values < 2^24) -> (..., D)
        digits in [0, 255] representing the same value mod P_MXU (possibly
        a non-canonical residue < 2^56 — sufficient for the next stage's
        exact matmul bound).

        Uses 2^56 = 2^24 - 1 (mod p): the high digits H fold to
        (H << 3 digits) - H, which keeps the running VALUE nonnegative
        (lo + H*(2^24 - 1) >= 0) even though individual digits go negative;
        signed carry ripples then settle exactly.
        """
        x = cols
        # pad so magnitude-reduction carries are never dropped
        x = _pad_to(x, x.shape[-1] + 2)
        x = MxuNTT._carry_fix(x, rounds=3)          # digits <= 256
        while x.shape[-1] > D + 1:
            lo = x[..., :D]
            hi = x[..., D:]                          # length <= 11
            m = hi.shape[-1]
            # shifted = hi << 3 digits (length m+3), minus hi
            sh = jnp.concatenate(
                [jnp.zeros(hi.shape[:-1] + (3,), x.dtype), hi], axis=-1)
            width = max(D, m + 3) + 1      # slack column: carries must not drop
            x = (_pad_to(lo, width) + _pad_to(sh, width)
                 - _pad_to(hi, width))
            # signed settle: digits in [-256, 512+]; a few rounds shrink them
            for _ in range(3):
                lo_d = x & 255
                hi_d = x >> 8
                x = lo_d + jnp.concatenate(
                    [jnp.zeros_like(hi_d[..., :1]), hi_d[..., :-1]], axis=-1)
        # final: maybe one top digit (value < 2^57); fold it and settle fully
        if x.shape[-1] == D + 1:
            top = x[..., D]
            x = x[..., :D]
            x = x.at[..., 3].add(top)
            x = x.at[..., 0].add(-top)
        # exact signed ripple: borrows move one digit per round; value >= 0
        # guarantees convergence within array length + slack
        for _ in range(D + 3):
            lo_d = x & 255
            hi_d = x >> 8
            carry_out = hi_d[..., -1]
            x = lo_d + jnp.concatenate(
                [jnp.zeros_like(hi_d[..., :1]), hi_d[..., :-1]], axis=-1)
            # top carry folds again (value may cross 2^56 transiently)
            x = x.at[..., 3].add(carry_out)
            x = x.at[..., 0].add(-carry_out)
        return x

    # -- elementwise digit multiply (twiddles) ------------------------------
    @staticmethod
    def _ewise_mul(a_digits, t_digits):
        """(..., D) x (..., D) -> (..., COLS) columns via outer product."""
        prod = (a_digits.astype(jnp.float32)[..., :, None]
                * t_digits[..., None, :])          # (..., D, D)
        cols = jnp.zeros(prod.shape[:-2] + (COLS,), jnp.float32)
        for d in range(D):
            cols = cols.at[..., d: d + D].add(prod[..., d, :])
        return cols.astype(jnp.int32)

    # -- transforms ----------------------------------------------------------
    def forward_negacyclic(self, a_digits):
        """(..., N, D) int32 strict digits -> (..., N, D), output indexed
        X[k2*n1 + k1] (the 4-step ordering; matches
        DistNTT.reference_forward)."""
        n1, n2 = self.n1, self.n2
        batch = a_digits.shape[:-2]

        # 1. twist by psi^j (elementwise digit conv + fold)
        x = self._fold_mod_p(self._ewise_mul(a_digits, self.twist_digits))
        # 2. grid (j1, j2): j = j1*n2 + j2
        x = x.reshape(batch + (n1, n2, D))
        # 3. row sub-NTTs along j1: matmul with m1
        #    arrange (batch, n2, n1*D) @ (n1*D, n1*COLS)
        xt = jnp.swapaxes(x, -3, -2).reshape(batch + (n2, n1 * D))
        y = jnp.matmul(xt.astype(jnp.float32), self.m1,
                       preferred_element_type=jnp.float32)
        y = y.astype(jnp.int32).reshape(batch + (n2, n1, COLS))
        y = self._fold_mod_p(y)                       # (batch, n2, n1=k1, D)
        y = jnp.swapaxes(y, -3, -2)                   # (batch, k1, j2, D)
        # 4. inter-step twiddles omega^(k1*j2)
        y = self._fold_mod_p(self._ewise_mul(y, self.step_digits))
        # 5. column sub-NTTs along j2: matmul with m2
        yt = y.reshape(batch + (n1, n2 * D))
        z = jnp.matmul(yt.astype(jnp.float32), self.m2,
                       preferred_element_type=jnp.float32)
        z = z.astype(jnp.int32).reshape(batch + (n1, n2, COLS))
        z = self._fold_mod_p(z)                       # (batch, k1, k2, D)
        # 6. output ordering X[k2*n1 + k1]
        z = jnp.swapaxes(z, -3, -2)                   # (batch, k2, k1, D)
        return z.reshape(batch + (self.n, D))

    # -- host helpers --------------------------------------------------------
    @staticmethod
    def to_digits_host(values: np.ndarray):
        return jnp.asarray(_to_digits_obj(values.astype(object)))

    @staticmethod
    def digits_to_ints(arr) -> np.ndarray:
        a = np.asarray(arr, dtype=np.int64)
        out = np.zeros(a.shape[:-1], dtype=object)
        for i in range(a.shape[-1]):
            out += (a[..., i].astype(object) % 256) << (8 * i)
        return out


def _to_digits_obj(x: np.ndarray) -> np.ndarray:
    out = np.empty(x.shape + (D,), dtype=np.int32)
    it = np.nditer(x, flags=["multi_index", "refs_ok"])
    for v in it:
        val = int(v.item())
        for i in range(D):
            out[it.multi_index + (i,)] = (val >> (8 * i)) & 0xFF
    return out


def _pad_to(x, d):
    if x.shape[-1] == d:
        return x
    pad = jnp.zeros(x.shape[:-1] + (d - x.shape[-1],), x.dtype)
    return jnp.concatenate([x, pad], axis=-1)
