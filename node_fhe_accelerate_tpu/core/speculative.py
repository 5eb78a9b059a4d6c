"""Speculative execution: multi-LUT PBS, branches, prefetched key switches.

Twin of the reference's `SpeculativePBS`/`SpeculativeBranch`/`PrefetchManager`
(cpp/include/speculative_executor.h:96-338,
cpp/src/speculative_executor.cpp:151-192).  The reference evaluates a PBS
for every possible LUT in a `std::async` thread pool and obliviously selects;
on TPU the same idea is *structural*: the LUT axis becomes a batch axis of
one fused bootstrap program (SURVEY.md §2 parallelism table) — vmapped
multi-LUT PBS with a `jnp.where` select, oblivious by construction.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from .bootstrap import TfheEngine, BootstrapKey, LweCiphertext

__all__ = ["SpeculativePBS", "speculative_select"]


class SpeculativePBS:
    """Evaluate one input under many LUTs in a single batched bootstrap."""

    def __init__(self, engine: TfheEngine):
        self.engine = engine

    def run_all(self, lwe: LweCiphertext, bsk: BootstrapKey,
                luts: Sequence) -> LweCiphertext:
        """Bootstrap the same ciphertext under every LUT at once.

        Returns an LWE batch with leading axis len(luts) — the LUT axis is
        just a batch axis for blind rotate (the accumulator differs per
        LUT, the CMux ladder is shared).
        """
        eng = self.engine
        k = len(luts)
        lut_stack = jnp.stack(list(luts))                   # (k, N)
        a = jnp.broadcast_to(lwe.a, (k,) + lwe.a.shape)
        b = jnp.broadcast_to(lwe.b, (k,) + lwe.b.shape)
        batched = LweCiphertext(a=a, b=b)
        p = eng.p
        acc = jnp.zeros((k,) + lwe.b.shape + (p.glwe_dim + 1, p.poly_degree),
                        jnp.uint32)
        tp = lut_stack.reshape((k,) + (1,) * len(lwe.b.shape)
                               + (p.poly_degree,))
        acc = acc.at[..., p.glwe_dim, :].set(
            jnp.broadcast_to(tp, acc.shape[:-2] + (p.poly_degree,)))
        acc = eng.blind_rotate(acc, batched, bsk)
        extracted = eng.sample_extract(acc)
        return eng.key_switch(extracted, bsk)

    def run_all_funcs(self, lwe: LweCiphertext, bsk: BootstrapKey,
                      funcs: Sequence) -> LweCiphertext:
        """Like run_all but from plaintext functions, sharing ONE blind
        rotate via many-LUT bootstrapping (bootstrap_many_lut) when the
        function count is a power of two within the window budget —
        K times cheaper than the replicated-accumulator path; falls back
        to run_all otherwise."""
        K = len(funcs)
        eng = self.engine
        if K and not (K & (K - 1)) and eng.t * K <= eng.p.poly_degree:
            return eng.bootstrap_many_lut(lwe, bsk, funcs)
        return self.run_all(lwe, bsk, [eng.make_lut(f) for f in funcs])

    def run_and_select(self, lwe: LweCiphertext, bsk: BootstrapKey,
                       luts: Sequence, selector: int) -> LweCiphertext:
        """All-LUT evaluation + oblivious selection
        (speculative_executor.cpp:151-192)."""
        all_out = self.run_all(lwe, bsk, luts)
        return speculative_select(all_out, selector)


def speculative_select(batched: LweCiphertext, index) -> LweCiphertext:
    """Select one result from a LUT-batched LWE, obliviously w.r.t. data:
    a one-hot weighted sum (jnp.where-equivalent, no data-dependent
    control flow)."""
    k = batched.a.shape[0]
    onehot = (jnp.arange(k) == index).astype(jnp.uint32)
    shape_a = (k,) + (1,) * (batched.a.ndim - 1)
    a = jnp.sum(batched.a * onehot.reshape(shape_a), axis=0,
                dtype=jnp.uint32)
    shape_b = (k,) + (1,) * (batched.b.ndim - 1)
    b = jnp.sum(batched.b * onehot.reshape(shape_b), axis=0,
                dtype=jnp.uint32)
    return LweCiphertext(a=a, b=b)
