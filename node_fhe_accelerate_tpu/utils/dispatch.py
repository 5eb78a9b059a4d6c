"""Adaptive backend dispatch: benchmark-driven kernel selection.

Twin of the reference's `adaptive_dispatcher`
(cpp/include/adaptive_dispatcher.h:24-107): the reference bakes in winners
from its benchmark suite (Barrett-unrolled modmul, Montgomery NTT); here the
dispatcher *measures* registered implementations per (op, shape-class) on
the live backend once, caches the winner, and routes subsequent calls.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax

__all__ = ["AdaptiveDispatcher", "Candidate"]


@dataclass
class Candidate:
    name: str
    fn: Callable
    prepare: Callable | None = None   # optional per-shape warmup/compile


@dataclass
class _Selection:
    name: str
    fn: Callable
    timings: dict


class AdaptiveDispatcher:
    """Measure-once-per-shape-class dispatch
    (adaptive_dispatcher.h:34-70)."""

    def __init__(self, warmup: int = 1, iters: int = 3):
        self._candidates: dict[str, list[Candidate]] = {}
        self._cache: dict[tuple, _Selection] = {}
        self.warmup = warmup
        self.iters = iters

    def register(self, op: str, name: str, fn: Callable):
        self._candidates.setdefault(op, []).append(Candidate(name, fn))

    def _shape_class(self, args) -> tuple:
        def one(x):
            if hasattr(x, "shape"):
                return tuple(x.shape) + (str(getattr(x, "dtype", "")),)
            if isinstance(x, (tuple, list)):
                return tuple(one(e) for e in x)
            return type(x).__name__
        return tuple(one(a) for a in args)

    def dispatch(self, op: str, *args):
        cands = self._candidates.get(op)
        if not cands:
            raise KeyError(f"no candidates registered for {op!r}")
        key = (op, self._shape_class(args))
        sel = self._cache.get(key)
        if sel is None:
            sel = self._select(cands, args)
            self._cache[key] = sel
        return sel.fn(*args)

    def _select(self, cands, args) -> _Selection:
        timings = {}
        best = None
        for cand in cands:
            try:
                for _ in range(self.warmup):
                    out = cand.fn(*args)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(self.iters):
                    out = cand.fn(*args)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / self.iters
                timings[cand.name] = dt
                if best is None or dt < timings[best.name]:
                    best = cand
            except Exception as e:  # candidate unsupported on this backend
                timings[cand.name] = float("inf")
        if best is None:
            raise RuntimeError("no dispatch candidate succeeded")
        return _Selection(name=best.name, fn=best.fn, timings=timings)

    def selection_table(self) -> dict:
        """op/shape -> winner + timings (the reference's benchmark-driven
        defaults table, made explicit)."""
        return {k: {"winner": v.name, "timings": dict(v.timings)}
                for k, v in self._cache.items()}
