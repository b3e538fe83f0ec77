"""Profiling & timing utilities.

Replaces the reference's bespoke ``st_time`` decorator and reflective
``Benchmark`` runner (benchmarks/classes.py:4-37) with:

- :class:`Benchmark` — the same reflective runner (methods named
  ``benchmark_*`` are discovered and timed), kept for familiarity;
- :func:`timed` — wall-clock decorator (st_time equivalent) that
  block-until-readies jax outputs so device work is actually counted
  (the reference needed manual ``torch.cuda.synchronize``,
  benchmarks/walsh_plot.py:44);
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory;
- :func:`chain_time` — per-op seconds via an on-device dependent chain
  with difference timing (cancels fixed dispatch latency; essential on
  remote-tunnel TPU backends).
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["Benchmark", "timed", "trace", "chain_time"]


def timed(fn: Callable) -> Callable:
    """Print wall-clock of each call, device-synchronized."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        print(f"{fn.__name__}: {time.perf_counter() - t0:.6f}s", flush=True)
        return out

    return wrapper


class Benchmark:
    """Reflectively run all ``benchmark_*`` methods (reference
    benchmarks/classes.py:28-37 pattern)."""

    def run(self) -> dict:
        results = {}
        for name in sorted(dir(self)):
            if not name.startswith("benchmark_"):
                continue
            fn = getattr(self, name)
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out) if out is not None else None
            results[name] = time.perf_counter() - t0
            print(f"{name}: {results[name]:.6f}s", flush=True)
        return results


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/whvi_trace"):
    """jax.profiler trace context; view with TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def chain_time(fn: Callable, x, iters: int = 200, reps: int = 3) -> float:
    """Per-application seconds of ``x -> fn(x)`` over an on-device
    dependent chain, difference-timed (t(2N) - t(N)) to cancel fixed
    dispatch/fetch latency.

    Completion is forced by FETCHING a full on-device reduction of the
    final iterate — ``block_until_ready`` does not reliably block on the
    remote-tunnel TPU backend (CLAUDE.md) and was measured returning up
    to ~1.6x early for XLA-only chains (round-2 re-measurement); the
    scalar fetch is the only trustworthy sync. The reduction runs once
    per *chain*, so its cost amortizes to ~nothing per iteration and
    cancels in the difference anyway."""

    @functools.partial(jax.jit, static_argnames="n")
    def chained(v, n):
        w = jax.lax.fori_loop(0, n, lambda i, w: fn(w), v)
        return jax.tree.reduce(
            lambda acc, l: acc + jnp.sum(l), w, jnp.zeros(())
        )

    def run(n):
        float(chained(x, n))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(run(2 * iters) - run(iters), 1e-9) / iters
