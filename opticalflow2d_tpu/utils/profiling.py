"""Profiling helpers (SURVEY.md §5: tracing/profiling is absent in the
reference — only the demo's tic/toc. Here: ``jax.profiler`` traces plus a
robust kernel timer that works through the remote-TPU tunnel)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tpuflow2d-trace"):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def kernel_timer(fn: Callable, state, iters_lo: int = 200, iters_hi: int = 1000,
                 reps: int = 3) -> float:
    """Per-iteration seconds of the ``state -> state`` step ``fn`` on the
    live backend, measured as the slope between two loop lengths so fixed
    dispatch/tunnel overhead cancels. The jitted program reduces to a scalar
    which is fetched to host — the only reliable barrier through the remote
    tunnel (block_until_ready can return early there)."""

    def make(n):
        @jax.jit
        def run(s):
            out = jax.lax.fori_loop(0, n, lambda _, x: fn(x), s)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b), out, jnp.float32(0)
            )
        return run

    lo, hi = make(iters_lo), make(iters_hi)

    def best(run):
        float(run(state))  # compile + warmup
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(state))
            b = min(b, time.perf_counter() - t0)
        return b

    t_lo, t_hi = best(lo), best(hi)
    return max(t_hi - t_lo, 1e-12) / (iters_hi - iters_lo)
