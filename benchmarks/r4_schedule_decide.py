"""Settle cached-vs-rolling for the fused demons kernels WITHIN one
harness (cross-script comparisons proved unreliable: the tile sweep read
~30% slower than the hybrid validator for identical configs — closure
constants vs loop-carried args change fori_loop pipelining). Also re-bench
blocked diffusion k=8 @2048 at its stabilized (32, 8) tiling.

Run (real TPU, single process): python benchmarks/r4_schedule_decide.py
Appends JSON lines to benchmarks/r4_results.jsonl.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from opticalflow2d_tpu.utils.profiling import kernel_timer

OUT = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")
_ANSI = re.compile(r"\x1b\[[0-9;]*m")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def clean_error(exc) -> str:
    msg = " ".join(_ANSI.sub("", str(exc)).split())
    m = re.search(r"(Scoped allocation|byte size)", msg)
    if m:
        return msg[max(0, m.start() - 40):m.start() + 200]
    return msg[:240]


def fields(nx, ny, seed=0):
    rng = np.random.default_rng(seed)
    xs = np.arange(nx, dtype=np.float32)[:, None]
    ys = np.arange(ny, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
    u = rng.uniform(-1.4, 1.4, size=(2, nx, ny)).astype(np.float32)
    return jnp.asarray(iref), jnp.asarray(imov), jnp.asarray(u)


def probe(tag, fn, *args, lo=50, hi=250):
    try:
        def step(state):
            return (fn(*state),) + tuple(state[1:])

        s = kernel_timer(step, (args[0],) + tuple(args[1:]),
                         iters_lo=lo, iters_hi=hi)
        emit(probe=tag, ok=True, us=round(s * 1e6, 1))
    except Exception as exc:
        emit(probe=tag, ok=False, error=clean_error(exc))


def main():
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas, compose_smooth_pallas)

    for n in (1024, 2048):
        iref, imov, u = fields(n, n)
        for roll in (False, True):
            tag = "roll" if roll else "cache"
            probe(f"demonsA_{tag}_auto_n{n}",
                  lambda v, im, ir, roll=roll: demons_correspondence_pallas(
                      im, ir, v, 1.0, 0.25, 2.0, 5, halo=2, rolling=roll),
                  u, imov, iref)
            probe(f"demonsB_{tag}_auto_n{n}",
                  lambda v, c, roll=roll: compose_smooth_pallas(
                      v, c, 2.0, 5, halo=2, rolling=roll),
                  u, u * 0.1)

    # Blocked diffusion k=8 @2048 at the stabilized (32, 8) tiling.
    from opticalflow2d_tpu.solvers.base import derivatives
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs, _pick_tiles)

    # The k16 e2e @2048 failed to compile where k8 passed; the driver runs
    # with_errors=True (Logger sums), which the standalone benches never
    # compiled at these tiles. Probe each (level, tile) the 2048 pyramid
    # uses, errors ON.
    for nn, kk in ((2048, 16), (1024, 16), (2048, 8), (1024, 8)):
        ir2, im2, u2 = fields(nn, nn)
        d2 = derivatives(ir2, im2)
        g2 = stack_derivs(d2.grad_i, d2.it)
        tl = _pick_tiles(nn, kk, None, nn)
        try:
            jax.jit(lambda v, gg, kk=kk: diffusion_block_pallas(
                v, gg, 0.5, k=kk, with_errors=True))(u2, g2)
            emit(probe=f"diff_block_k{kk}_errors_n{nn}", tiles=list(tl),
                 ok=True)
        except Exception as exc:
            emit(probe=f"diff_block_k{kk}_errors_n{nn}", tiles=list(tl),
                 ok=False, error=clean_error(exc))

    n, k = 2048, 8
    iref, imov, u = fields(n, n)
    d = derivatives(iref, imov)
    g = stack_derivs(d.grad_i, d.it)
    tiles = _pick_tiles(n, k, None, n)
    try:
        s = kernel_timer(
            lambda st: (diffusion_block_pallas(
                st[0], st[1], 0.5, k=k, with_errors=False)[0], st[1]),
            (u, g), iters_lo=20, iters_hi=120) / k
        emit(bench=f"diffusion_block_k{k}", n=n, tiles=list(tiles),
             us_per_iter=round(s * 1e6, 1),
             gpix_s=round(n * n / s / 1e9, 1))
    except Exception as exc:
        emit(bench=f"diffusion_block_k{k}", n=n, tiles=list(tiles),
             error=clean_error(exc))


if __name__ == "__main__":
    main()
