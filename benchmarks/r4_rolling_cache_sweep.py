"""Measure the rolling-lane-cache restructure (_select_taps/_gather_kernel
hold 2 live lane rolls instead of 2*halo+2) and re-find the optimal row
tiles for the fused demons kernels at 1024/2048/4096, plus the standalone
warp/compose kernels. Each timed config is first checked bit-identical to
the jnp chain (demons step) or the jnp roll path (warp).

Run (real TPU, single process): python benchmarks/r4_rolling_cache_sweep.py
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
    m = re.search(r"(scoped vmem|exceeds|RESOURCE)", msg, re.IGNORECASE)
    if m:
        lo = max(0, m.start() - 80)
        return msg[lo:lo + 300]
    return msg[:300]


def fields(nx, ny, seed=0):
    xs = np.arange(nx, dtype=np.float32)[:, None]
    ys = np.arange(ny, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
    rng = np.random.default_rng(seed)
    u = rng.uniform(-1.4, 1.4, size=(2, nx, ny)).astype(np.float32)
    return jnp.asarray(iref), jnp.asarray(imov), jnp.asarray(u)


def main():
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas, compose_smooth_pallas)
    from opticalflow2d_tpu.pallas_kernels.warp_fused import (
        warp2d_pallas, compose_pallas)
    from opticalflow2d_tpu.ops.warp import warp2d, compose
    from opticalflow2d_tpu.ops.conv import gaussian_smooth
    from opticalflow2d_tpu.solvers.base import derivatives, demons_force

    # On-chip bit-identity of the restructured select chain vs the jnp
    # chain at 1024^2 (interpret-mode equality is pinned by pytest; this
    # pins the Mosaic compile).
    iref, imov, u = fields(1024, 1024)
    c_inc = u * 0.1
    want_a = jax.jit(lambda: gaussian_smooth(
        demons_force(derivatives(iref, warp2d(imov, u)), 1.0, 0.25),
        2.0, 5))()
    got_a = jax.jit(lambda: demons_correspondence_pallas(
        imov, iref, u, 1.0, 0.25, 2.0, 5, halo=2))()
    emit(probe="demonsA_bitcheck_n1024",
         maxdiff=float(jnp.max(jnp.abs(got_a - want_a))))
    want_b = jax.jit(lambda: gaussian_smooth(compose(u, c_inc), 2.0, 5))()
    got_b = jax.jit(lambda: compose_smooth_pallas(u, c_inc, 2.0, 5, halo=2))()
    emit(probe="demonsB_bitcheck_n1024",
         maxdiff=float(jnp.max(jnp.abs(got_b - want_b))))

    for n in (1024, 2048, 4096):
        iref, imov, u = fields(n, n)
        c_inc = u * 0.1

        # jnp references once per size (bounded halo=2 contract holds:
        # |u| <= 1.4).
        want_w = jax.jit(lambda: warp2d(imov, u, halo=2))()

        for tb in (8, 16, 32, 64, 128):
            if n % tb:
                continue
            # Kernel A: warp+gradient+force+smooth.
            try:
                fn = jax.jit(lambda v, tb=tb: demons_correspondence_pallas(
                    imov, iref, v, 1.0, 0.25, 2.0, 5, halo=2, tb=tb))
                fn(u)
                s = kernel_timer(fn, u, iters_lo=50, iters_hi=250)
                emit(probe=f"demonsA_tb{tb}_n{n}", ok=True,
                     us=round(s * 1e6, 1))
            except Exception as exc:
                emit(probe=f"demonsA_tb{tb}_n{n}", ok=False,
                     error=clean_error(exc))
            # Kernel B: compose+smooth.
            try:
                fn = jax.jit(lambda v, tb=tb: compose_smooth_pallas(
                    v, c_inc, 2.0, 5, halo=2, tb=tb))
                fn(u)
                s = kernel_timer(fn, u, iters_lo=50, iters_hi=250)
                emit(probe=f"demonsB_tb{tb}_n{n}", ok=True,
                     us=round(s * 1e6, 1))
            except Exception as exc:
                emit(probe=f"demonsB_tb{tb}_n{n}", ok=False,
                     error=clean_error(exc))

        # Standalone warp: bit-check at the auto tile, then time two tiles.
        got_w = jax.jit(lambda: warp2d_pallas(imov, u, halo=2))()
        emit(probe=f"warp_auto_bitcheck_n{n}",
             maxdiff=float(jnp.max(jnp.abs(got_w - want_w))))
        for tb in (64, 128):
            if n % tb:
                continue
            try:
                fn = jax.jit(lambda v, tb=tb: warp2d_pallas(
                    imov, v, halo=2, tb=tb))
                fn(u)
                s = kernel_timer(fn, u, iters_lo=50, iters_hi=250)
                emit(probe=f"warp_tb{tb}_n{n}", ok=True, us=round(s * 1e6, 1))
            except Exception as exc:
                emit(probe=f"warp_tb{tb}_n{n}", ok=False,
                     error=clean_error(exc))


if __name__ == "__main__":
    main()
