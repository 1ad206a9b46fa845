"""Round-4 size-scaling study on one chip: do the hot kernels hold their
per-pixel cost as the grid grows past 1024^2 (the size every earlier table
used)? Covers the headline blocked-diffusion kernel, the fused demons
step, the elastic red-black sweep, and the curvature matmul-DCT tiers
(whose FLOPs grow as N^3 while everything else grows as N^2 — the one
kernel with a size-dependent story).

Run (real TPU, single process):  python benchmarks/r4_size_scaling.py [N ...]
(sizes default to 1024 2048 4096). Appends JSON lines to
benchmarks/r4_results.jsonl.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from opticalflow2d_tpu.utils.profiling import kernel_timer

OUT = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def fields(nx, ny, seed=0):
    rng = np.random.default_rng(seed)
    xs = np.arange(nx, dtype=np.float32)[:, None]
    ys = np.arange(ny, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
    u = rng.uniform(-1.4, 1.4, size=(2, nx, ny)).astype(np.float32)
    return jnp.asarray(iref), jnp.asarray(imov), jnp.asarray(u)


def main():
    from opticalflow2d_tpu.solvers.base import derivatives, Derivatives
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs, _pick_tiles)
    from opticalflow2d_tpu.pallas_kernels import elastic_block
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas, compose_smooth_pallas)
    from opticalflow2d_tpu.solvers.elastic import elastic_step
    from opticalflow2d_tpu.solvers.curvature import make_curvature_step

    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    # BENCHES=elastic,curvature restricts the families (re-collecting rows
    # lost to a tunnel drop without re-paying the full sweep).
    only = os.environ.get("BENCHES", "")
    want = set(only.split(",")) if only else None

    def wanted(fam):
        return want is None or fam in want

    for n in sizes:
        iref, imov, u = fields(n, n)
        d = derivatives(iref, imov)
        npix = n * n

        # Blocked diffusion, k=16 (headline kernel).
        for kk in (16, 8) if wanted("diffusion") else ():
            if _pick_tiles(n, kk, None, n) is None:
                emit(bench=f"diffusion_block_k{kk}", n=n, skipped="no tiling")
                continue
            g = stack_derivs(d.grad_i, d.it)

            def blocked(st, kk=kk):
                return (diffusion_block_pallas(
                    st[0], st[1], 0.5, k=kk, with_errors=False)[0], st[1])

            try:
                s = kernel_timer(blocked, (jnp.zeros_like(u), g),
                                 iters_lo=20, iters_hi=120) / kk
                emit(bench=f"diffusion_block_k{kk}", n=n,
                     us_per_iter=round(s * 1e6, 1),
                     gpix_s=round(npix / s / 1e9, 1))
            except Exception as exc:
                emit(bench=f"diffusion_block_k{kk}", n=n,
                     error=type(exc).__name__)

        # Fused demons step (kernel A + B at their default tiles).
        def demons(st):
            v, im, ir = st
            c = demons_correspondence_pallas(
                im, ir, v, 1.0, 0.25, 2.0, 5, halo=2)
            return (compose_smooth_pallas(v, c, 2.0, 5, halo=2), im, ir)

        if wanted("demons"):
            try:
                s = kernel_timer(demons, (u, imov, iref),
                                 iters_lo=100, iters_hi=500)
                emit(bench="demons_fused_step", n=n,
                     us_per_iter=round(s * 1e6, 1),
                     gpix_s=round(npix / s / 1e9, 2))
            except Exception as exc:
                emit(bench="demons_fused_step", n=n,
                     error=type(exc).__name__)

        # Elastic red-black iteration (force + colored half-sweeps).
        dd = Derivatives(d.grad_i, d.it)

        if wanted("elastic"):
            s = kernel_timer(
                lambda st: (elastic_step(st[0], Derivatives(st[1], st[2]),
                                         1.0, 0.1, 0.66), st[1], st[2]),
                (u, d.grad_i, d.it), iters_lo=200, iters_hi=1000)
            emit(bench="elastic_step", n=n, us_per_iter=round(s * 1e6, 1),
                 gpix_s=round(npix / s / 1e9, 1))

        # Temporal-blocked elastic, k=4: a wash at 1024^2 (VPU-bound
        # there), but the jnp step's rolls spill to HBM at larger grids.
        if wanted("elastic") and \
                elastic_block._pick_tiles(n, 4, None, n) is not None:
            ge = stack_derivs(d.grad_i, d.it)

            def eblocked(st):
                return (elastic_block.elastic_block_pallas(
                    st[0], st[1], 1.0, 0.1, 0.66, True, k=4,
                    with_errors=False)[0], st[1])

            try:
                s = kernel_timer(eblocked, (u, ge),
                                 iters_lo=50, iters_hi=250) / 4
                emit(bench="elastic_block_k4", n=n,
                     us_per_iter=round(s * 1e6, 1),
                     gpix_s=round(npix / s / 1e9, 1))
            except Exception as exc:
                emit(bench="elastic_block_k4", n=n, error=type(exc).__name__)

        # Curvature matmul-DCT tiers + FFT path: the MXU matmul is O(N^3)
        # per step, the Makhoul FFT path O(N^2 log N) — is there a
        # crossover by 4096^2?
        # Iteration counts sized so the slope delta is >=200 ms of device
        # time: short deltas (the first run used 20/120 everywhere) sink
        # below the ~28 ms tunnel dispatch jitter and produce nonsense
        # (a measured 20.5 us/step "fast" DCT = 840 TFLOP/s, 4x the chip).
        c_iters = {1024: (200, 1000), 2048: (50, 250)}.get(n, (10, 60))
        for impl in (("matmul_high", "matmul_fast", "fft")
                     if wanted("curvature") else ()):
            cstep = make_curvature_step(n, n, 0.25, 1.0, dct_impl=impl)
            s = kernel_timer(
                lambda st: (cstep(st[0], Derivatives(st[1], st[2])),
                            st[1], st[2]),
                (u, d.grad_i, d.it),
                iters_lo=c_iters[0], iters_hi=c_iters[1])
            emit(bench=f"curvature_{impl}", n=n,
                 us_per_iter=round(s * 1e6, 1),
                 gpix_s=round(npix / s / 1e9, 2))


if __name__ == "__main__":
    main()
