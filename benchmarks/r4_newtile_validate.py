"""On-chip bit-exactness check for the tile configs newly admitted by the
refit footprint-based VMEM model (_fits_vmem on e*ny lanes): blocked
diffusion k=8 @2048 (tb=64), k=16 @4096 (tb=16), k=8 @4096 (tb=32), and
blocked elastic at its auto tile @2048/@4096. Each blocked run is compared
against k sequential jnp steps; maxdiff must be 0.0 (same op order, f32).

Run (real TPU, single process): python benchmarks/r4_newtile_validate.py
Appends JSON lines to benchmarks/r4_results.jsonl.
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
    import jax

    from opticalflow2d_tpu.solvers.base import derivatives, Derivatives
    from opticalflow2d_tpu.pallas_kernels.diffusion_fused import (
        diffusion_step_pallas)
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs, _pick_tiles)
    from opticalflow2d_tpu.pallas_kernels import elastic_block

    for n, k in ((2048, 8), (4096, 16), (4096, 8)):
        iref, imov, u = fields(n, n)
        d = derivatives(iref, imov)
        g = stack_derivs(d.grad_i, d.it)
        tiles = _pick_tiles(n, k, None, n)
        if tiles is None:
            emit(check=f"diffusion_block_k{k}_n{n}", skipped="no tiling")
            continue
        try:
            got, _ = jax.jit(
                lambda v: diffusion_block_pallas(v, g, 0.5, k=k,
                                                 with_errors=False)
            )(u)
            # The single-step Pallas kernel shares the blocked kernel's op
            # order exactly — maxdiff here must be 0.0.
            def single(v):
                for _ in range(k):
                    v = diffusion_step_pallas(v, d.grad_i, d.it, alpha=0.5)
                return v
            want = jax.jit(single)(u)
            md = float(jnp.max(jnp.abs(got - want)))
            s = kernel_timer(
                lambda v: diffusion_block_pallas(v, g, 0.5, k=k,
                                                 with_errors=False)[0],
                jnp.zeros_like(u), iters_lo=20, iters_hi=120) / k
            emit(check=f"diffusion_block_k{k}_n{n}", tiles=list(tiles),
                 maxdiff=md, us_per_iter=round(s * 1e6, 1),
                 gpix_s=round(n * n / s / 1e9, 1))
        except Exception as exc:
            emit(check=f"diffusion_block_k{k}_n{n}", tiles=list(tiles),
                 error=f"{type(exc).__name__}")

    for n in (2048, 4096):
        iref, imov, u = fields(n, n)
        d = derivatives(iref, imov)
        dd = Derivatives(d.grad_i, d.it)
        ge = stack_derivs(d.grad_i, d.it)
        tiles = elastic_block._pick_tiles(n, 4, None, n)
        if tiles is None:
            emit(check=f"elastic_block_k4_n{n}", skipped="no tiling")
            continue
        try:
            got, _ = jax.jit(
                lambda v: elastic_block.elastic_block_pallas(
                    v, ge, 1.0, 0.1, 0.66, True, k=4, with_errors=False)
            )(u)
            want = jax.jit(
                lambda v: _iterate_elastic(v, dd, 4)
            )(u)
            md = float(jnp.max(jnp.abs(got - want)))
            emit(check=f"elastic_block_k4_n{n}", tiles=list(tiles),
                 maxdiff=md)
        except Exception as exc:
            emit(check=f"elastic_block_k4_n{n}", tiles=list(tiles),
                 error=f"{type(exc).__name__}")


def _iterate_elastic(u, dd, k):
    from opticalflow2d_tpu.solvers.elastic import elastic_step
    for _ in range(k):
        u = elastic_step(u, dd, 1.0, 0.1, 0.66)
    return u


if __name__ == "__main__":
    main()
