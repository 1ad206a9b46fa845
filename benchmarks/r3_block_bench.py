"""Temporal-blocked diffusion kernel on real TPU: validation + (k, tb)
throughput sweep vs the single-step Pallas kernel and the jnp path.

Per-pixel-iteration HBM traffic of the single-step kernel is ~28 B (read
u + g, write u); the blocked kernel amortizes one pass over k iterations,
so the expected ceiling is roughly k/2x the single-step number (the g
stream is still re-read once per pass). Appends to r3_results.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

OUT = os.path.join(os.path.dirname(__file__), "r3_results.jsonl")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def slope_time(fn, state, lo=1000, hi=5000, reps=3):
    """Seconds per fn call. The work delta (hi-lo calls) must dwarf the
    ~28 ms tunnel dispatch jitter — for ~10 us/iter kernels that means
    thousands of calls, not tens (short deltas measure pure noise, even
    negative slopes)."""
    @jax.jit
    def run(n, s):
        s = lax.fori_loop(0, n, lambda _, s: fn(s), s)
        return jnp.sum(s)

    float(run(lo, state)); float(run(hi, state))
    t_lo = min(_timed(run, lo, state) for _ in range(reps))
    t_hi = min(_timed(run, hi, state) for _ in range(reps))
    return (t_hi - t_lo) / (hi - lo)


def _timed(run, n, state):
    t0 = time.perf_counter()
    float(run(n, state))
    return time.perf_counter() - t0


def main():
    print("backend:", jax.default_backend(), flush=True)
    from opticalflow2d_tpu.solvers.base import derivatives, Derivatives
    from opticalflow2d_tpu.solvers.diffusion import diffusion_step
    from opticalflow2d_tpu.pallas_kernels.diffusion_fused import (
        diffusion_step_pallas,
    )
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs,
    )

    nx = ny = 1024
    xs = np.arange(nx, dtype=np.float32)[:, None]
    ys = np.arange(ny, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
    d = derivatives(jnp.asarray(iref), jnp.asarray(imov))
    g = stack_derivs(d.grad_i, d.it)
    rng = np.random.default_rng(7)
    u0 = jnp.asarray(rng.standard_normal((2, nx, ny)).astype(np.float32))
    alpha = 0.5

    # --- on-chip validation: blocked == k x single-step (bit-level check) ---
    @jax.jit
    def val(u):
        # fori_loop + tb=128: a Python-unrolled chain lets XLA promote the
        # operands to VMEM and blow the 16M scoped-vmem limit at tb=256.
        want = lax.fori_loop(
            0, 8,
            lambda _, v: diffusion_step_pallas(v, d.grad_i, d.it,
                                               alpha=alpha, tb=128),
            u,
        )
        got, sums = diffusion_block_pallas(u, g, alpha=alpha, k=8, tb=128)
        return jnp.max(jnp.abs(got - want)), sums

    t0 = time.time()
    md, sums = val(u0)
    emit(kind="validate", maxdiff=float(md), sums0=[float(x) for x in sums[0]],
         compile_s=round(time.time() - t0, 1))

    # --- baselines ---
    per = slope_time(lambda u: diffusion_step(u, Derivatives(d.grad_i, d.it),
                                              alpha), u0)
    emit(kind="bench", impl="jnp_step", us=round(per * 1e6, 1),
         gpix_s=round(nx * ny / per / 1e9, 1))
    per = slope_time(lambda u: diffusion_step_pallas(
        u, d.grad_i, d.it, alpha=alpha), u0)
    emit(kind="bench", impl="pallas_step", us=round(per * 1e6, 1),
         gpix_s=round(nx * ny / per / 1e9, 1))

    # --- blocked sweep ---
    for k in (4, 8, 16):
        for tb in (64, 128, 256):
            try:
                fn = lambda u: diffusion_block_pallas(
                    u, g, alpha=alpha, k=k, tb=tb, with_errors=False)[0]
                per = slope_time(fn, u0, lo=500, hi=2500) / k
                emit(kind="bench", impl="block", k=k, tb=tb, errors=False,
                     us_per_iter=round(per * 1e6, 2),
                     gpix_s=round(nx * ny / per / 1e9, 1))
            except Exception as e:
                emit(kind="bench", impl="block", k=k, tb=tb, errors=False,
                     error=str(e)[:200])
    for k in (8, 16):
        try:
            fn = lambda u: diffusion_block_pallas(
                u, g, alpha=alpha, k=k, tb=128, with_errors=True)[0]
            per = slope_time(fn, u0, lo=500, hi=2500) / k
            emit(kind="bench", impl="block", k=k, tb=128, errors=True,
                 us_per_iter=round(per * 1e6, 2),
                 gpix_s=round(nx * ny / per / 1e9, 1))
        except Exception as e:
            emit(kind="bench", impl="block", k=k, tb=128, errors=True,
                 error=str(e)[:200])

    # ---------------- elastic ----------------
    from opticalflow2d_tpu.solvers.elastic import elastic_step
    from opticalflow2d_tpu.pallas_kernels.elastic_block import (
        elastic_block_pallas,
    )

    MU, LAM, OMEGA = 0.25, 0.1, 1.5
    uz = u0.at[:, 0, :].set(0).at[:, -1, :].set(0)
    uz = uz.at[:, :, 0].set(0).at[:, :, -1].set(0)

    @jax.jit
    def val_el(u):
        want = u
        for _ in range(4):
            want = elastic_step(want, d, MU, LAM, OMEGA, True, "redblack")
        got, _ = elastic_block_pallas(u, g, MU, LAM, OMEGA, True, k=4, tb=64)
        return jnp.max(jnp.abs(got - want))

    emit(kind="validate_elastic", maxdiff=float(val_el(uz)))

    per = slope_time(
        lambda u: elastic_step(u, d, MU, LAM, OMEGA, True, "redblack"), uz)
    emit(kind="bench", impl="jnp_elastic_step", us=round(per * 1e6, 1),
         gpix_s=round(nx * ny / per / 1e9, 1))

    for k in (2, 4, 8):
        for tb in (32, 64):
            for errs in (False, True):
                try:
                    fn = lambda u: elastic_block_pallas(
                        u, g, MU, LAM, OMEGA, True, k=k, tb=tb,
                        with_errors=errs)[0]
                    per = slope_time(fn, uz, lo=300, hi=1500) / k
                    emit(kind="bench", impl="elastic_block", k=k, tb=tb,
                         errors=errs, us_per_iter=round(per * 1e6, 2),
                         gpix_s=round(nx * ny / per / 1e9, 1))
                except Exception as e:
                    emit(kind="bench", impl="elastic_block", k=k, tb=tb,
                         errors=errs, error=str(e)[:200])


if __name__ == "__main__":
    main()
