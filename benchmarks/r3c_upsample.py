"""Round-3: re-measure the pyramid resample ops and level-driver e2e after
replacing the dynamic-gather upsample with MXU selection matmuls.
One jitted scalar-returning call per measurement (r2d pattern).
Appends to benchmarks/r3_results.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(__file__), "r3_results.jsonl")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def timeit(fn, *args, reps=5):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        best = min(best, (float(fn(*args)), time.perf_counter() - t0)[1])
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    nx = ny = 1024
    xs = np.arange(nx)[:, None]; ys = np.arange(ny)[None, :]

    def img(ox, oy):
        g = 0.08 * np.sin((xs - ox) / 5.0) * np.cos((ys - oy) / 4.0)
        for (cx, cy, s, a) in [(nx*0.4, ny*0.5, 60.0, 1.0),
                               (nx*0.65, ny*0.3, 40.0, 0.7)]:
            g = g + a * np.exp(-(((xs - ox) - cx)**2 + ((ys - oy) - cy)**2)
                               / (2*s*s))
        return g.astype(np.float32)

    iref = jnp.asarray(img(0, 0))
    imov = jnp.asarray(img(2.5, -1.5))
    rng = np.random.default_rng(7)

    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import _register_impl
    from opticalflow2d_tpu.ops.resample import (
        downsample_motion, upsample_motion, upsample_image,
    )
    from jax import lax as _lax

    # --- correctness on-chip: matmul taps vs the old exact-gather path ---
    from opticalflow2d_tpu.ops.warp import _bilinear_from_taps, _gather_taps_exact

    u_small = jnp.asarray(
        np.clip(rng.standard_normal((2, nx, ny)), -1.5, 1.5).astype(np.float32))
    u_half = downsample_motion(u_small, (nx // 2, ny // 2))

    @jax.jit
    def check(uh):
        got = upsample_image(uh, (nx, ny))
        i = jnp.arange(nx, dtype=jnp.float32)[:, None]
        j = jnp.arange(ny, dtype=jnp.float32)[None, :]
        px = jnp.broadcast_to(i * ((nx // 2) / nx), (nx, ny))
        py = jnp.broadcast_to(j * ((ny // 2) / ny), (nx, ny))
        value, weight, _ = _bilinear_from_taps(uh, px, py, _gather_taps_exact)
        want = value / jnp.where(weight != 0, weight, 1.0)
        return jnp.max(jnp.abs(got - want))

    emit(kind="validate_upsample_matmul", maxdiff=float(check(u_half)))

    # --- op micro-bench ---
    def op_time(name, fn, state, reps=100):
        @jax.jit
        def run(s):
            return jnp.sum(_lax.fori_loop(0, reps, lambda _, x: fn(x), s))

        float(run(state))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(state))
            best = min(best, time.perf_counter() - t0)
        emit(bench=name, us_per_call=round(best / reps * 1e6, 1))

    op_time("r3_op_upsample_motion_matmul", lambda s: upsample_motion(
        downsample_motion(s, (nx // 2, ny // 2)), (nx, ny)), u_small)

    # --- e2e after the fix: same configs as r3b for direct comparison ---
    def e2e(name, niter=(25, 25), **over):
        cfg = RegConfig(niter=niter, nscales=1, warp_halo_outer=4, **over)
        f = jax.jit(lambda r, m: jnp.sum(_register_impl(r, m, cfg).motion))
        sec = timeit(f, iref, imov)
        emit(bench=name, ms_per_reg=round(sec * 1e3, 1))

    e2e("r3_e2e_diffusion_jnp_upfix", method=Method.DIFFUSION, alpha=0.5,
        warp_halo=2)
    e2e("r3_e2e_diffusion_blocked_k8_upfix", method=Method.DIFFUSION,
        alpha=0.5, warp_halo=2, use_pallas=True, pallas_block_k=8)
    e2e("r3_e2e_diffusion_blocked_k16_upfix", method=Method.DIFFUSION,
        alpha=0.5, warp_halo=2, use_pallas=True, pallas_block_k=16)
    e2e("r3_e2e_elastic_blocked_k4_upfix", method=Method.ELASTIC, mu=0.5,
        warp_halo=2, use_pallas=True, pallas_block_k=4,
        pallas_block_elastic=True)
    e2e("r3_e2e_demons_fused_upfix", method=Method.THIRIONS_DEMONS,
        warp_halo=2, use_pallas=True)
    e2e("r3_e2e_diffusion_blocked_k16_n400_upfix", niter=(400, 25),
        method=Method.DIFFUSION, alpha=0.5, warp_halo=2, use_pallas=True,
        pallas_block_k=16)

    # Deeper pyramid (3 levels): before the fix this paid ~3 upsamples.
    def e2e_scales(name, nscales, **over):
        cfg = RegConfig(niter=tuple([25] * (nscales + 1)), nscales=nscales,
                        warp_halo_outer=4, **over)
        f = jax.jit(lambda r, m: jnp.sum(_register_impl(r, m, cfg).motion))
        sec = timeit(f, iref, imov)
        emit(bench=name, ms_per_reg=round(sec * 1e3, 1))

    e2e_scales("r3_e2e_diffusion_blocked_k8_s3_upfix", 3,
               method=Method.DIFFUSION, alpha=0.5, warp_halo=2,
               use_pallas=True, pallas_block_k=8)
    emit(done="r3c")


if __name__ == "__main__":
    main()
