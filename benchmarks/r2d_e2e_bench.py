"""Clean e2e timings: one jitted scalar-returning call per measurement
(a single tunnel dispatch; r2b's harness paid the ~28 ms dispatch several
times per rep and drowned the fused-path gains).
Appends to benchmarks/r2_results.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(__file__), "r2_results.jsonl")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def timeit(fn, *args, reps=5):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
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

    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import _register_impl

    def e2e(name, **over):
        cfg = RegConfig(niter=(25, 25), nscales=1, warp_halo_outer=4, **over)
        f = jax.jit(lambda r, m: jnp.sum(_register_impl(r, m, cfg).motion))
        sec = timeit(f, iref, imov)
        emit(bench=name, ms_per_reg=round(sec * 1e3, 1))

    e2e("e2e1d_thirion_fused_h2", method=Method.THIRIONS_DEMONS,
        warp_halo=2, use_pallas=True)
    e2e("e2e1d_thirion_jnp_h2", method=Method.THIRIONS_DEMONS, warp_halo=2)
    e2e("e2e1d_thirion_fused_h4", method=Method.THIRIONS_DEMONS,
        warp_halo=4, use_pallas=True)
    e2e("e2e1d_diffeo_fused_h2", method=Method.DIFFEOMORPHIC_DEMONS,
        warp_halo=2, use_pallas=True)
    e2e("e2e1d_diffusion_pallas", method=Method.DIFFUSION, alpha=0.5,
        warp_halo=2, use_pallas=True)
    e2e("e2e1d_curvature_high", method=Method.CURVATURE, alpha=0.1, tau=1.0,
        warp_halo=2)
    e2e("e2e1d_elastic_sor", method=Method.ELASTIC, mu=0.5, warp_halo=2)
    e2e("e2e1d_elastic_spectral_dirichlet", method=Method.ELASTIC, mu=0.5,
        warp_halo=2, navier_lame_solver="spectral_dirichlet")
    e2e("e2e1d_fluid_sor", method=Method.FLUID, mu=0.25, warp_halo=2)
    e2e("e2e1d_fluid_fused_pallas", method=Method.FLUID, mu=0.25,
        warp_halo=2, use_pallas=True)
    emit(done="r2d")


if __name__ == "__main__":
    main()
