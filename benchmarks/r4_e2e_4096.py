"""End-to-end registration at 4096^2 (serial driver, one chip) — first
e2e at this size: the fused demons kernels only became feasible here with
the rolling tap schedule, and the driver's outer warps/composes run the
Pallas gather at tb=8 tiles. Also re-records the 1024^2 demons e2e with
the current kernels. One jitted scalar-returning call per measurement.

Run (real TPU, single process): python benchmarks/r4_e2e_4096.py
Appends JSON lines to benchmarks/r4_results.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def timeit(fn, *args, reps=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        best = min(best, (float(fn(*args)), time.perf_counter() - t0)[1])
    return best


def pair(n):
    xs = np.arange(n)[:, None]
    ys = np.arange(n)[None, :]

    def img(ox, oy):
        g = 0.08 * np.sin((xs - ox) / (n / 230.0)) * np.cos(
            (ys - oy) / (n / 290.0))
        for (cx, cy, s, a) in [(n * 0.4, n * 0.5, n * 0.06, 1.0),
                               (n * 0.65, n * 0.3, n * 0.04, 0.7)]:
            g = g + a * np.exp(-(((xs - ox) - cx) ** 2 + ((ys - oy) - cy) ** 2)
                               / (2 * s * s))
        return g.astype(np.float32)

    return jnp.asarray(img(0, 0)), jnp.asarray(img(4.0, -2.5))


def main():
    print("backend:", jax.default_backend(), flush=True)
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import _register_impl

    def e2e(name, n, iref, imov, **over):
        cfg = RegConfig(niter=(25, 25), nscales=1, warp_halo_outer=4, **over)
        f = jax.jit(lambda r, m: jnp.sum(_register_impl(r, m, cfg).motion))
        try:
            sec = timeit(f, iref, imov)
            emit(bench=name, n=n, ms_per_reg=round(sec * 1e3, 1))
        except Exception as exc:
            emit(bench=name, n=n, error=type(exc).__name__,
                 detail=" ".join(str(exc).split())[:300])

    ir1, im1 = pair(1024)
    e2e("e2e1024_thirions_fused", 1024, ir1, im1,
        method=Method.THIRIONS_DEMONS, sigma_i=1.0, sigma_x=1.0,
        sigma_diffusion=1.0, sigma_fluid=2.0, kernelwidth=5, use_pallas=True)

    ir4, im4 = pair(4096)
    e2e("e2e4096_diffusion_pallas", 4096, ir4, im4,
        method=Method.DIFFUSION, alpha=0.25, use_pallas=True,
        pallas_block_k=8)
    e2e("e2e4096_elastic_autoblocked", 4096, ir4, im4,
        method=Method.ELASTIC, mu=1.0, lam=0.1, use_pallas=True)
    e2e("e2e4096_thirions_fused", 4096, ir4, im4,
        method=Method.THIRIONS_DEMONS, sigma_i=1.0, sigma_x=1.0,
        sigma_diffusion=1.0, sigma_fluid=2.0, kernelwidth=5, use_pallas=True)


if __name__ == "__main__":
    main()
