"""End-to-end registration wall time at 2048^2 (serial driver, one chip):
diffusion jnp vs blocked, elastic jnp vs auto-blocked (the new >=2048^2
auto-enable with the decoupled elastic block depth), Thirion demons fused.
One jitted scalar-returning call per measurement (r2d pattern); ~28 ms of
each number is fixed tunnel dispatch.

Run (real TPU, single process): python benchmarks/r4_e2e_2048.py
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


def timeit(fn, *args, reps=5):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        best = min(best, (float(fn(*args)), time.perf_counter() - t0)[1])
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    nx = ny = 2048
    xs = np.arange(nx)[:, None]
    ys = np.arange(ny)[None, :]

    def img(ox, oy):
        g = 0.08 * np.sin((xs - ox) / 9.0) * np.cos((ys - oy) / 7.0)
        for (cx, cy, s, a) in [(nx * 0.4, ny * 0.5, 120.0, 1.0),
                               (nx * 0.65, ny * 0.3, 80.0, 0.7)]:
            g = g + a * np.exp(-(((xs - ox) - cx) ** 2 + ((ys - oy) - cy) ** 2)
                               / (2 * s * s))
        return g.astype(np.float32)

    iref = jnp.asarray(img(0, 0))
    imov = jnp.asarray(img(4.0, -2.5))

    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import _register_impl

    def e2e(name, **over):
        cfg = RegConfig(niter=(25, 25), nscales=1, warp_halo_outer=4, **over)
        f = jax.jit(lambda r, m: jnp.sum(_register_impl(r, m, cfg).motion))
        try:
            sec = timeit(f, iref, imov)
            emit(bench=name, n=nx, ms_per_reg=round(sec * 1e3, 1))
        except Exception as exc:
            emit(bench=name, n=nx, error=type(exc).__name__,
                 detail=" ".join(str(exc).split())[:200])

    e2e("e2e2048_diffusion_jnp", method=Method.DIFFUSION, alpha=0.25)
    e2e("e2e2048_diffusion_blocked_k8", method=Method.DIFFUSION, alpha=0.25,
        use_pallas=True, pallas_block_k=8)
    e2e("e2e2048_diffusion_blocked_k16", method=Method.DIFFUSION, alpha=0.25,
        use_pallas=True, pallas_block_k=16)
    # Elastic: auto blocking must kick in at 2048^2 with block depth 4.
    e2e("e2e2048_elastic_jnp", method=Method.ELASTIC, mu=1.0, lam=0.1,
        pallas_block_elastic=False)
    e2e("e2e2048_elastic_autoblocked", method=Method.ELASTIC, mu=1.0, lam=0.1,
        use_pallas=True)
    e2e("e2e2048_thirions_fused", method=Method.THIRIONS_DEMONS,
        sigma_i=1.0, sigma_x=1.0, sigma_diffusion=1.0, sigma_fluid=2.0,
        kernelwidth=5, use_pallas=True)


if __name__ == "__main__":
    main()
