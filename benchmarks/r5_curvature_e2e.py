"""Round-5 on-chip e2e: curvature registration with the dense 3-pass DCT
(old production default) vs the split-radix 3-pass transform (new
``dct_impl="auto"`` resolution). One jitted scalar-returning call per
measurement (r2d pattern). Appends to benchmarks/r5_results.jsonl.

Run on the real TPU: `python benchmarks/r5_curvature_e2e.py`
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(__file__), "r5_results.jsonl")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def timeit(fn, *args, reps=5):
    float(fn(*args))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        best = min(best, (float(fn(*args)), time.perf_counter() - t0)[1])
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import _register_impl

    for n in (1024, 2048):
        xs = np.arange(n)[:, None]
        ys = np.arange(n)[None, :]

        def img(ox, oy):
            g = 0.08 * np.sin((xs - ox) / 5.0) * np.cos((ys - oy) / 4.0)
            for (cx, cy, s, a) in [(n * 0.4, n * 0.5, 60.0, 1.0),
                                   (n * 0.65, n * 0.3, 40.0, 0.7)]:
                g = g + a * np.exp(
                    -(((xs - ox) - cx) ** 2 + ((ys - oy) - cy) ** 2)
                    / (2 * s * s))
            return g.astype(np.float32)

        iref = jnp.asarray(img(0, 0))
        imov = jnp.asarray(img(2.5, -1.5))

        for niter in [(25, 25), (200, 25)]:
            for impl in ["matmul_high", "split_high"]:
                cfg = RegConfig(
                    method=Method.CURVATURE, niter=niter, nscales=1,
                    alpha=0.1, tau=1.0, warp_halo=2, warp_halo_outer=4,
                    dct_impl=impl,
                )
                f = jax.jit(
                    lambda r, m: jnp.sum(_register_impl(r, m, cfg).motion))
                sec = timeit(f, iref, imov)
                emit(bench="r5_e2e_curvature", n=n, niter=list(niter),
                     impl=impl, ms_per_reg=round(sec * 1e3, 1))


if __name__ == "__main__":
    main()
