"""End-to-end registration wall-clock at production image sizes on the live
backend (single pair, full pyramid + convergence loops).

Usage: python benchmarks/e2e_bench.py [--size 1024] [--nscales 2]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_pair(n, seed=0):
    rng = np.random.default_rng(seed)
    xs = np.arange(n)[:, None]
    ys = np.arange(n)[None, :]
    img = np.zeros((n, n), np.float32)
    for _ in range(50):
        cx, cy = rng.uniform(0, n, 2)
        s = rng.uniform(n * 0.01, n * 0.08)
        img += rng.uniform(-1, 1) * np.exp(
            -((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * s * s)
        ).astype(np.float32)
    ux = 4.0 * np.sin(2 * np.pi * ys / n)
    uy = -3.0 * np.sin(2 * np.pi * xs / n)
    gx = np.clip(xs + ux, 0, n - 1).astype(np.float32)
    gy = np.clip(ys + uy, 0, n - 1).astype(np.float32)
    x0 = np.floor(gx).astype(int); y0 = np.floor(gy).astype(int)
    x1 = np.minimum(x0 + 1, n - 1); y1 = np.minimum(y0 + 1, n - 1)
    fx = gx - x0; fy = gy - y0
    mov = (img[x0, y0] * (1 - fx) * (1 - fy) + img[x1, y0] * fx * (1 - fy)
           + img[x0, y1] * (1 - fx) * fy + img[x1, y1] * fx * fy)
    return img, mov.astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--nscales", type=int, default=2)
    p.add_argument("--niter", type=int, default=25)
    p.add_argument("--methods", nargs="+",
                   default=["FLUID", "THIRIONS_DEMONS", "DIFFUSION", "CURVATURE"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from opticalflow2d_tpu.config import RegConfig, Method
    from opticalflow2d_tpu.engine.registration import _register_impl
    from opticalflow2d_tpu.metrics import ssd_reduction

    n = args.size
    iref, imov = make_pair(n)
    niter = tuple([args.niter] * (args.nscales + 1))
    print(f"backend={jax.devices()[0].platform} size={n}x{n} "
          f"nscales={args.nscales} niter={niter}")

    for mname in args.methods:
        cfg = RegConfig(method=Method[mname], niter=niter, nscales=args.nscales,
                        mu=0.25, lam=0.0, alpha=0.5)

        @jax.jit
        def run(r, m):
            res = _register_impl(r, m, cfg)
            return res.motion, jnp.stack([t.iterations for t in res.traces])

        t0 = time.perf_counter()
        u, iters = run(iref, imov)
        u_host = np.asarray(u)
        compile_s = time.perf_counter() - t0

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            u, iters = run(iref, imov)
            u_host = np.asarray(u)
            best = min(best, time.perf_counter() - t0)
        red = float(ssd_reduction(jnp.asarray(iref), jnp.asarray(imov),
                                  jnp.asarray(u_host)))
        print(f"  {mname:16s}: {best*1e3:9.1f} ms/reg (compile {compile_s:6.1f} s) "
              f"iters={list(np.asarray(iters))} ssd-reduction {red:.3f}")


if __name__ == "__main__":
    main()
