"""Kernel micro-benchmarks on the live backend (TPU by default).

Usage: python benchmarks/kernel_bench.py [--iters-sweep]

Times the hot kernels from SURVEY.md §3.4 and prints per-kernel
Mpixels/s + effective HBM bandwidth. Uses an in-program scalar reduction
fetched to host as the execution barrier (reliable through the remote
tunnel, where block_until_ready can return early).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=3):
    """Best-of-reps wall time of float(fn(*args)) minus nothing — fn must
    return a scalar jax array."""
    float(fn(*args))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def make_pair(nx, ny):
    xs = np.arange(nx, dtype=np.float32)[:, None]
    ys = np.arange(ny, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
    return iref, imov


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=1024)
    p.add_argument("--ny", type=int, default=1024)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--iters-sweep", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from opticalflow2d_tpu.solvers.base import derivatives, Derivatives
    from opticalflow2d_tpu.solvers.diffusion import diffusion_step
    from opticalflow2d_tpu.solvers.elastic import sor_sweep
    from opticalflow2d_tpu.solvers.curvature import make_curvature_step
    from opticalflow2d_tpu.ops.warp import warp2d, compose
    from opticalflow2d_tpu.ops.conv import gaussian_smooth

    nx, ny, iters = args.nx, args.ny, args.iters
    print(f"backend={jax.devices()[0].platform} device={jax.devices()[0].device_kind} "
          f"grid={nx}x{ny} iters={iters}")

    iref, imov = make_pair(nx, ny)
    d = derivatives(jnp.asarray(iref), jnp.asarray(imov))
    u0 = jnp.zeros((2, nx, ny))

    def loop(step):
        @jax.jit
        def run(u, g, t):
            dd = Derivatives(g, t)
            u = jax.lax.fori_loop(0, iters, lambda _, v: step(v, dd), u)
            return jnp.sum(u)
        return run

    if args.iters_sweep:
        for it in (1, 10, 50, 200, 1000):
            @jax.jit
            def runi(u, g, tt, it=it):
                dd = Derivatives(g, tt)
                u = jax.lax.fori_loop(0, it, lambda _, v: diffusion_step(v, dd, 0.5), u)
                return jnp.sum(u)
            t = timed(runi, u0, d.grad_i, d.it)
            print(f"  diffusion iters={it:5d}: total {t*1e3:8.2f} ms, "
                  f"per-iter {t/max(it,1)*1e6:8.1f} us")
        return

    from opticalflow2d_tpu.pallas_kernels.diffusion_fused import diffusion_step_pallas

    cases = {
        "diffusion_step": lambda v, dd: diffusion_step(v, dd, 0.5),
        "diffusion_pallas": lambda v, dd: diffusion_step_pallas(
            v, dd.grad_i, dd.it, alpha=0.5
        ),
        "elastic_rb_sweep": lambda v, dd: sor_sweep(
            v, dd.grad_i, 0.5, 0.0, 0.66
        ),
        "curvature_step": (lambda s: (lambda v, dd: s(v, dd)))(
            make_curvature_step(nx, ny, 0.1, 1.0)
        ),
    }
    for name, step in cases.items():
        t = timed(loop(step), u0, d.grad_i, d.it)
        mpix = nx * ny * iters / t / 1e6
        print(f"  {name:18s}: {mpix:10.1f} Mpix/s   ({t/iters*1e6:8.1f} us/iter)")

    # warp / compose / gaussian (single-shot ops, loop them too)
    @jax.jit
    def warp_loop(img, u):
        def body(_, im):
            return warp2d(im, u)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, img))

    t = timed(warp_loop, jnp.asarray(imov), u0 + 0.3)
    print(f"  warp2d            : {nx*ny*iters/t/1e6:10.1f} Mpix/s   ({t/iters*1e6:8.1f} us/iter)")

    @jax.jit
    def conv_loop(u):
        def body(_, v):
            return gaussian_smooth(v, 2.0, 5)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, u))

    t = timed(conv_loop, u0 + 0.1)
    print(f"  gaussian_k5       : {nx*ny*iters/t/1e6:10.1f} Mpix/s   ({t/iters*1e6:8.1f} us/iter)")

    @jax.jit
    def compose_loop(u):
        def body(_, v):
            return compose(v, v * 0.01)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, u))

    t = timed(compose_loop, u0 + 0.2)
    print(f"  compose           : {nx*ny*iters/t/1e6:10.1f} Mpix/s   ({t/iters*1e6:8.1f} us/iter)")


if __name__ == "__main__":
    main()
