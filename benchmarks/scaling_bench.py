"""Scaling-efficiency harness: pixels/s at 1..N devices (BASELINE.md gate:
>=80% efficiency 1 chip -> multi-chip).

On a real multi-chip slice this measures true ICI scaling. On a single-chip
or CPU host it still runs (virtual devices) to validate the harness and the
sharded code paths; those numbers measure partitioning overhead, not
hardware scaling — flagged in the output.

Usage:
  python benchmarks/scaling_bench.py --mode spatial   # x-strip sharding
  python benchmarks/scaling_bench.py --mode batch     # DP over pairs
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["spatial", "batch"], default="spatial")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--iters", type=int, default=200)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from opticalflow2d_tpu.parallel.mesh import make_mesh
    from opticalflow2d_tpu.parallel.spatial import make_diffusion_sweeps_sharded
    from opticalflow2d_tpu.solvers.base import derivatives, Derivatives
    from opticalflow2d_tpu.solvers.diffusion import diffusion_step

    ndev_all = len(jax.devices())
    n = args.size
    iters = args.iters
    print(f"backend={jax.devices()[0].platform} devices={ndev_all} "
          f"grid={n}x{n} iters={iters} mode={args.mode}")
    if jax.devices()[0].platform != "tpu" or ndev_all == 1:
        print("NOTE: single-chip/CPU run — numbers validate the harness, "
              "not hardware scaling")

    xs = np.arange(n, dtype=np.float32)[:, None]
    ys = np.arange(n, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
    d = derivatives(jnp.asarray(iref), jnp.asarray(imov))

    base = None
    ndev = 1
    results = []
    while ndev <= ndev_all:
        if args.mode == "spatial":
            mesh = make_mesh(data=1, x=ndev)
            sweeps = make_diffusion_sweeps_sharded(mesh, alpha=0.5, niter=iters)

            sh_u = NamedSharding(mesh, P(None, "x", None))
            sh_i = NamedSharding(mesh, P("x", None))
            u0 = jax.device_put(jnp.zeros((2, n, n)), sh_u)
            g = jax.device_put(d.grad_i, sh_u)
            t_img = jax.device_put(d.it, sh_i)

            @jax.jit
            def run(u, g, t):
                return jnp.sum(sweeps(u, g, t))

            work_pix = n * n * iters
        else:  # batch
            mesh = make_mesh(data=ndev, x=1)
            sh = NamedSharding(mesh, P("data"))
            b = ndev
            u0 = jax.device_put(jnp.zeros((b, 2, n, n)), sh)
            g = jax.device_put(jnp.broadcast_to(d.grad_i, (b, 2, n, n)), sh)
            t_img = jax.device_put(jnp.broadcast_to(d.it, (b, n, n)), sh)

            @jax.jit
            def run(u, g, t):
                def one(u, g, t):
                    dd = Derivatives(g, t)
                    return jax.lax.fori_loop(
                        0, iters, lambda _, v: diffusion_step(v, dd, 0.5), u
                    )
                return jnp.sum(jax.vmap(one)(u, g, t))

            work_pix = ndev * n * n * iters

        float(run(u0, g, t_img))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(u0, g, t_img))
            best = min(best, time.perf_counter() - t0)
        pix_s = work_pix / best
        if base is None:
            base = pix_s
        eff = pix_s / (base * ndev) * 100
        results.append((ndev, pix_s, eff))
        print(f"  {ndev:3d} dev: {pix_s/1e9:8.2f} Gpix/s  efficiency {eff:6.1f}%")
        ndev *= 2

    if len(results) > 1 and results[-1][2] < 80:
        print("WARNING: scaling efficiency below the 80% gate")


if __name__ == "__main__":
    main()
