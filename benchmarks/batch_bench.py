"""Batched-registration throughput (registrations/s) on the live backend.

The production serving shape: many independent pairs vmapped/DP-sharded.
Reports registrations/s and effective Mpix/s for a full fluid registration
(pyramid + refine + convergence loops) at several batch sizes — the
one-pair-at-a-time reference wrapper has no analog of this amortization.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8, 32])
    p.add_argument("--method", default="FLUID")
    p.add_argument("--pallas", action="store_true",
                   help="use the fused/blocked Pallas kernels")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from opticalflow2d_tpu.config import RegConfig, Method
    from opticalflow2d_tpu.parallel.batch import register_batch

    n = args.size
    rng = np.random.default_rng(0)
    cfg = RegConfig(
        method=Method[args.method], niter=(25, 25), nscales=1, mu=0.25, lam=0.0,
        alpha=0.5, use_pallas=args.pallas,
    )

    print(f"backend={jax.devices()[0].platform} size={n}x{n} method={cfg.method.name}")

    def pair(k):
        xs = np.arange(n)[:, None]
        ys = np.arange(n)[None, :]
        img = np.zeros((n, n), np.float32)
        r = np.random.default_rng(k)
        for _ in range(20):
            cx, cy = r.uniform(0, n, 2)
            s = r.uniform(2, max(4.0, n * 0.1))
            img += r.uniform(-1, 1) * np.exp(
                -((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * s * s)
            ).astype(np.float32)
        mov = np.roll(img, (1, -1), (0, 1))
        return img, mov

    base_r, base_m = pair(0)

    for b in args.batches:
        irefs = jnp.asarray(np.stack([base_r] * b))
        imovs = jnp.asarray(np.stack([base_m] * b))

        def run(r, m):
            # register_batch(impl="auto"): vmap for variational methods,
            # per-pair map programs for demons/fluid
            return float(jnp.sum(register_batch(r, m, cfg).motion))

        run(irefs, imovs)  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(irefs, imovs)
            best = min(best, time.perf_counter() - t0)
        print(
            f"  batch {b:4d}: {best*1e3:9.2f} ms -> {b/best:8.1f} reg/s "
            f"({b*n*n/best/1e6:10.1f} Mpix/s input)"
        )


if __name__ == "__main__":
    main()
