"""Round-9: errors-ON blocked-diffusion tile retune (VERDICT r4 task 6).

The r9 logger_tax study exposed that the errors-on tier table was never
raced against the errors-off tiles: at 2048^2 the errors-OFF kernel at
its (64, 32M) tile runs 142.7 Gpix/s while errors-ON at its (128, 48M)
tile runs 65.9 — far more than the intrinsic cost of the sums. Sweep
(tb, vmem, k) for the errors-ON kernel at 1024^2 and 2048^2 and retune
``diffusion_block._TIERS_ERR`` from the winners.

Run (real TPU, background): python benchmarks/r9_err_tile_sweep.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r9_results.jsonl")


def main():
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs)
    from opticalflow2d_tpu.utils.profiling import kernel_timer

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "err_tile_sweep", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(5)
    for n in (1024, 2048):
        iref = jnp.asarray(rng.random((n, n), dtype=np.float32))
        gx = jnp.gradient(iref)[0]
        gy = jnp.gradient(iref)[1]
        g = stack_derivs(jnp.stack([gx, gy]),
                         jnp.asarray(rng.random((n, n), np.float32)) - iref)
        u0 = jnp.zeros((2, n, n), jnp.float32)
        for k in (8, 16):
            best = (None, 1e9)
            for tb in (32, 64, 128, 256):
                pad = ((k + 7) // 8) * 8
                if tb % pad or n % tb:
                    continue

                def step(u, tb=tb, k=k):
                    u2, s = diffusion_block_pallas(
                        u, g, 0.5, k=k, tb=tb, with_errors=True)
                    return u2 + 0.0 * s[k - 1, 0]

                try:
                    sec = kernel_timer(step, u0, iters_lo=20, iters_hi=100)
                    us = sec * 1e6 / k
                    emit({"n": n, "k": k, "tb": tb,
                          "us_per_iter": round(us, 2),
                          "gpix_s": round(n * n / sec * k / 1e9, 1)})
                    if us < best[1]:
                        best = (tb, us)
                except Exception as e:
                    emit({"n": n, "k": k, "tb": tb,
                          "error": type(e).__name__, "msg": str(e)[:120]})
            emit({"n": n, "k": k, "best_tb": best[0],
                  "best_us_per_iter": round(best[1], 2)})
        del iref, g, u0
    fh.close()


if __name__ == "__main__":
    main()
