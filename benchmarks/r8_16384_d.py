"""Round-8: 16384^2 probe D — blocked-diffusion kernel tiles at 16384
lanes (explicit expert-tb override; ``_pick_tiles`` has no 16384 tier
yet). If a (k, tb) cell is stable and fast, it becomes the tier entry.

Run (real TPU, background): python benchmarks/r8_16384_d.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r8_results.jsonl")
N = 16384


def main():
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs,
    )
    from opticalflow2d_tpu.solvers.base import derivatives
    from opticalflow2d_tpu.ops.resample import upsample_image
    from opticalflow2d_tpu.utils.profiling import kernel_timer

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_d", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(16)
    seed_r = jnp.asarray(rng.random((N // 64, N // 64), dtype=np.float32))
    seed_m = jnp.asarray(rng.random((N // 64, N // 64), dtype=np.float32))

    @jax.jit
    def blow_up(s):
        x = s
        for _ in range(6):
            nx, ny = x.shape
            x = upsample_image(x, (2 * nx, 2 * ny))
        return x

    d = jax.jit(derivatives)(blow_up(seed_r), blow_up(seed_m))
    g = stack_derivs(d.grad_i, d.it)
    u0 = jnp.zeros((2, N, N), jnp.float32)
    float(jnp.sum(g))

    for k, tbs in ((16, (16, 32)), (8, (8, 16, 32))):
        for tb in tbs:
            try:
                def step(st, k=k, tb=tb):
                    u, acc = st
                    out, sums = diffusion_block_pallas(
                        u, g, 0.5, k=k, tb=tb, with_errors=True)
                    return (out, acc + jnp.sum(sums))

                s = kernel_timer(step, (u0, jnp.float32(0)),
                                 iters_lo=2, iters_hi=10)
                us_it = s * 1e6 / k
                emit({"step": f"blocked_k{k}_tb{tb}", "ok": True,
                      "us_per_call": round(s * 1e6, 1),
                      "us_per_iter": round(us_it, 1),
                      "gpix_s": round(N * N / us_it / 1e3, 1)})
            except Exception as e:
                emit({"step": f"blocked_k{k}_tb{tb}",
                      "error": type(e).__name__, "msg": str(e)[:160]})
    fh.close()


if __name__ == "__main__":
    main()
