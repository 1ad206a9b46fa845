"""Round-9 (driver round 5): where does the errors-ON Logger tax go?
(VERDICT r4 task 6: 55.5 Gpix/s errors-on headline vs 73.5 errors-off.)

Decomposes the blocked diffusion kernel's per-iteration cost at
1024^2/2048^2, k=8/16:
  - off:    with_errors=False (the ceiling)
  - sqrt:   production Logger sums (exact per-pixel magnitudes)
  - rsqrt:  same value via x*rsqrt(x) (candidate cheaper lowering)
  - nosqrt: diagnostic sum-of-squares — bounds the sqrt share vs the
            rest of the error plumbing (diff, squares, row reduction,
            accumulator selects)

Timing: slope between two fori_loop lengths (utils.profiling.kernel_timer
protocol) so tunnel dispatch overhead cancels; the loop threads (u, sums)
state so nothing is a compile-request constant.

Run (real TPU, background): python benchmarks/r9_logger_tax.py
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
        row = {"bench": "logger_tax", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(5)
    for n in (1024, 2048):
        iref = jnp.asarray(rng.random((n, n), dtype=np.float32))
        imov = jnp.asarray(rng.random((n, n), dtype=np.float32))
        gx = jnp.gradient(iref)[0]
        gy = jnp.gradient(iref)[1]
        g = stack_derivs(jnp.stack([gx, gy]), imov - iref)
        u0 = jnp.zeros((2, n, n), jnp.float32)

        for k in (8, 16):
            rows = {}
            for mode in ("off", "sqrt", "rsqrt", "nosqrt"):
                if mode == "off":
                    step = lambda u: diffusion_block_pallas(
                        u, g, 0.5, k=k, with_errors=False)[0]
                else:
                    def step(u, m=mode):
                        u2, s = diffusion_block_pallas(
                            u, g, 0.5, k=k, with_errors=True, err_mode=m)
                        # fold the sums into the state so the error path
                        # cannot be dead-code-eliminated
                        return u2 + 0.0 * s[k - 1, 0]
                try:
                    sec = kernel_timer(step, u0, iters_lo=20, iters_hi=100)
                    us = sec * 1e6 / k
                    rows[mode] = us
                    emit({"n": n, "k": k, "mode": mode,
                          "us_per_iter": round(us, 2),
                          "gpix_s": round(n * n / sec * k / 1e9, 1)})
                except Exception as e:
                    emit({"n": n, "k": k, "mode": mode,
                          "error": type(e).__name__, "msg": str(e)[:160]})
            if "off" in rows and "sqrt" in rows:
                emit({"n": n, "k": k, "mode": "summary",
                      "tax_pct": round(100 * (rows["sqrt"] - rows["off"])
                                       / rows["off"], 1),
                      "sqrt_share_pct": round(
                          100 * (rows["sqrt"] - rows.get("nosqrt",
                                                         rows["sqrt"]))
                          / max(rows["sqrt"] - rows["off"], 1e-9), 1)})
        del iref, imov, g, u0
    fh.close()


if __name__ == "__main__":
    main()
