"""Round-8 follow-up: rerun the serving cells that crashed before the
``_vmap_safe`` fix (vmapped blocked-Pallas lowering failure at >=512^2),
and A/B the two batching modes for the variational family — vmap (jnp
kernels, SPMD-batched) vs map (per-pair programs, Pallas production
path) — so the impl="auto" choice for variational methods is backed by
data at serving sizes.

Run (real TPU, background): python benchmarks/r8_serving_fix.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from r8_serving_sweep import pair

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r8_results.jsonl")


def main():
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.parallel.batch import register_batch

    fh = open(OUT, "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    cfg = RegConfig(method=Method.DIFFUSION, niter=(25, 25), nscales=1,
                    alpha=0.5)
    for n, batches in ((512, (8, 32)), (1024, (4, 16))):
        base_r, base_m = pair(n)
        for b in batches:
            irefs = jnp.asarray(np.stack([base_r] * b))
            imovs = jnp.asarray(np.stack([base_m] * b))
            for impl in ("vmap", "map"):
                def run():
                    return float(jnp.sum(
                        register_batch(irefs, imovs, cfg, impl=impl).motion))

                try:
                    t0 = time.perf_counter()
                    run()
                    comp = time.perf_counter() - t0
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.perf_counter()
                        run()
                        best = min(best, time.perf_counter() - t0)
                    emit({"bench": "serving_fix", "method": "DIFFUSION",
                          "n": n, "batch": b, "impl": impl,
                          "ms": round(best * 1e3, 2),
                          "reg_per_s": round(b / best, 1),
                          "compile_s": round(comp, 1)})
                except Exception as e:
                    emit({"bench": "serving_fix", "method": "DIFFUSION",
                          "n": n, "batch": b, "impl": impl,
                          "error": type(e).__name__, "msg": str(e)[:200]})
            del irefs, imovs
    fh.close()


if __name__ == "__main__":
    main()
