"""Round-6 (r3 driver round): one-pass fused Thirion demons kernel sweep
on the real chip, vs the two-kernel fused chain it replaces.

VERDICT.md round-3 item #1: kernel B (241.6 us) was 2/3 of the 290 us
two-kernel step at 1024^2; the one-pass kernel collapses the iteration
into a single HBM round trip. Target: full Thirion step <= 190 us
@1024^2, and first-ever 8192^2 demons rows.

Run (real TPU, single process, background):
  python benchmarks/r6_onepass_bench.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from opticalflow2d_tpu.pallas_kernels.demons_fused import (
    compose_smooth_pallas,
    demons_correspondence_pallas,
    fused_feasible,
)
from opticalflow2d_tpu.pallas_kernels.demons_onepass import (
    thirion_onepass_pallas,
)
from opticalflow2d_tpu.utils.profiling import kernel_timer

SI, SX, SF, SD, KW, HALO = 1.0, 0.25, 2.0, 2.0, 5, 2


def make_fields(n, seed=0):
    rng = np.random.default_rng(seed)
    iref = jnp.asarray(rng.random((n, n), dtype=np.float32))
    iaux = jnp.asarray(rng.random((n, n), dtype=np.float32))
    u = jnp.asarray(rng.uniform(-1.4, 1.4, size=(2, n, n)).astype(np.float32))
    return iref, iaux, u


def emit(row, fh):
    print(json.dumps(row), flush=True)
    fh.write(json.dumps(row) + "\n")
    fh.flush()


def main():
    out = open("benchmarks/r6_results.jsonl", "a")
    # (size, tb candidates, loop lengths). Loop lengths shrink with size so
    # each timing run stays a few seconds.
    plan = [
        (1024, (32, 64, 128), 200, 1000),
        (2048, (16, 32, 64), 100, 400),
        (4096, (8, 16, 32), 30, 120),
        (8192, (8, 16), 10, 40),
    ]
    for n, tbs, lo, hi in plan:
        iref, iaux, u = make_fields(n)
        for tb in tbs:
            try:
                def step(v, tb=tb):
                    return thirion_onepass_pallas(
                        iaux, iref, v, SI, SX, SF, SD, KW, HALO,
                        addition=False, tb=tb)

                s = kernel_timer(step, u, iters_lo=lo, iters_hi=hi)
                row = {"kernel": "onepass thirion", "n": n, "tb": tb,
                       "us_per_iter": round(s * 1e6, 1)}
            except Exception as e:
                row = {"kernel": "onepass thirion", "n": n, "tb": tb,
                       "error": type(e).__name__, "msg": str(e)[:200]}
            emit(row, out)

        # Two-kernel fused chain at the same size for the speedup ratio
        # (its tier tables stop at 4096).
        if fused_feasible(n, n, HALO):
            try:
                def two(v):
                    c = demons_correspondence_pallas(
                        iaux, iref, v, SI, SX, SF, KW, halo=HALO)
                    return compose_smooth_pallas(v, c, SD, KW, halo=HALO)

                s = kernel_timer(two, u, iters_lo=lo, iters_hi=hi)
                row = {"kernel": "two-kernel fused", "n": n,
                       "us_per_iter": round(s * 1e6, 1)}
            except Exception as e:
                row = {"kernel": "two-kernel fused", "n": n,
                       "error": type(e).__name__, "msg": str(e)[:200]}
            emit(row, out)
    out.close()


if __name__ == "__main__":
    main()
