"""Round-4 micro-tuning: demons fused kernel B (compose+smooth) row-tile
sweep on the real chip, plus a re-check of the full fused Thirion step.

STATUS round-3 candidate #1: kernel B's default row tile comes from the
2.6 MB VMEM heuristic (tb=32 for the 2-channel chain at 1024^2); the
round-2 sweep only measured tb in {16, 32}. 1024 divisors allow 64/128.

Run (real TPU, single process):
  python benchmarks/r4_demons_tune.py
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
)
from opticalflow2d_tpu.utils.profiling import kernel_timer

NX = NY = 1024


def make_fields(seed=0):
    rng = np.random.default_rng(seed)
    iref = jnp.asarray(rng.random((NX, NY), dtype=np.float32))
    iaux = jnp.asarray(rng.random((NX, NY), dtype=np.float32))
    u = jnp.asarray(
        rng.uniform(-1.4, 1.4, size=(2, NX, NY)).astype(np.float32))
    c = jnp.asarray(
        rng.uniform(-1.4, 1.4, size=(2, NX, NY)).astype(np.float32))
    return iref, iaux, u, c


def main():
    iref, iaux, u, c = make_fields()
    results = []

    # Kernel B sweep: tb in {16, 32, 64, 128}; VMEM for the roll cache is
    # (2*halo+2)*nc*rows*ny*4 — tb=128 needs ~6.4 MB, may fail Mosaic.
    for tb in (16, 32, 64, 128):
        try:
            def step_b(v, tb=tb):
                return compose_smooth_pallas(v, c, 2.0, 5, halo=2, tb=tb)

            s = kernel_timer(step_b, u, iters_lo=200, iters_hi=1000)
            row = {"kernel": "B compose+smooth", "tb": tb,
                   "us_per_iter": round(s * 1e6, 1)}
        except Exception as e:
            row = {"kernel": "B compose+smooth", "tb": tb,
                   "error": type(e).__name__}
        results.append(row)
        print(json.dumps(row), flush=True)

    # Kernel A sweep beyond 64 for completeness.
    for tb in (64, 128):
        try:
            def step_a(v, tb=tb):
                return demons_correspondence_pallas(
                    iaux, iref, v, 1.0, 0.25, 2.0, 5, halo=2, tb=tb)

            s = kernel_timer(step_a, u, iters_lo=200, iters_hi=1000)
            row = {"kernel": "A warp+force+smooth", "tb": tb,
                   "us_per_iter": round(s * 1e6, 1)}
        except Exception as e:
            row = {"kernel": "A warp+force+smooth", "tb": tb,
                   "error": type(e).__name__}
        results.append(row)
        print(json.dumps(row), flush=True)

    with open("benchmarks/r4_results.jsonl", "a") as f:
        for row in results:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
