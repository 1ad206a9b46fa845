"""Round-5 on-chip benchmark: split-radix matmul DCT vs dense for the
curvature step (and raw transforms), plus correctness cross-checks.

Run on the real TPU: `python benchmarks/r5_dct_split_bench.py`
Appends JSON lines to benchmarks/r5_results.jsonl.
"""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opticalflow2d_tpu.solvers.base import Derivatives, derivatives
from opticalflow2d_tpu.solvers.curvature import make_curvature_step
from opticalflow2d_tpu.utils.profiling import kernel_timer

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r5_results.jsonl")


def emit(rec):
    rec = dict(rec)
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    sizes = [(1024, 1024), (2048, 2048), (4096, 4096)]
    if len(sys.argv) > 1:  # e.g. `r5_dct_split_bench.py 4096` for one size
        sizes = [(int(s), int(s)) for s in sys.argv[1:]]
    impls = ["matmul", "matmul_high", "matmul_fast",
             "split", "split_high", "split_fast"]
    for nx, ny in sizes:
        rng = np.random.default_rng(0)
        xs = np.arange(nx, dtype=np.float32)[:, None]
        ys = np.arange(ny, dtype=np.float32)[None, :]
        iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
        imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
        d = derivatives(jnp.asarray(iref), jnp.asarray(imov))
        u0 = jnp.asarray(
            0.1 * rng.standard_normal((2, nx, ny)).astype(np.float32))

        ref_out = None
        for impl in impls:
            step = make_curvature_step(nx, ny, 0.1, 1.0, dct_impl=impl)
            # Carry the derivatives through the loop state instead of
            # closing over them: captured 4096^2 constants inflate the
            # shipped MLIR and stall/kill the remote compile (the r4
            # harness rule; the closure form hung at 4096 exactly so).
            fn = lambda s: (step(s[0], Derivatives(grad_i=s[1], it=s[2])),
                            s[1], s[2])
            # correctness: one application vs dense HIGHEST (derivatives
            # passed as args for the same reason)
            out = jax.jit(lambda u, g, it: step(
                u, Derivatives(grad_i=g, it=it)))(u0, d.grad_i, d.it)
            if impl == "matmul":
                ref_out = np.asarray(out)
                rel = 0.0
            else:
                o = np.asarray(out)
                rel = float(np.max(np.abs(o - ref_out))
                            / max(np.max(np.abs(ref_out)), 1e-30))
            iters = (60, 300) if nx >= 4096 else (200, 1000)
            sec = kernel_timer(fn, (u0, d.grad_i, d.it),
                               iters_lo=iters[0], iters_hi=iters[1])
            emit({"bench": "curvature_step", "nx": nx, "ny": ny,
                  "impl": impl, "us_per_iter": round(sec * 1e6, 1),
                  "gpix_s": round(nx * ny / sec / 1e9, 2),
                  "rel_vs_highest": rel})


if __name__ == "__main__":
    main()
