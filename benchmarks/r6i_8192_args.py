"""Round-6i: 8192^2 retry with closure-free programs.

The r6e failures look like CONSTANT EMBEDDING, not program size: timing
closures captured device arrays (iaux/iref/g = 256 MB each at 8192^2),
which jit embeds into the compile request — 768 MB of literals explains
HTTP 413 at 8192 while 4096 (64 MB each) passed. This rerun threads
every array through the loop state (the r4_final_check pattern), so the
compile request carries only shapes.

Run (real TPU, single process, background):
  python benchmarks/r6i_8192_args.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from opticalflow2d_tpu.utils.profiling import kernel_timer

N = 8192


def main():
    from opticalflow2d_tpu.solvers.base import Derivatives, derivatives
    from opticalflow2d_tpu.solvers.diffusion import diffusion_step
    from opticalflow2d_tpu.pallas_kernels.demons_onepass import (
        thirion_onepass_pallas)
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs)
    from opticalflow2d_tpu.pallas_kernels.fluid_fused import fluid_iter_pallas

    out = open("benchmarks/r6_results.jsonl", "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    rng = np.random.default_rng(0)
    iref = jnp.asarray(rng.random((N, N), dtype=np.float32))
    imov = jnp.asarray(rng.random((N, N), dtype=np.float32))
    d = derivatives(iref, imov)
    g = stack_derivs(d.grad_i, d.it)
    u = jnp.asarray(rng.uniform(-1.4, 1.4, (2, N, N)).astype(np.float32))
    u0 = jnp.zeros((2, N, N), jnp.float32)

    # jnp diffusion step, arrays threaded through the state.
    try:
        def stepj(st):
            v, gi, it_img = st
            return (diffusion_step(v, Derivatives(gi, it_img), 0.5),
                    gi, it_img)

        s = kernel_timer(stepj, (u0, d.grad_i, d.it), iters_lo=5, iters_hi=20)
        emit({"kernel": "diffusion jnp argstate", "n": N,
              "us_per_iter": round(s * 1e6, 1)})
    except Exception as e:
        emit({"kernel": "diffusion jnp argstate", "n": N,
              "error": type(e).__name__, "msg": str(e)[:160]})

    # Blocked diffusion kernel.
    for tb in (32,):
        try:
            def stepb(st, tb=tb):
                v, gg = st
                return (diffusion_block_pallas(
                    v, gg, 0.5, k=8, tb=tb, with_errors=False)[0], gg)

            s = kernel_timer(stepb, (u0, g), iters_lo=2, iters_hi=10)
            emit({"kernel": "diffusion_block k=8 argstate", "n": N, "tb": tb,
                  "us_per_iter": round(s * 1e6 / 8, 1)})
        except Exception as e:
            emit({"kernel": "diffusion_block k=8 argstate", "n": N, "tb": tb,
                  "error": type(e).__name__, "msg": str(e)[:160]})

    # One-pass Thirion demons.
    for tb in (16,):
        try:
            def stepo(st, tb=tb):
                v, ia, ir = st
                return (thirion_onepass_pallas(
                    ia, ir, v, 1.0, 0.25, 2.0, 2.0, 5, 2,
                    addition=False, tb=tb), ia, ir)

            s = kernel_timer(stepo, (u, imov, iref), iters_lo=2, iters_hi=10)
            emit({"kernel": "onepass thirion argstate", "n": N, "tb": tb,
                  "us_per_iter": round(s * 1e6, 1)})
        except Exception as e:
            emit({"kernel": "onepass thirion argstate", "n": N, "tb": tb,
                  "error": type(e).__name__, "msg": str(e)[:160]})

    # Fused fluid iteration.
    for tb in (16,):
        try:
            def stepf(st, tb=tb):
                uu, vv, gg = st
                vv, r, maxsq = fluid_iter_pallas(
                    uu, vv, gg, 0.25, 0.0, 1.5, True, False, tb=tb)
                m = jnp.sqrt(maxsq)
                dt = 0.65 / m
                do = dt < 65.0
                uu = jnp.where(do, uu + r * jnp.where(do, dt, 0.0), uu)
                return (uu, vv, gg)

            s = kernel_timer(stepf, (u0, u0, g), iters_lo=2, iters_hi=10)
            emit({"kernel": "fluid fused argstate", "n": N, "tb": tb,
                  "us_per_iter": round(s * 1e6, 1)})
        except Exception as e:
            emit({"kernel": "fluid fused argstate", "n": N, "tb": tb,
                  "error": type(e).__name__, "msg": str(e)[:160]})
    out.close()


if __name__ == "__main__":
    main()
