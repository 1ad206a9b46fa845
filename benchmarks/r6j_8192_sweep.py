"""Round-6j: full 8192^2 tile sweep, now that r6i exposed the real cause
of the 8192 failures — closure-captured device arrays embedded as compile
-request constants (3 x 256 MB), NOT a relay program-size limit. With
arrays threaded through the loop state every kernel compiles at 8192.

Sweeps (tile, runtime) for the one-pass demons, fused fluid, blocked
diffusion/elastic, single-step diffusion, and the two-kernel demons
chain; then single-level e2e register() probes (the 3-level 8192 e2e
crashed the remote compile helper with HTTP 500 — probe smaller scope).

Run (real TPU, single process, background):
  python benchmarks/r6j_8192_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from opticalflow2d_tpu.utils.profiling import kernel_timer

N = 8192


def main():
    from opticalflow2d_tpu.solvers.base import derivatives
    from opticalflow2d_tpu.pallas_kernels.demons_onepass import (
        thirion_onepass_pallas)
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas, compose_smooth_pallas)
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs)
    from opticalflow2d_tpu.pallas_kernels.elastic_block import (
        elastic_block_pallas)
    from opticalflow2d_tpu.pallas_kernels.diffusion_fused import (
        diffusion_step_pallas)
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

    def sweep(name, make_step, state, tbs, per_call=1, lo=2, hi=10):
        for tb in tbs:
            try:
                s = kernel_timer(make_step(tb), state, iters_lo=lo,
                                 iters_hi=hi)
                emit({"kernel": name, "n": N, "tb": tb,
                      "us_per_iter": round(s * 1e6 / per_call, 1)})
            except Exception as e:
                emit({"kernel": name, "n": N, "tb": tb,
                      "error": type(e).__name__, "msg": str(e)[:160]})

    sweep("onepass thirion argstate",
          lambda tb: (lambda st: (thirion_onepass_pallas(
              st[1], st[2], st[0], 1.0, 0.25, 2.0, 2.0, 5, 2,
              addition=False, tb=tb), st[1], st[2])),
          (u, imov, iref), (8, 32))

    def two_kernel(tb):
        def step(st):
            v, ia, ir = st
            c = demons_correspondence_pallas(ia, ir, v, 1.0, 0.25, 2.0, 5,
                                             halo=2, tb=tb)
            return (compose_smooth_pallas(v, c, 2.0, 5, halo=2, tb=tb),
                    ia, ir)
        return step

    sweep("two-kernel fused argstate", two_kernel, (u, imov, iref), (8, 16))

    sweep("fluid fused argstate",
          lambda tb: (lambda st: (lambda vv_r_m: (
              jnp.where(0.65 / jnp.sqrt(vv_r_m[2]) < 65.0,
                        st[0] + vv_r_m[1] * jnp.where(
                            0.65 / jnp.sqrt(vv_r_m[2]) < 65.0,
                            0.65 / jnp.sqrt(vv_r_m[2]), 0.0), st[0]),
              vv_r_m[0], st[2]))(fluid_iter_pallas(
                  st[0], st[1], st[2], 0.25, 0.0, 1.5, True, False, tb=tb))),
          (u0, u0, g), (8, 32))

    sweep("diffusion_block k=8 argstate",
          lambda tb: (lambda st: (diffusion_block_pallas(
              st[0], st[1], 0.5, k=8, tb=tb, with_errors=False)[0], st[1])),
          (u0, g), (64,), per_call=8)

    sweep("elastic_block k=4 argstate",
          lambda tb: (lambda st: (elastic_block_pallas(
              st[0], st[1], 0.25, 0.0, 1.5, True, k=4, tb=tb,
              with_errors=False)[0], st[1])),
          (u0, g), (32, 64), per_call=4)

    sweep("diffusion single-step argstate",
          lambda tb: (lambda st: (diffusion_step_pallas(
              st[0], st[1], st[2], 0.5, tb=tb), st[1], st[2])),
          (u0, d.grad_i, d.it), (16, 32), lo=3, hi=12)

    # Single-level e2e probes (args-passed): does register() compile at
    # 8192 when the program is one level?
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register

    for method, kw in [
        (Method.DIFFUSION, dict(alpha=0.5)),
        (Method.THIRIONS_DEMONS, dict()),
        (Method.FLUID, dict(mu=0.25, lam=0.0)),
    ]:
        cfg = RegConfig(method=method, niter=(15,), nscales=0,
                        use_pallas=True, warp_halo_outer=5, **kw)
        try:
            def run():
                res = register(iref, imov, cfg)
                float(jnp.sum(res.motion))
                return res

            t0 = time.perf_counter()
            run()
            comp = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            emit({"bench": "e2e_8192_single_level", "method": method.name,
                  "ms": round(best * 1e3, 1), "compile_s": round(comp, 1)})
        except Exception as e:
            emit({"bench": "e2e_8192_single_level", "method": method.name,
                  "error": type(e).__name__, "msg": str(e)[:160]})
    out.close()


if __name__ == "__main__":
    main()
