"""Round-6e: first 8192^2 rows (VERDICT r2 item #4).

The one-pass/fused demons kernels cannot ship through the axon relay at
ny=8192 (remote_compile rejects the program: HTTP 413 / broken pipe —
r6_results.jsonl), so this probes what DOES work at 8192:
  (a) blocked diffusion / elastic kernels with explicit tiles,
  (b) the plain XLA step paths,
  (c) e2e registration rows for diffusion / elastic / demons.

Run (real TPU, single process, background):
  python benchmarks/r6e_8192.py
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


def emit(row, fh):
    print(json.dumps(row), flush=True)
    fh.write(json.dumps(row) + "\n")
    fh.flush()


def main():
    from opticalflow2d_tpu.solvers.base import derivatives
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs)
    from opticalflow2d_tpu.pallas_kernels.elastic_block import (
        elastic_block_pallas)

    out = open("benchmarks/r6_results.jsonl", "a")
    rng = np.random.default_rng(0)
    iref = jnp.asarray(rng.random((N, N), dtype=np.float32))
    imov = jnp.asarray(rng.random((N, N), dtype=np.float32))
    d = derivatives(iref, imov)
    g = stack_derivs(d.grad_i, d.it)
    u = jnp.zeros((2, N, N), jnp.float32)

    # (a) blocked kernels, explicit tiles (k=8 -> pad=16; tb must be a
    # multiple of pad).
    for tb in (32, 64):
        try:
            def step(v, tb=tb):
                return diffusion_block_pallas(
                    v, g, 0.5, k=8, tb=tb, with_errors=False)[0]

            s = kernel_timer(step, u, iters_lo=2, iters_hi=10)
            row = {"kernel": "diffusion_block k=8", "n": N, "tb": tb,
                   "us_per_iter": round(s * 1e6 / 8, 1)}
        except Exception as e:
            row = {"kernel": "diffusion_block k=8", "n": N, "tb": tb,
                   "error": type(e).__name__, "msg": str(e)[:160]}
        emit(row, out)

    for tb in (32,):
        try:
            def stepe(v, tb=tb):
                return elastic_block_pallas(
                    v, g, 0.25, 0.0, 1.5, True, k=4, tb=tb,
                    with_errors=False)[0]

            s = kernel_timer(stepe, u, iters_lo=2, iters_hi=10)
            row = {"kernel": "elastic_block k=4", "n": N, "tb": tb,
                   "us_per_iter": round(s * 1e6 / 4, 1)}
        except Exception as e:
            row = {"kernel": "elastic_block k=4", "n": N, "tb": tb,
                   "error": type(e).__name__, "msg": str(e)[:160]}
        emit(row, out)

    # (a2) fused fluid iteration at 8192 (much smaller Mosaic program than
    # the demons select chains — probe whether the relay accepts it).
    from opticalflow2d_tpu.pallas_kernels.fluid_fused import fluid_iter_pallas

    for tb in (32,):
        try:
            def stepf(v, tb=tb):
                vv, r, maxsq = fluid_iter_pallas(
                    v, v, g, 0.25, 0.0, 1.5, True, False, tb=tb)
                return vv + r * 0.0 + maxsq * 0.0

            s = kernel_timer(stepf, u, iters_lo=3, iters_hi=12)
            row = {"kernel": "fluid fused step", "n": N, "tb": tb,
                   "us_per_iter": round(s * 1e6, 1)}
        except Exception as e:
            row = {"kernel": "fluid fused step", "n": N, "tb": tb,
                   "error": type(e).__name__, "msg": str(e)[:160]}
        emit(row, out)

    # (b) plain XLA step paths at 8192.
    from opticalflow2d_tpu.solvers.diffusion import diffusion_step
    from opticalflow2d_tpu.solvers.elastic import elastic_step

    try:
        s = kernel_timer(lambda v: diffusion_step(v, d, 0.5), u,
                         iters_lo=5, iters_hi=20)
        emit({"kernel": "diffusion jnp", "n": N,
              "us_per_iter": round(s * 1e6, 1)}, out)
    except Exception as e:
        emit({"kernel": "diffusion jnp", "n": N,
              "error": type(e).__name__, "msg": str(e)[:160]}, out)

    # (c) e2e rows (pyramid, convergence loops; modest niter at this size).
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register
    from e2e_bench import make_pair

    iref_e, imov_e = make_pair(N)
    for method, kw in [
        (Method.DIFFUSION, dict(alpha=0.5)),
        (Method.ELASTIC, dict(mu=0.25, lam=0.0)),
        (Method.THIRIONS_DEMONS, dict(warp_halo_auto=True)),
    ]:
        cfg = RegConfig(method=method, niter=(25, 25, 25), nscales=2,
                        use_pallas=True, **kw)
        try:
            def run():
                res = register(iref_e, imov_e, cfg)
                np.asarray(res.motion)
                return res

            t0 = time.perf_counter()
            run()
            comp = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                res = run()
                best = min(best, time.perf_counter() - t0)
            row = {"bench": "e2e_8192", "method": method.name,
                   "ms": round(best * 1e3, 1), "compile_s": round(comp, 1),
                   "fallbacks": [int(t.fallbacks) for t in res.traces]}
        except Exception as e:
            row = {"bench": "e2e_8192", "method": method.name,
                   "error": type(e).__name__, "msg": str(e)[:160]}
        emit(row, out)
    out.close()


if __name__ == "__main__":
    main()
