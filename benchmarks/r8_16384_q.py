"""Round-8: 16384^2 probe Q — curvature. The logger-norm Pallas kernel
now carries the convergence error past 8192 lanes; the open question is
whether the DCT-matmul step itself compiles inside the while_loop at
16384 (device-generated transform tables sit exactly at the int32 phase
bound _DEVICE_GEN_MAX). Cells:

  q1. curvature level program (_jitted_level, dct_impl=split_fast)
  q2. if q1 compiles: full 3-level e2e via register_phased

Run (real TPU, background): python benchmarks/r8_16384_q.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from r8_16384_m import make_pair_16k

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r8_results.jsonl")
N = 16384


def main():
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import (
        _jitted_level, register_phased,
    )
    from opticalflow2d_tpu.ops.warp import warp2d

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_q", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    iref, imov = make_pair_16k()
    u0 = jnp.zeros((2, N, N), jnp.float32)

    cfg = RegConfig(method=Method.CURVATURE, alpha=0.1, tau=1.0,
                    niter=(5,), nscales=0, warp_halo_auto=False,
                    warp_halo_outer=4, dct_impl="split_fast")
    ok = False
    try:
        fn = _jitted_level(cfg, 5, 0)
        t0 = time.perf_counter()
        u_out, traces = fn(u0, iref, imov)
        float(jnp.sum(u_out))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        u_out, traces = fn(u0, iref, imov)
        float(jnp.sum(u_out))
        run_s = time.perf_counter() - t0
        emit({"step": "q1_level_curvature", "ok": True,
              "compile_s": round(comp, 1), "run_s": round(run_s, 3),
              "us_per_iter": round(run_s / 5 * 1e6, 1),
              "iters": int(traces[0].iterations)})
        ok = True
        del u_out
    except Exception as e:
        emit({"step": "q1_level_curvature", "error": type(e).__name__,
              "msg": str(e)[:200]})
    del u0

    if ok:
        cfg = RegConfig(method=Method.CURVATURE, alpha=0.1, tau=1.0,
                        niter=(25, 25, 25), nscales=2,
                        dct_impl="split_fast")
        try:
            t0 = time.perf_counter()
            res = register_phased(iref, imov, cfg)
            float(jnp.sum(res.motion))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            res = register_phased(iref, imov, cfg)
            float(jnp.sum(res.motion))
            best = time.perf_counter() - t0
            ireg = warp2d(imov, res.motion, 5, True)
            ssd0 = float(jnp.sum((iref - imov) ** 2))
            ssd1 = float(jnp.sum((iref - ireg) ** 2))
            emit({"step": "q2_e2e_curvature", "ok": True, "n": N,
                  "nscales": 2, "ms": round(best * 1e3, 1),
                  "compile_s": round(comp, 1),
                  "ssd_red": round(1 - ssd1 / ssd0, 4),
                  "iters": [int(t.iterations) for t in res.traces]})
        except Exception as e:
            emit({"step": "q2_e2e_curvature", "error": type(e).__name__,
                  "msg": str(e)[:200]})
    fh.close()


if __name__ == "__main__":
    main()
