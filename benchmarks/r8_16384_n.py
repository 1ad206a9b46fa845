"""Round-8: 16384^2 probe N — level programs and full phased e2e after
the k=1-past-8192 engine change (no recompute branch in huge programs).
Small-displacement pair (~2.5 px sine warp of the blown-up seed).

Run (real TPU, background): python benchmarks/r8_16384_n.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
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

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_n", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    iref, imov = make_pair_16k()
    u0 = jnp.zeros((2, N, N), jnp.float32)

    # --- level programs (the previously crashing shapes) --------------------
    for method, kw in [
        (Method.DIFFUSION, dict(alpha=0.5)),
        (Method.ELASTIC, dict(mu=0.5, lam=0.0)),
    ]:
        cfg = RegConfig(method=method, niter=(25,), nscales=0,
                        warp_halo_auto=False, warp_halo_outer=4, **kw)
        try:
            fn = _jitted_level(cfg, 25, 0)
            t0 = time.perf_counter()
            u_out, traces = fn(u0, iref, imov)
            float(jnp.sum(u_out))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            u_out, traces = fn(u0, iref, imov)
            float(jnp.sum(u_out))
            emit({"step": f"n_level_{method.name.lower()}", "ok": True,
                  "compile_s": round(comp, 1),
                  "run_s": round(time.perf_counter() - t0, 3),
                  "iters": int(traces[0].iterations)})
            del u_out
        except Exception as e:
            emit({"step": f"n_level_{method.name.lower()}",
                  "error": type(e).__name__, "msg": str(e)[:200]})
    del u0

    # --- full phased e2e (production defaults, 3 levels) --------------------
    from opticalflow2d_tpu.ops.warp import warp2d

    for method, kw in [
        (Method.DIFFUSION, dict(alpha=0.5)),
        (Method.ELASTIC, dict(mu=0.5, lam=0.0)),
    ]:
        cfg = RegConfig(method=method, niter=(25, 25, 25), nscales=2, **kw)
        try:
            t0 = time.perf_counter()
            res = register_phased(iref, imov, cfg)
            float(jnp.sum(res.motion))
            comp = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                res = register_phased(iref, imov, cfg)
                float(jnp.sum(res.motion))
                best = min(best, time.perf_counter() - t0)
            ireg = warp2d(imov, res.motion, 5, True)
            ssd0 = float(jnp.sum((iref - imov) ** 2))
            ssd1 = float(jnp.sum((iref - ireg) ** 2))
            emit({"step": f"n_e2e_{method.name.lower()}", "ok": True,
                  "n": N, "nscales": 2, "ms": round(best * 1e3, 1),
                  "compile_s": round(comp, 1),
                  "ssd_red": round(1 - ssd1 / ssd0, 4),
                  "iters": [int(t.iterations) for t in res.traces]})
            del res, ireg
        except Exception as e:
            emit({"step": f"n_e2e_{method.name.lower()}",
                  "error": type(e).__name__, "msg": str(e)[:200]})
    fh.close()


if __name__ == "__main__":
    main()
