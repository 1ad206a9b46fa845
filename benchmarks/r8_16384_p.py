"""Round-8: 16384^2 probe P — Thirion demons end-to-end via
``register_phased`` (16384 one-pass tier + trust-mode step now in the
library). 3 levels, production defaults.

Run (real TPU, background): python benchmarks/r8_16384_p.py
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
    from opticalflow2d_tpu.engine.registration import register_phased
    from opticalflow2d_tpu.ops.warp import warp2d

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "e2e_16384_phased", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    iref, imov = make_pair_16k()
    cfg = RegConfig(method=Method.THIRIONS_DEMONS, niter=(25, 25, 25),
                    nscales=2)
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
        emit({"method": "THIRIONS_DEMONS", "n": N, "nscales": 2,
              "ms": round(best * 1e3, 1), "compile_s": round(comp, 1),
              "ssd_red": round(1 - ssd1 / ssd0, 4),
              "iters": [int(t.iterations) for t in res.traces],
              "fallbacks": [int(t.fallbacks) for t in res.traces]})
    except Exception as e:
        emit({"method": "THIRIONS_DEMONS", "n": N,
              "error": type(e).__name__, "msg": str(e)[:200]})
    fh.close()


if __name__ == "__main__":
    main()
