"""Round-8: end-to-end curvature rows with the split_fast DCT tier.

Same protocol as the r7 per-level-program curvature rows (smooth pair,
3 levels, niter 25/25/25) so the numbers are directly comparable:
r7 split_high e2e was 644.4 ms @4096^2 and 3838.0 ms @8192^2.

Run (real TPU, background): python benchmarks/r8_curv_fast_e2e.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from r7_8192_fluid_curv import smooth_pair, run_levels

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r8_results.jsonl")


def main():
    fh = open(OUT, "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register
    from opticalflow2d_tpu.ops.warp import warp2d

    rng = np.random.default_rng(7)
    for n in (4096, 8192):
        iref_np, imov_np = smooth_pair(n, rng)
        iref = jnp.asarray(iref_np)
        imov = jnp.asarray(imov_np)
        cfg = RegConfig(method=Method.CURVATURE, alpha=0.1, tau=1.0,
                        niter=(25, 25, 25), nscales=2, use_pallas=True,
                        warp_halo_auto=False, warp_halo_outer=5,
                        dct_impl="split_fast")
        try:
            t0 = time.perf_counter()
            run_levels(iref, imov, cfg, register)
            comp = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                res = run_levels(iref, imov, cfg, register)
                best = min(best, time.perf_counter() - t0)
            ireg = warp2d(imov, res.motion, 5, True)
            ssd0 = float(jnp.sum((iref - imov) ** 2))
            ssd1 = float(jnp.sum((iref - ireg) ** 2))
            emit({"bench": "e2e_perlevel_smooth", "method": "CURVATURE",
                  "dct_impl": "split_fast", "n": n,
                  "ms": round(best * 1e3, 1), "compile_s": round(comp, 1),
                  "ssd_red": round(1 - ssd1 / ssd0, 4)})
        except Exception as e:
            emit({"bench": "e2e_perlevel_smooth", "method": "CURVATURE",
                  "dct_impl": "split_fast", "n": n,
                  "error": type(e).__name__, "msg": str(e)[:200]})
        del iref, imov
    fh.close()


if __name__ == "__main__":
    main()
