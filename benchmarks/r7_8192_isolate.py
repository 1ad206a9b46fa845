"""Round-7: isolate which per-level 8192 program crashes the remote
compile helper (r7_8192_fluid_curv's per-level runs died with HTTP 500
for both curvature and fluid, yet r6's monolithic 3-level programs
compiled for diffusion/elastic/demons and r6k's single-level fluid ran).

Probes, each its own compile, cheapest first:
  a. diffusion per-level chain (control — every piece known-good),
  b. fluid level 2 only (downsample to 2048 + solve + upsample),
  c. fluid level 0 only (warm start, full-res solve),
  d. curvature level 2 / level 0 the same way,
  e. curvature level 0 with dct_impl="matmul_high" (no split concat
     chains) if the split version fails.

Run: python benchmarks/r7_8192_isolate.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r7_results.jsonl")
N = 8192


def main():
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register

    fh = open(OUT, "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(7)
    iref = jnp.asarray(rng.random((N, N), dtype=np.float32))
    imov = jnp.asarray(rng.random((N, N), dtype=np.float32))
    u0 = jnp.asarray(
        np.clip(rng.standard_normal((2, N, N)), -1.5, 1.5).astype(np.float32))

    def probe(tag, fn):
        try:
            t0 = time.perf_counter()
            res = fn()
            float(jnp.sum(res.motion))
            emit({"bench": "isolate_8192", "probe": tag,
                  "s": round(time.perf_counter() - t0, 1)})
            return True
        except Exception as e:
            emit({"bench": "isolate_8192", "probe": tag,
                  "error": type(e).__name__, "msg": str(e)[:200]})
            return False

    def cfg_for(method, **kw):
        return RegConfig(method=method, niter=(8, 8, 8), nscales=2,
                         use_pallas=True, warp_halo_auto=False,
                         warp_halo_outer=5, **kw)

    cfg_d = cfg_for(Method.DIFFUSION, alpha=0.5)
    probe("diff_lvl2", lambda: register(iref, imov, cfg_d,
                                        start_scale=2, stop_scale=2))
    probe("diff_lvl0_warm", lambda: register(iref, imov, cfg_d,
                                             initial_motion=u0,
                                             start_scale=0, stop_scale=0))

    cfg_f = cfg_for(Method.FLUID, mu=0.25, lam=0.0)
    ok2 = probe("fluid_lvl2", lambda: register(iref, imov, cfg_f,
                                               start_scale=2, stop_scale=2))
    probe("fluid_lvl0_warm", lambda: register(iref, imov, cfg_f,
                                              initial_motion=u0,
                                              start_scale=0, stop_scale=0))

    cfg_c = cfg_for(Method.CURVATURE, alpha=0.1, tau=1.0)
    probe("curv_lvl2", lambda: register(iref, imov, cfg_c,
                                        start_scale=2, stop_scale=2))
    ok0 = probe("curv_lvl0_warm", lambda: register(iref, imov, cfg_c,
                                                   initial_motion=u0,
                                                   start_scale=0,
                                                   stop_scale=0))
    if not ok0:
        cfg_cm = cfg_for(Method.CURVATURE, alpha=0.1, tau=1.0,
                         dct_impl="matmul_high")
        probe("curv_lvl0_matmul_high",
              lambda: register(iref, imov, cfg_cm, initial_motion=u0,
                               start_scale=0, stop_scale=0))
    fh.close()


if __name__ == "__main__":
    main()
