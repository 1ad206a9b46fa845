"""Round-9 (driver round 5): 16384^2 e2e for the three families the
round-4 VERDICT left blocked at that size — via the new host-stepped
level driver (one program per iteration, Logger/regrid control on the
host; engine/registration._solve_level_stepped):

  - diffeomorphic demons: static-count exp map (VERDICT r4 task 3) —
    nsq bound from |c| <= sigma_x/(2 sigma_i), 0 at the default params,
    so the map is exactly the reference's nsquares==0 early return;
  - fluid: regridding as a host phase boundary (task 4) — the regrid
    predicate is a scalar readback, the compose/re-warp/re-derive runs
    as its own program;
  - curvature: per-iteration programs + u_est donation shrink HBM
    residency below the 16 GB that OOM'd the monolithic level (task 2).

Protocol matches the r8 16k rows (same make_pair_16k input, 3-level
pyramid, niter 25/level, ssd_red via halo-5 Pallas warp).

Run (real TPU, background): python benchmarks/r9_16384_stepped.py
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from r8_16384_m import make_pair_16k

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r9_results.jsonl")
N = 16384

FAMILIES = [
    ("diffeo", dict(method="DIFFEOMORPHIC_DEMONS")),
    ("fluid", dict(method="FLUID", mu=0.25, lam=0.0)),
    ("curvature", dict(method="CURVATURE", alpha=0.1, tau=1.0,
                       dct_impl="split_fast")),
]


def main():
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register_phased
    from opticalflow2d_tpu.ops.warp import warp2d

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "e2e_16384_stepped", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    only = set(sys.argv[1:])
    iref, imov = make_pair_16k()
    ssd0 = float(jnp.sum((iref - imov) ** 2))

    for name, kw in FAMILIES:
        if only and name not in only:
            continue
        kw = dict(kw)
        method = Method[kw.pop("method")]
        cfg = RegConfig(method=method, niter=(25, 25, 25), nscales=2, **kw)
        try:
            t0 = time.perf_counter()
            res = register_phased(iref, imov, cfg)
            float(jnp.sum(res.motion))
            cold = time.perf_counter() - t0
            iters = [int(t.iterations) for t in res.traces]
            regrids = [int(t.regrids) for t in res.traces]
            fallbacks = [int(t.fallbacks) for t in res.traces]
            # Free the first result before the warm rerun: holding its
            # 2 GB motion during the second pass pushes the fluid level
            # past HBM (the r9 bench-only OOM after the probe passed).
            del res
            gc.collect()
            t0 = time.perf_counter()
            res = register_phased(iref, imov, cfg)
            float(jnp.sum(res.motion))
            warm = time.perf_counter() - t0
            ireg = warp2d(imov, res.motion, 5, True)
            ssd1 = float(jnp.sum((iref - ireg) ** 2))
            emit({"family": name, "ok": True, "n": N, "nscales": 2,
                  "cold_s": round(cold, 1), "warm_s": round(warm, 2),
                  "ssd_red": round(1 - ssd1 / ssd0, 4),
                  "iters": iters, "regrids": regrids,
                  "fallbacks": fallbacks})
            del res, ireg
        except Exception as e:
            emit({"family": name, "error": type(e).__name__,
                  "msg": str(e)[:300]})
        gc.collect()
    fh.close()


if __name__ == "__main__":
    main()
