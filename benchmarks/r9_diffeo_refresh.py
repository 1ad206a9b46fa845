"""Round-9 (driver round 5): diffeomorphic demons e2e refresh after the
identity-regime one-pass routing (solvers.demons.onepass_routed — the
default sigma set has exp-map bound 0.125 <= 0.5, so diffeo now rides
the single-kernel Thirion iteration instead of the two-kernel chain).

Protocol matches the r7 refresh rows (register(), niter=(25,25),
nscales=1, pinned halos) so rows are comparable: prior diffeo @1024 was
59.5 ms on the two-kernel chain vs Thirion's 43.6 on one-pass
(RESULTS.md "r7 e2e refresh" table); 2048/4096 diffeo had no refreshed
rows — these are the first.

Run (real TPU, background): python benchmarks/r9_diffeo_refresh.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r9_results.jsonl")


def main():
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register
    from opticalflow2d_tpu.ops.warp import warp2d

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "diffeo_refresh", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(4)
    for n, halo in ((1024, 2), (2048, 4), (4096, 4)):
        iref = jnp.asarray(rng.random((n, n), dtype=np.float32))
        imov = jnp.asarray(rng.random((n, n), dtype=np.float32))
        for method, name in ((Method.DIFFEOMORPHIC_DEMONS, "diffeo"),
                             (Method.THIRIONS_DEMONS, "thirions")):
            cfg = RegConfig(method=method, niter=(25, 25), nscales=1,
                            warp_halo=2, warp_halo_outer=halo,
                            warp_halo_auto=False, use_pallas=True)
            try:
                res = register(iref, imov, cfg)
                float(jnp.sum(res.motion))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    res = register(iref, imov, cfg)
                    float(jnp.sum(res.motion))
                    best = min(best, time.perf_counter() - t0)
                ireg = warp2d(imov, res.motion, halo, True)
                ssd0 = float(jnp.sum((iref - imov) ** 2))
                ssd1 = float(jnp.sum((iref - ireg) ** 2))
                emit({"family": name, "n": n, "halo_outer": halo,
                      "ms": round(best * 1e3, 1),
                      "ssd_red": round(1 - ssd1 / ssd0, 4),
                      "iters": [int(t.iterations) for t in res.traces]})
            except Exception as e:
                emit({"family": name, "n": n, "error": type(e).__name__,
                      "msg": str(e)[:200]})
        del iref, imov
    fh.close()


if __name__ == "__main__":
    main()
