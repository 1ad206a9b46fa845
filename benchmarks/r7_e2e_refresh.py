"""Round-7: e2e refresh of the demons rows with the hat-gather kernels.

Protocols match the r3 tables exactly so the rows are comparable:
- "final e2e sweep": register(), niter=(25,25), nscales=1, pinned halos
  (thirions @1024 halo2: was 45.4 ms; @2048 halo4: 272.6; @4096 halo4:
  1268.7).
- 3-level 8192: niter=(25,25,25), nscales=2, warp_halo_outer=5 monolithic
  (was 1114.5 ms), uniform-noise pair like r6.

Run (real TPU, background): python benchmarks/r7_e2e_refresh.py
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


def main():
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register

    fh = open(OUT, "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(0)

    def timed(tag, iref, imov, cfg, extra=None):
        try:
            def run():
                res = register(iref, imov, cfg)
                float(jnp.sum(res.motion))
                return res

            t0 = time.perf_counter()
            run()
            comp = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            row = {"bench": "e2e_refresh", "config": tag,
                   "ms": round(best * 1e3, 1), "compile_s": round(comp, 1)}
            if extra:
                row.update(extra)
            emit(row)
        except Exception as e:
            emit({"bench": "e2e_refresh", "config": tag,
                  "error": type(e).__name__, "msg": str(e)[:200]})

    for n, halo in ((1024, 2), (2048, 4), (4096, 4)):
        iref = jnp.asarray(rng.random((n, n), dtype=np.float32))
        imov = jnp.asarray(rng.random((n, n), dtype=np.float32))
        cfg = RegConfig(method=Method.THIRIONS_DEMONS, niter=(25, 25),
                        nscales=1, use_pallas=True, warp_halo=2,
                        warp_halo_outer=halo, warp_halo_auto=False)
        timed(f"thirions_{n}_h{halo}", iref, imov, cfg, {"n": n})
        del iref, imov

    # diffeo rides the two-kernel chain (1.48x @2048 in the micro race)
    n = 2048
    iref = jnp.asarray(rng.random((n, n), dtype=np.float32))
    imov = jnp.asarray(rng.random((n, n), dtype=np.float32))
    cfg = RegConfig(method=Method.DIFFEOMORPHIC_DEMONS, niter=(25, 25),
                    nscales=1, use_pallas=True, warp_halo=2,
                    warp_halo_outer=4, warp_halo_auto=False)
    timed("diffeo_2048_h4", iref, imov, cfg, {"n": n})
    del iref, imov

    # 3-level 8192 (r6 protocol: monolithic, noise pair)
    n = 8192
    iref = jnp.asarray(rng.random((n, n), dtype=np.float32))
    imov = jnp.asarray(rng.random((n, n), dtype=np.float32))
    cfg = RegConfig(method=Method.THIRIONS_DEMONS, niter=(25, 25, 25),
                    nscales=2, use_pallas=True, warp_halo=2,
                    warp_halo_outer=5, warp_halo_auto=False)
    timed("thirions_8192_3lvl", iref, imov, cfg, {"n": n})
    fh.close()


if __name__ == "__main__":
    main()
