"""Round-9: serving datapoint for diffeomorphic demons after the
identity-regime one-pass routing — map-mode register_batch now runs the
single-kernel iteration per pair (was the two-kernel chain; r8 serving
table recorded thirions 80.5 reg/s @1024^2 b16 with no diffeo row).

Run (real TPU, background): python benchmarks/r9_serving_diffeo.py
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
    from opticalflow2d_tpu.parallel.batch import register_batch

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "serving_diffeo", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(2)
    for method, name in ((Method.DIFFEOMORPHIC_DEMONS, "diffeo"),
                         (Method.THIRIONS_DEMONS, "thirions")):
        for n, b in ((512, 32), (1024, 16)):
            irefs = jnp.asarray(rng.random((b, n, n), dtype=np.float32))
            imovs = jnp.asarray(rng.random((b, n, n), dtype=np.float32))
            cfg = RegConfig(method=method, niter=(10, 5), nscales=1,
                            warp_halo=2, warp_halo_outer=2,
                            warp_halo_auto=False, use_pallas=True)
            try:
                out = register_batch(irefs, imovs, cfg, impl="map")
                float(jnp.sum(out.motion))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = register_batch(irefs, imovs, cfg, impl="map")
                    float(jnp.sum(out.motion))
                    best = min(best, time.perf_counter() - t0)
                emit({"family": name, "n": n, "batch": b,
                      "reg_s": round(b / best, 1),
                      "ms_per_pair": round(best / b * 1e3, 2)})
            except Exception as e:
                emit({"family": name, "n": n, "batch": b,
                      "error": type(e).__name__, "msg": str(e)[:160]})
            del irefs, imovs
    fh.close()


if __name__ == "__main__":
    main()
