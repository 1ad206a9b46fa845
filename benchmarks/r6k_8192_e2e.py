"""Round-6k: fresh-process retry of the single-level 8192^2 e2e probes
(the r6j run's e2e failures came seconds after a kernel compile crashed
the relay helper — possibly a poisoned worker, so retry isolated).

Run: python benchmarks/r6k_8192_e2e.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main():
    out = open("benchmarks/r6_results.jsonl", "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    rng = np.random.default_rng(0)
    N = 8192
    iref = jnp.asarray(rng.random((N, N), dtype=np.float32))
    imov = jnp.asarray(rng.random((N, N), dtype=np.float32))

    # Single-level e2e probes (args-passed): does register() compile at
    # 8192 when the program is one level?
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register

    for method, kw in [
        (Method.DIFFUSION, dict(alpha=0.5)),
        (Method.THIRIONS_DEMONS, dict()),
        (Method.FLUID, dict(mu=0.25, lam=0.0)),
    ]:
        cfg = RegConfig(method=method, niter=(15,), nscales=0,
                        use_pallas=True, warp_halo_outer=5, **kw)
        try:
            def run():
                res = register(iref, imov, cfg)
                float(jnp.sum(res.motion))
                return res

            t0 = time.perf_counter()
            run()
            comp = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            emit({"bench": "e2e_8192_single_level", "method": method.name,
                  "ms": round(best * 1e3, 1), "compile_s": round(comp, 1)})
        except Exception as e:
            emit({"bench": "e2e_8192_single_level", "method": method.name,
                  "error": type(e).__name__, "msg": str(e)[:160]})
    out.close()


if __name__ == "__main__":
    main()
