"""Round-8: 16384^2 end-to-end registrations via ``register_phased`` —
the capability rows. Production defaults (use_pallas on, blocked
kernels, Pallas gathers with the >8192 unconditional fast path,
derivative fence), 3-level pyramid (16384/8192/4096), niter 25/level.

Run (real TPU, background): python benchmarks/r8_16384_l.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r8_results.jsonl")
N = 16384


def main():
    from opticalflow2d_tpu.ops.resample import upsample_image
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register_phased

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "e2e_16384_phased", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(16)
    seed_r = jnp.asarray(rng.random((N // 64, N // 64), dtype=np.float32))
    seed_m = jnp.asarray(
        np.roll(np.asarray(seed_r), (2, -1), (0, 1))
        + 0.05 * rng.random((N // 64, N // 64), dtype=np.float32))

    @jax.jit
    def blow_up(s):
        x = s
        for _ in range(6):
            nx, ny = x.shape
            x = upsample_image(x, (2 * nx, 2 * ny))
        return x

    iref = blow_up(seed_r)
    imov = blow_up(seed_m)
    float(jnp.sum(iref))

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
            from opticalflow2d_tpu.ops.warp import warp2d
            ireg = warp2d(imov, res.motion, 5, True)
            ssd0 = float(jnp.sum((iref - imov) ** 2))
            ssd1 = float(jnp.sum((iref - ireg) ** 2))
            emit({"method": method.name, "n": N, "nscales": 2,
                  "ms": round(best * 1e3, 1), "compile_s": round(comp, 1),
                  "ssd_red": round(1 - ssd1 / ssd0, 4),
                  "iters": [int(t.iterations) for t in res.traces]})
            del res, ireg
        except Exception as e:
            emit({"method": method.name, "n": N,
                  "error": type(e).__name__, "msg": str(e)[:200]})
    fh.close()


if __name__ == "__main__":
    main()
