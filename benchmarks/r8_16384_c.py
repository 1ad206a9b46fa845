"""Round-8: 16384^2 probe C — end-to-end registration after the library
changes (16384 Pallas gather tiers + unconditional fast path past
``_EXACT_FALLBACK_MAX_EXTENT``). Per-level programs, diffusion first,
then elastic (jnp red-black step; its blocked kernel has no 16384 tier).

Run (real TPU, background): python benchmarks/r8_16384_c.py
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
    from opticalflow2d_tpu.engine.registration import register

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_c", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(16)
    seed_r = jnp.asarray(rng.random((N // 64, N // 64), dtype=np.float32))
    # A smoothly displaced partner: upsample a shifted seed so the pair
    # has real structure to register.
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

    def run_levels(cfg):
        res = register(iref, imov, cfg, start_scale=cfg.nscales,
                       stop_scale=cfg.nscales)
        for s in range(cfg.nscales - 1, -1, -1):
            res = register(iref, imov, cfg, initial_motion=res.motion,
                           start_scale=s, stop_scale=s)
        float(jnp.sum(res.motion))
        return res

    for method, kw, niter in [
        (Method.DIFFUSION, dict(alpha=0.5), (25, 25)),
        (Method.ELASTIC, dict(mu=0.5, lam=0.0), (25, 25)),
    ]:
        cfg = RegConfig(method=method, niter=niter, nscales=1,
                        warp_halo_auto=False, warp_halo_outer=4, **kw)
        try:
            t0 = time.perf_counter()
            run_levels(cfg)
            comp = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                res = run_levels(cfg)
                best = min(best, time.perf_counter() - t0)
            fb = [int(t.fallbacks) for t in res.traces]
            from opticalflow2d_tpu.ops.warp import warp2d
            ireg = warp2d(imov, res.motion, 4, True)
            ssd0 = float(jnp.sum((iref - imov) ** 2))
            ssd1 = float(jnp.sum((iref - ireg) ** 2))
            emit({"step": f"e2e_{method.name.lower()}", "ok": True,
                  "ms": round(best * 1e3, 1), "compile_s": round(comp, 1),
                  "fallback_flags": fb,
                  "ssd_red": round(1 - ssd1 / ssd0, 4)})
        except Exception as e:
            emit({"step": f"e2e_{method.name.lower()}",
                  "error": type(e).__name__, "msg": str(e)[:200]})
    fh.close()


if __name__ == "__main__":
    main()
