"""Round-8: 16384^2 probe B — gather tier extension + e2e crash isolation.

Probe A (r8_16384_probe) showed every component works at 16384^2 except:
(1) warps fall back to the exact gather (24.1 s/warp — no Pallas gather
tier past 8192 lanes), and (2) the full registration program crashes the
remote compile helper (HTTP 500) even though each component compiles
alone. This probe:

  1. patches experimental 16384 entries into the warp_fused tier tables
     and times the Pallas gather at tb=8/16 (halo 2 and 4);
  2. isolates the e2e crash: per-level register() programs (the split
     that fixed fluid@8192), then a fine-level program with niter=1,
     then one with warp_halo_outer=0.

Run (real TPU, background): python benchmarks/r8_16384_b.py
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
MB = 1024 * 1024
N = 16384


def main():
    from opticalflow2d_tpu.pallas_kernels import warp_fused as wf
    from opticalflow2d_tpu.ops.resample import upsample_image

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_b", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(16)
    seed_r = jnp.asarray(rng.random((N // 64, N // 64), dtype=np.float32))
    seed_m = jnp.asarray(rng.random((N // 64, N // 64), dtype=np.float32))

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

    # --- 1. experimental 16384 gather tiers ---------------------------------
    wf._TIERS_H2 = wf._TIERS_H2 + ((16384, 16, 64 * MB),)
    wf._TIERS_WIDE = wf._TIERS_WIDE + ((16384, 8, 64 * MB),)

    @jax.jit
    def mk_u():
        r = jnp.sin(jax.lax.broadcasted_iota(jnp.float32, (N, N), 0) * 0.001)
        return jnp.stack([r * 2.0, -r * 1.5])

    u = mk_u()
    float(jnp.sum(u))
    for halo in (2, 4):
        for tb in (8, 16):
            try:
                wf.warp2d_pallas._clear_cache()

                @jax.jit
                def w(m, uu, halo=halo, tb=tb):
                    return jnp.sum(wf.warp2d_pallas(m, uu, halo, tb))

                t0 = time.perf_counter()
                float(w(imov, u))
                comp = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(w(imov, u))
                emit({"step": f"pallas_gather_h{halo}_tb{tb}", "ok": True,
                      "compile_s": round(comp, 1),
                      "run_s": round(time.perf_counter() - t0, 3)})
            except Exception as e:
                emit({"step": f"pallas_gather_h{halo}_tb{tb}",
                      "error": type(e).__name__, "msg": str(e)[:160]})
    del u

    # --- 2. e2e crash isolation ---------------------------------------------
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register

    def try_cfg(name, cfg, per_level):
        try:
            t0 = time.perf_counter()
            if per_level:
                res = register(iref, imov, cfg, start_scale=cfg.nscales,
                               stop_scale=cfg.nscales)
                for s in range(cfg.nscales - 1, -1, -1):
                    res = register(iref, imov, cfg,
                                   initial_motion=res.motion,
                                   start_scale=s, stop_scale=s)
            else:
                res = register(iref, imov, cfg)
            float(jnp.sum(res.motion))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            if per_level:
                res = register(iref, imov, cfg, start_scale=cfg.nscales,
                               stop_scale=cfg.nscales)
                for s in range(cfg.nscales - 1, -1, -1):
                    res = register(iref, imov, cfg,
                                   initial_motion=res.motion,
                                   start_scale=s, stop_scale=s)
            else:
                res = register(iref, imov, cfg)
            float(jnp.sum(res.motion))
            emit({"step": name, "ok": True, "compile_s": round(comp, 1),
                  "run_s": round(time.perf_counter() - t0, 3)})
            return True
        except Exception as e:
            emit({"step": name, "error": type(e).__name__,
                  "msg": str(e)[:160]})
            return False

    base = dict(method=Method.DIFFUSION, alpha=0.5, niter=(4, 4), nscales=1,
                warp_halo_auto=False)
    ok = try_cfg("e2e_perlevel_h4",
                 RegConfig(warp_halo_outer=4, **base), True)
    if not ok:
        try_cfg("e2e_perlevel_h0",
                RegConfig(warp_halo=0, warp_halo_outer=0, **base), True)
        try_cfg("e2e_fine_only_h0_niter1",
                RegConfig(warp_halo=0, warp_halo_outer=0,
                          method=Method.DIFFUSION, alpha=0.5, niter=(1,),
                          nscales=0, warp_halo_auto=False), False)
    fh.close()


if __name__ == "__main__":
    main()
