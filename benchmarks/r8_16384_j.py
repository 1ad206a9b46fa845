"""Round-8: 16384^2 probe J — two candidate fixes for the sqrt-norm
compile killer (probe I: ``motion_norm``'s per-pixel sqrt inside the
while_loop HTTP-500s at 16384; sum-of-squares compiles).

  j1. loop + logger where the norm's sqrt magnitudes pass through
      ``lax.optimization_barrier`` before the sum (fence inside the norm)
  j2. full register() e2e with an in-process 16384 diffusion_block tier
      (the blocked driver's errors come from in-kernel partials — no XLA
      norm in its loop at all) — requires j1's fence only for the final
      partial-block recompute path, which uses the jnp step + logger...
      so j2 is attempted with the j1 fence monkeypatched into the engine
      when j1 works, else alone to see how far it gets.

Run (real TPU, background): python benchmarks/r8_16384_j.py
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
    from opticalflow2d_tpu.ops.resample import upsample_image
    from opticalflow2d_tpu.solvers.base import Derivatives, derivatives
    from opticalflow2d_tpu.solvers.diffusion import diffusion_step

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_j", **row}
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
    d = jax.jit(derivatives)(iref, imov)
    float(jnp.sum(d.it))

    def fenced_norm(u):
        mag = jnp.sqrt(u[0] ** 2 + u[1] ** 2)
        mag = jax.lax.optimization_barrier(mag)
        return jnp.sum(mag) / (u.shape[1] * u.shape[2])

    # --- j1: fenced sqrt-norm logger loop -----------------------------------
    @jax.jit
    def j1(u0, gi, it_img):
        dd = Derivatives(gi, it_img)
        errs0 = jnp.zeros((25,), jnp.float32)

        def body(carry):
            u_est, prev, it, conv, errs = carry
            u_new = diffusion_step(u_est, dd, 0.5)
            pn = fenced_norm(prev)
            dn = fenced_norm(u_new - prev)
            err = jnp.where(pn == 0, 0.0, dn / jnp.where(pn == 0, 1.0, pn))
            errs = errs.at[it].set(err)
            conv = (err < 1e-3) & (it > 1)
            return (u_new, u_new, it + 1, conv, errs)

        u, _, it, _, errs = jax.lax.while_loop(
            lambda c: (c[2] < 25) & ~c[3], body,
            (u0, u0, jnp.int32(0), jnp.bool_(False), errs0))
        return jnp.sum(u) + jnp.sum(errs) + it

    u0 = jnp.zeros((2, N, N), jnp.float32)
    try:
        t0 = time.perf_counter()
        float(j1(u0, d.grad_i, d.it))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(j1(u0, d.grad_i, d.it))
        emit({"step": "j1_fenced_sqrt_norm", "ok": True,
              "compile_s": round(comp, 1),
              "run_s": round(time.perf_counter() - t0, 3)})
        j1_ok = True
    except Exception as e:
        emit({"step": "j1_fenced_sqrt_norm", "error": type(e).__name__,
              "msg": str(e)[:160]})
        j1_ok = False
    del u0, d

    # --- j2: register() e2e with 16384 blocked tier + fenced norms ----------
    from opticalflow2d_tpu.pallas_kernels import diffusion_block as db
    from opticalflow2d_tpu.engine import registration as reg
    from opticalflow2d_tpu.ops.reduce import motion_norm as _mn

    db._TIERS_ERR = db._TIERS_ERR + ((16384, 16, 64 * MB),)
    db._TIERS_NOERR = db._TIERS_NOERR + ((16384, 16, 64 * MB),)
    if j1_ok:
        def fenced_rel_err(u_new, u_prev):
            pn = fenced_norm(u_prev)
            dn = fenced_norm(u_new - u_prev)
            return jnp.where(pn == 0, 0.0,
                             dn / jnp.where(pn == 0, 1.0, pn))

        reg._rel_step_error = fenced_rel_err

    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register

    def run_levels(cfg):
        res = register(iref, imov, cfg, start_scale=cfg.nscales,
                       stop_scale=cfg.nscales)
        for s in range(cfg.nscales - 1, -1, -1):
            res = register(iref, imov, cfg, initial_motion=res.motion,
                           start_scale=s, stop_scale=s)
        float(jnp.sum(res.motion))
        return res

    for method, kw in [
        (Method.DIFFUSION, dict(alpha=0.5)),
        (Method.ELASTIC, dict(mu=0.5, lam=0.0)),
    ]:
        cfg = RegConfig(method=method, niter=(25, 25), nscales=1,
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
            from opticalflow2d_tpu.ops.warp import warp2d
            ireg = warp2d(imov, res.motion, 4, True)
            ssd0 = float(jnp.sum((iref - imov) ** 2))
            ssd1 = float(jnp.sum((iref - ireg) ** 2))
            emit({"step": f"j2_e2e_{method.name.lower()}", "ok": True,
                  "ms": round(best * 1e3, 1), "compile_s": round(comp, 1),
                  "ssd_red": round(1 - ssd1 / ssd0, 4)})
            del res, ireg
        except Exception as e:
            emit({"step": f"j2_e2e_{method.name.lower()}",
                  "error": type(e).__name__, "msg": str(e)[:200]})
    fh.close()


if __name__ == "__main__":
    main()
