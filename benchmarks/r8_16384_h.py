"""Round-8: 16384^2 probe H — end-to-end registration with the engine's
derivative fence (``_loop_invariant_derivs``) in place, plus the
blocked-diffusion cells redone with the derivative stack threaded
through the loop STATE (probe G's cells hung shipping a 3 GB closure
constant through the compile relay — the documented trap, CLAUDE.md).

Run (real TPU, background): python benchmarks/r8_16384_h.py
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
        row = {"bench": "probe_16384_h", **row}
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
            emit({"step": f"e2e_{method.name.lower()}", "ok": True,
                  "ms": round(best * 1e3, 1), "compile_s": round(comp, 1),
                  "ssd_red": round(1 - ssd1 / ssd0, 4)})
            del res, ireg
        except Exception as e:
            emit({"step": f"e2e_{method.name.lower()}",
                  "error": type(e).__name__, "msg": str(e)[:200]})

    # --- blocked diffusion cells, state-threaded ----------------------------
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs,
    )
    from opticalflow2d_tpu.solvers.base import derivatives
    from opticalflow2d_tpu.utils.profiling import kernel_timer

    d = jax.jit(derivatives)(iref, imov)
    g = stack_derivs(d.grad_i, d.it)
    u0 = jnp.zeros((2, N, N), jnp.float32)
    float(jnp.sum(g))
    del d

    for k, tbs in ((16, (16,)), (8, (8, 16))):
        for tb in tbs:
            try:
                def step(st, k=k, tb=tb):
                    u, gg, acc = st
                    out, sums = diffusion_block_pallas(
                        u, gg, 0.5, k=k, tb=tb, with_errors=True)
                    return (out, gg, acc + jnp.sum(sums))

                s = kernel_timer(step, (u0, g, jnp.float32(0)),
                                 iters_lo=2, iters_hi=10)
                us_it = s * 1e6 / k
                emit({"step": f"blocked_k{k}_tb{tb}", "ok": True,
                      "us_per_iter": round(us_it, 1),
                      "gpix_s": round(N * N / us_it / 1e3, 1)})
            except Exception as e:
                emit({"step": f"blocked_k{k}_tb{tb}",
                      "error": type(e).__name__, "msg": str(e)[:160]})
    fh.close()


if __name__ == "__main__":
    main()
