"""Round-8: 16384^2 probe K — validate the exact program shapes of a
phased huge-grid driver before building it:

  k1. fine-level program: warp(pallas h4) -> derivatives (fenced) ->
      while_loop(diffusion_block k8 tb16, in-kernel error partials,
      convergence logic — NO XLA sqrt-norm) -> compose(pallas). One jit.
  k2. coarse program: plain register() on a MATERIALIZED 8192 pair
      (downsampled in a separate jit) — the known-good 8192 shape.
  k3. elastic_block cells at 16384 lanes (explicit tb; no tier yet).

Run (real TPU, background): python benchmarks/r8_16384_k.py
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
    from opticalflow2d_tpu.ops.resample import downsample_image, upsample_image
    from opticalflow2d_tpu.ops.warp import warp2d, compose
    from opticalflow2d_tpu.solvers.base import derivatives
    from opticalflow2d_tpu.engine.registration import _loop_invariant_derivs
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs,
    )

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_k", **row}
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

    # --- k1: the fine-level phased program ----------------------------------
    K, TB = 8, 16
    NITER = 25

    @jax.jit
    def fine_level(u_in, r, m):
        iaux = warp2d(m, u_in, 4, True)
        d = _loop_invariant_derivs(derivatives(r, iaux))
        g = stack_derivs(d.grad_i, d.it)
        nb = -(-NITER // K)

        def cond(c):
            return (c[1] < NITER) & ~c[2]

        def body(c):
            u_est, it, conv, errs = c
            u_blk, sums = diffusion_block_pallas(u_est, g, 0.5, k=K, tb=TB,
                                                 with_errors=True)
            pn = sums[:, 1]
            eb = jnp.where(pn == 0, 0.0, sums[:, 0] / jnp.where(pn == 0, 1.0, pn))
            its = it + jnp.arange(K, dtype=jnp.int32)
            conv_vec = (eb < 1e-3) & (its > 1) & (its < NITER)
            any_conv = jnp.any(conv_vec)
            n_take = jnp.where(any_conv,
                               jnp.argmax(conv_vec).astype(jnp.int32) + 1,
                               jnp.minimum(NITER - it, K)).astype(jnp.int32)
            keep = jnp.arange(K, dtype=jnp.int32) < n_take
            errs = jax.lax.dynamic_update_slice(
                errs, jnp.where(keep, eb, 0.0), (it,))
            return (u_blk, it + n_take, any_conv, errs)

        u0 = jnp.zeros_like(u_in)
        errs0 = jnp.zeros((nb * K,), jnp.float32)
        u_est, it, _, errs = jax.lax.while_loop(
            cond, body, (u0, jnp.int32(0), jnp.bool_(False), errs0))
        return compose(u_in, u_est, 4, True), it, errs

    from opticalflow2d_tpu.pallas_kernels import diffusion_block as db

    db._TIERS_ERR = db._TIERS_ERR + ((16384, 16, 64 * MB),)
    db._TIERS_NOERR = db._TIERS_NOERR + ((16384, 16, 64 * MB),)

    u_in = jnp.zeros((2, N, N), jnp.float32)
    try:
        t0 = time.perf_counter()
        u_out, it, errs = fine_level(u_in, iref, imov)
        float(jnp.sum(u_out))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        u_out, it, errs = fine_level(u_in, iref, imov)
        float(jnp.sum(u_out))
        emit({"step": "k1_fine_level_blocked", "ok": True,
              "compile_s": round(comp, 1),
              "run_s": round(time.perf_counter() - t0, 3),
              "iters": int(it)})
        del u_out, errs
    except Exception as e:
        emit({"step": "k1_fine_level_blocked", "error": type(e).__name__,
              "msg": str(e)[:200]})
    del u_in

    # --- k2: coarse program on materialized 8192 pair -----------------------
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register

    try:
        down = jax.jit(lambda a: downsample_image(a, (N // 2, N // 2)))
        r8 = down(iref)
        m8 = down(imov)
        float(jnp.sum(r8))
        cfg8 = RegConfig(method=Method.DIFFUSION, alpha=0.5, niter=(25,),
                         nscales=0, warp_halo_auto=False, warp_halo_outer=4)
        t0 = time.perf_counter()
        res = register(r8, m8, cfg8)
        float(jnp.sum(res.motion))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = register(r8, m8, cfg8)
        float(jnp.sum(res.motion))
        emit({"step": "k2_coarse_8192_register", "ok": True,
              "compile_s": round(comp, 1),
              "run_s": round(time.perf_counter() - t0, 3)})
        del r8, m8, res
    except Exception as e:
        emit({"step": "k2_coarse_8192_register", "error": type(e).__name__,
              "msg": str(e)[:200]})

    # --- k3: elastic_block cells at 16384 -----------------------------------
    from opticalflow2d_tpu.pallas_kernels import elastic_block as eb
    from opticalflow2d_tpu.utils.profiling import kernel_timer

    d = jax.jit(derivatives)(iref, imov)
    g2 = eb.stack_derivs(d.grad_i, d.it) if hasattr(eb, "stack_derivs") else \
        stack_derivs(d.grad_i, d.it)
    u0 = jnp.zeros((2, N, N), jnp.float32)
    del d
    for k, tb in ((4, 8), (4, 16), (2, 8)):
        try:
            def step(st, k=k, tb=tb):
                u, gg, acc = st
                out, sums = eb.elastic_block_pallas(
                    u, gg, 0.5, 0.0, 0.66, False, k=k, tb=tb)
                return (out, gg, acc + jnp.sum(sums))

            s = kernel_timer(step, (u0, g2, jnp.float32(0)),
                             iters_lo=2, iters_hi=10)
            us_it = s * 1e6 / k
            emit({"step": f"k3_elastic_k{k}_tb{tb}", "ok": True,
                  "us_per_iter": round(us_it, 1),
                  "gpix_s": round(N * N / us_it / 1e3, 1)})
        except Exception as e:
            emit({"step": f"k3_elastic_k{k}_tb{tb}",
                  "error": type(e).__name__, "msg": str(e)[:160]})
    fh.close()


if __name__ == "__main__":
    main()
