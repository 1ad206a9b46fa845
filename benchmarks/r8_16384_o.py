"""Round-8: 16384^2 probe O — Thirion demons. Cells:

  o1. one-pass kernel at 16384 lanes (tb 8/16 x limit 64/100M),
      state-threaded, with_errors
  o2. trust-mode level program: while_loop(onepass + Logger-err logic +
      fallback predicate) + outer Pallas warp/compose, ONE jit — the
      _solve_level_demons shape minus the cond's jnp fallback branch

Run (real TPU, background): python benchmarks/r8_16384_o.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from r8_16384_m import make_pair_16k

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r8_results.jsonl")
MB = 1024 * 1024
N = 16384


def main():
    from opticalflow2d_tpu.pallas_kernels import demons_onepass as dop
    from opticalflow2d_tpu.utils.profiling import kernel_timer

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_o", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    iref, imov = make_pair_16k()

    # --- o1: kernel cells ----------------------------------------------------
    rng = np.random.default_rng(3)
    u0 = jnp.asarray(np.tanh(
        rng.standard_normal((2, N, N)).astype(np.float32)) * 0.9)
    orig = dop._TIERS_H2
    best = None
    for limit in (64 * MB, 100 * MB):
        dop._TIERS_H2 = orig + ((16384, 16, limit),)
        dop.thirion_onepass_pallas._clear_cache()
        for tb in (8, 16):
            try:
                # Thread the image pair through the loop STATE — closed
                # over, they become 1 GB compile-request constants (the
                # CLAUDE.md relay trap; probe G hung exactly this way).
                def step(st, tb=tb):
                    uu, im, ir, acc = st
                    out, sums = dop.thirion_onepass_pallas(
                        im, ir, uu, 1.0, 0.25, 2.0, 2.0, 5,
                        halo=2, tb=tb, with_errors=True)
                    return (out, im, ir, acc + jnp.sum(sums))

                s = kernel_timer(step, (u0, imov, iref, jnp.float32(0)),
                                 iters_lo=2, iters_hi=10)
                us = round(s * 1e6, 1)
                emit({"step": f"o1_onepass_tb{tb}_l{limit // MB}",
                      "ok": True, "us_per_iter": us,
                      "gpix_s": round(N * N / us / 1e3, 1)})
                if best is None or us < best[0]:
                    best = (us, tb, limit)
            except Exception as e:
                emit({"step": f"o1_onepass_tb{tb}_l{limit // MB}",
                      "error": type(e).__name__, "msg": str(e)[:160]})
    del u0
    if best is None:
        fh.close()
        return
    dop._TIERS_H2 = orig + ((16384, best[1], best[2]),)
    dop.thirion_onepass_pallas._clear_cache()

    # --- o2: trust-mode level program ---------------------------------------
    from opticalflow2d_tpu.ops.warp import (
        warp2d, compose, _displacement_bounded, _sample_coords,
    )

    NITER = 25

    @jax.jit
    def level(u_in, r, m):
        iaux = warp2d(m, u_in, 4, True)

        def cond(c):
            return (c[2] < NITER) & ~c[3]

        def body(c):
            u_est, _, it, conv, errs, nfb = c
            px, py = _sample_coords(u_est)
            nfb = nfb + (~_displacement_bounded(
                iaux[None], px, py, 2)).astype(jnp.int32)
            u_new, sums = dop.thirion_onepass_pallas(
                iaux, r, u_est, 1.0, 0.25, 2.0, 2.0, 5,
                halo=2, with_errors=True)
            npix = N * N
            dn = sums[0] / npix
            pn = sums[1] / npix
            err = jnp.where(pn == 0, 0.0, dn / jnp.where(pn == 0, 1.0, pn))
            errs = errs.at[it].set(err)
            conv = (err < 1e-3) & (it > 1)
            return (u_new, u_new, it + 1, conv, errs, nfb)

        u0 = jnp.zeros_like(u_in)
        errs0 = jnp.zeros((NITER,), jnp.float32)
        u_est, _, it, _, errs, nfb = jax.lax.while_loop(
            cond, body,
            (u0, u0, jnp.int32(0), jnp.bool_(False), errs0, jnp.int32(0)))
        return compose(u_in, u_est, 4, True), it, nfb

    u_in = jnp.zeros((2, N, N), jnp.float32)
    try:
        t0 = time.perf_counter()
        u_out, it, nfb = level(u_in, iref, imov)
        float(jnp.sum(u_out))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        u_out, it, nfb = level(u_in, iref, imov)
        float(jnp.sum(u_out))
        emit({"step": "o2_level_trust", "ok": True,
              "compile_s": round(comp, 1),
              "run_s": round(time.perf_counter() - t0, 3),
              "iters": int(it), "nfb": int(nfb)})
    except Exception as e:
        emit({"step": "o2_level_trust", "error": type(e).__name__,
              "msg": str(e)[:200]})
    fh.close()


if __name__ == "__main__":
    main()
