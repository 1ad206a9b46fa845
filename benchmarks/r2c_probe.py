"""Bisect the demons level-driver per-iteration overhead (r2b found e2e
iterations cost ~2-4 ms where the isolated fused step costs 0.64 ms, for
the jnp path too — pre-existing in round 1).

Builds the level loop up construct by construct at 1024^2 x 25 iterations:
  1. fori_loop of the no-cond fused step
  2. while_loop (iteration cap only) of the same
  3. + Logger convergence gate (_rel_step_error + errs trace)
  4. + the displacement-bound lax.conds (the real fused step)
  5. register() with nscales=0 (the actual driver)
Appends to benchmarks/r2_results.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

OUT = os.path.join(os.path.dirname(__file__), "r2_results.jsonl")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def timeit(fn, *args, reps=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    nx = ny = 1024
    xs = np.arange(nx)[:, None]; ys = np.arange(ny)[None, :]

    def img(ox, oy):
        g = 0.08 * np.sin((xs - ox) / 5.0) * np.cos((ys - oy) / 4.0)
        for (cx, cy, s, a) in [(nx*0.4, ny*0.5, 60.0, 1.0),
                               (nx*0.65, ny*0.3, 40.0, 0.7)]:
            g = g + a * np.exp(-(((xs - ox) - cx)**2 + ((ys - oy) - cy)**2)
                               / (2*s*s))
        return g.astype(np.float32)

    iref = jnp.asarray(img(0, 0))
    imov = jnp.asarray(img(1.2, -0.8))
    u0 = jnp.zeros((2, nx, ny), jnp.float32)
    niter = 25

    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas, compose_smooth_pallas)
    from opticalflow2d_tpu.solvers.demons import make_demons_step
    from opticalflow2d_tpu.engine.registration import _rel_step_error

    si, sx, sf, sd, kw, halo = 1.0, 0.25, 2.0, 2.0, 5, 2

    def direct_step(u):
        c = demons_correspondence_pallas(imov, iref, u, si, sx, sf, kw, halo)
        return compose_smooth_pallas(u, c, sd, kw, halo)

    # 1. fori_loop, no conds
    @jax.jit
    def lvl1(u):
        return jnp.sum(lax.fori_loop(0, niter, lambda _, u: direct_step(u), u))

    emit(probe="fori_nocond", ms=round(timeit(lvl1, u0) * 1e3, 1))

    # 2. while_loop, cap only
    @jax.jit
    def lvl2(u):
        def cond(c): return c[1] < niter
        def body(c): return (direct_step(c[0]), c[1] + 1)
        return jnp.sum(lax.while_loop(cond, body, (u, jnp.int32(0)))[0])

    emit(probe="while_nocond", ms=round(timeit(lvl2, u0) * 1e3, 1))

    # 3. + Logger gate
    @jax.jit
    def lvl3(u):
        def cond(c):
            _, _, it, conv, _ = c
            return (it < niter) & ~conv
        def body(c):
            u_est, prev, it, conv, errs = c
            u_new = direct_step(u_est)
            err = _rel_step_error(u_new, prev)
            errs = errs.at[it].set(err)
            conv = (err < 0.001) & (it > 1)
            return (u_new, u_new, it + 1, conv, errs)
        out = lax.while_loop(
            cond, body,
            (u, u, jnp.int32(0), jnp.bool_(False), jnp.zeros((niter,))))
        return jnp.sum(out[0]) + out[2]

    emit(probe="while_gate", ms=round(timeit(lvl3, u0) * 1e3, 1))

    # 4. + bound-check conds (the real fused step)
    step = make_demons_step(si, sx, sd, sf, kw, diffeomorphic=False,
                            warp_halo=halo, use_pallas=True)

    @jax.jit
    def lvl4(u):
        def cond(c):
            _, _, it, conv, _ = c
            return (it < niter) & ~conv
        def body(c):
            u_est, prev, it, conv, errs = c
            u_new = step(u_est, iref, imov)
            err = _rel_step_error(u_new, prev)
            errs = errs.at[it].set(err)
            conv = (err < 0.001) & (it > 1)
            return (u_new, u_new, it + 1, conv, errs)
        out = lax.while_loop(
            cond, body,
            (u, u, jnp.int32(0), jnp.bool_(False), jnp.zeros((niter,))))
        return jnp.sum(out[0]) + out[2]

    emit(probe="while_gate_conds", ms=round(timeit(lvl4, u0) * 1e3, 1))

    # 5. the actual driver, single level
    from opticalflow2d_tpu import register, RegConfig, Method

    cfg = RegConfig(method=Method.THIRIONS_DEMONS, niter=(niter,), nscales=0,
                    warp_halo=2, warp_halo_outer=4, use_pallas=True,
                    convergence_tol=0.0)

    def run5():
        res = register(iref, imov, cfg)
        return jnp.sum(res.motion)

    emit(probe="register_nscales0", ms=round(timeit(run5) * 1e3, 1))
    emit(done="r2c")


if __name__ == "__main__":
    main()
