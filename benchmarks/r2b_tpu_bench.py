"""Round-2 follow-up TPU bench: corrected harnesses + tuning sweeps.

- Navier-Lame solves timed on state-dependent input (r2 harness let XLA
  hoist the loop-invariant solve).
- Kernel A/B row-tile sweeps (the default VMEM heuristic picks tb=8 for
  the 2-channel kernel B -> 3x wasted halo compute).
- Clean fused Thirion step on a bounded state (the r2 slope harness let u
  drift past the displacement bound into the exact-gather fallback).
- Fused-vs-jnp e2e with a strictly bounded deformation and at halo=4, to
  attribute the r2 e2e gap (fallback vs overhead).
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

OUT = os.path.join(os.path.dirname(__file__), "r2_results.jsonl")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def slope_time(fn, state, lo=20, hi=100, reps=2):
    from jax import lax

    @jax.jit
    def run(n, s):
        s = lax.fori_loop(0, n, lambda _, s: fn(s), s)
        return jnp.sum(s[0] if isinstance(s, tuple) else s)

    float(run(lo, state)); float(run(hi, state))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(lo, state)); t1 = time.perf_counter()
        t2 = time.perf_counter(); float(run(hi, state)); t3 = time.perf_counter()
        sec = ((t3 - t2) - (t1 - t0)) / (hi - lo)
        best = sec if best is None else min(best, sec)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    t_session = time.time()
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
    imov = jnp.asarray(img(2.5, -1.5))
    imov_small = jnp.asarray(img(1.2, -0.8))
    u0 = jnp.asarray(np.tanh(rng.standard_normal((2, nx, ny)).astype(np.float32)) * 1.5)

    # ---- Navier-Lame solves, state-dependent -----------------------------
    from opticalflow2d_tpu.solvers.navier_lame import (
        make_dirichlet_navier_lame_solver, make_spectral_navier_lame_solver)

    solve_d = make_dirichlet_navier_lame_solver(nx, ny, 0.25, 0.0)
    sec = slope_time(lambda v: solve_d(v), u0, lo=3, hi=10)
    emit(bench="navier_lame_dirichlet_solve_v2", us=round(sec*1e6, 1))
    solve_p = make_spectral_navier_lame_solver(nx, ny, 0.25, 0.0)
    sec = slope_time(lambda v: solve_p(v), u0, lo=5, hi=20)
    emit(bench="navier_lame_periodic_solve_v2", us=round(sec*1e6, 1))

    # ---- kernel tile sweeps ----------------------------------------------
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas, compose_smooth_pallas)
    from opticalflow2d_tpu.ops.warp import warp2d
    from opticalflow2d_tpu.ops.conv import gaussian_smooth
    from opticalflow2d_tpu.solvers.base import derivatives, demons_force

    si, sx, sf, sd, kw, halo = 1.0, 0.25, 2.0, 2.0, 5, 2
    c_ref = gaussian_smooth(
        demons_force(derivatives(iref, warp2d(imov, u0)), si, sx), sf, kw)

    for tb in (16, 32, 64):
        try:
            sec = slope_time(
                lambda u: demons_correspondence_pallas(
                    imov, iref, u, si, sx, sf, kw, halo, tb=tb), u0)
            emit(bench=f"demons_corr_fused_A_tb{tb}", us=round(sec*1e6, 1))
        except Exception as e:  # noqa: BLE001
            emit(bench=f"demons_corr_fused_A_tb{tb}", error=str(e)[:200])
    for tb in (16, 24, 32):
        try:
            got = compose_smooth_pallas(u0, c_ref, sd, kw, halo, tb=tb)
            md = float(jnp.max(jnp.abs(
                got - gaussian_smooth(
                    __import__("opticalflow2d_tpu.ops.warp", fromlist=["compose"]).compose(u0, c_ref, 0), sd, kw))))
            sec = slope_time(
                lambda u: compose_smooth_pallas(u, c_ref, sd, kw, halo, tb=tb),
                u0)
            emit(bench=f"compose_smooth_fused_B_tb{tb}", us=round(sec*1e6, 1),
                 maxdiff=md)
        except Exception as e:  # noqa: BLE001
            emit(bench=f"compose_smooth_fused_B_tb{tb}", error=str(e)[:200])

    # ---- clean fused Thirion step (bounded state) ------------------------
    from opticalflow2d_tpu.solvers.demons import make_demons_step

    base = dict(sigma_i=si, sigma_x=sx, sigma_diffusion=sd, sigma_fluid=sf,
                kernelwidth=kw, diffeomorphic=False, warp_halo=halo)
    step_fused = make_demons_step(use_pallas=True, **base)
    step_jnp = make_demons_step(use_pallas=False, **base)

    def bounded(fn):
        return lambda v: fn(jnp.tanh(v) * 1.5, iref, imov)

    sec = slope_time(bounded(step_fused), u0, lo=20, hi=100)
    emit(bench="thirion_step_fused_bounded", us=round(sec*1e6, 1),
         gpix_s=round(nx*ny/sec/1e9, 2))
    sec = slope_time(bounded(step_jnp), u0, lo=5, hi=25)
    emit(bench="thirion_step_jnp_bounded", us=round(sec*1e6, 1),
         gpix_s=round(nx*ny/sec/1e9, 2))

    # no-cond direct chain (isolates lax.cond / bound-check overhead)
    def direct(v):
        u = jnp.tanh(v) * 1.5
        c = demons_correspondence_pallas(imov, iref, u, si, sx, sf, kw, halo)
        return compose_smooth_pallas(u, c, sd, kw, halo)

    sec = slope_time(direct, u0, lo=20, hi=100)
    emit(bench="thirion_step_fused_nocond", us=round(sec*1e6, 1),
         gpix_s=round(nx*ny/sec/1e9, 2))

    # ---- e2e attribution --------------------------------------------------
    from opticalflow2d_tpu import register, RegConfig, Method

    def e2e(name, mov, **over):
        cfg = RegConfig(method=Method.THIRIONS_DEMONS, niter=(25, 25),
                        nscales=1, warp_halo_outer=4, **over)
        t0 = time.time()
        res = register(iref, mov, cfg); res.motion.block_until_ready()
        compile_s = time.time() - t0
        t0 = time.time(); n = 3
        for _ in range(n):
            res = register(iref, mov, cfg); float(jnp.sum(res.motion))
        emit(bench=name, ms_per_reg=round((time.time()-t0)/n*1e3, 1),
             iters=[int(t.iterations) for t in res.traces],
             compile_s=round(compile_s, 1))

    e2e("thirion_e2e_fused_shift1", imov_small, warp_halo=2, use_pallas=True)
    e2e("thirion_e2e_jnp_shift1", imov_small, warp_halo=2)
    e2e("thirion_e2e_fused_halo4", imov, warp_halo=4, use_pallas=True)
    e2e("thirion_e2e_jnp_halo4", imov, warp_halo=4)

    emit(done="r2b", total_s=round(time.time() - t_session, 1))


if __name__ == "__main__":
    main()
