"""Final round-2 TPU validation batch: warp_fused retuned tiles
(correctness + timing), Dirichlet CG at HIGH precision, fused SP demons
step on-chip. Appends to benchmarks/r2_results.jsonl.
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


def slope_time(fn, state, lo=20, hi=100, reps=2):
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
    rng = np.random.default_rng(0)
    nx = ny = 1024
    img = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    u = jnp.asarray(np.tanh(rng.standard_normal((2, nx, ny)).astype(np.float32)) * 1.8)
    u_inc = u * 0.4

    from opticalflow2d_tpu.ops.warp import warp2d, compose
    from opticalflow2d_tpu.pallas_kernels.warp_fused import (
        warp2d_pallas, compose_pallas)

    # correctness at the new default tiles
    for halo in (2, 4):
        w = warp2d_pallas(img, u, halo=halo)
        md = float(jnp.max(jnp.abs(w - warp2d(img, u))))
        sec = slope_time(lambda s: warp2d_pallas(img, s * 1.0, halo=halo)
                         * 1.0 + s * 0.0, u) if False else None
        emit(check=f"warp_pallas_retuned_h{halo}", maxdiff=md)
        assert md < 1e-6, md
        c = compose_pallas(u, u_inc, halo=halo)
        md = float(jnp.max(jnp.abs(c - compose(u, u_inc))))
        emit(check=f"compose_pallas_retuned_h{halo}", maxdiff=md)
        assert md < 1e-6, md

    # timing (state-dependent)
    for halo in (2, 4):
        sec = slope_time(lambda s: compose_pallas(jnp.tanh(s) * 1.8, u_inc,
                                                  halo=halo), u)
        emit(bench=f"compose_pallas_retuned_h{halo}",
             us=round(sec * 1e6, 1))
        sec = slope_time(
            lambda s: jnp.broadcast_to(
                warp2d_pallas(img, jnp.tanh(s) * 1.8, halo=halo), (2, nx, ny)
            ), u)
        emit(bench=f"warp_pallas_retuned_h{halo}", us=round(sec * 1e6, 1))

    # Dirichlet CG at HIGH precision: accuracy + speed
    from opticalflow2d_tpu.solvers.navier_lame import (
        make_dirichlet_navier_lame_solver, apply_navier_lame_operator)

    v_true = jnp.zeros((2, nx, ny)).at[:, 1:-1, 1:-1].set(
        jnp.asarray(rng.standard_normal((2, nx - 2, ny - 2)).astype(np.float32)))
    f = apply_navier_lame_operator(v_true, 0.25, 0.0, True)
    for name, prec in [("highest", lax.Precision.HIGHEST),
                       ("high", lax.Precision.HIGH)]:
        solve = make_dirichlet_navier_lame_solver(nx, ny, 0.25, 0.0,
                                                  precision=prec)
        v = solve(f)
        relerr = float(jnp.max(jnp.abs(v - v_true)) / jnp.max(jnp.abs(v_true)))
        sec = slope_time(lambda s: solve(s), v_true, lo=3, hi=10)
        emit(bench=f"dirichlet_cg_{name}", us=round(sec * 1e6, 1),
             relerr=relerr)

    # fused SP demons step on a 1-device mesh vs the serial fused step
    from opticalflow2d_tpu.parallel.mesh import make_mesh
    from opticalflow2d_tpu.parallel.spatial import make_demons_step_sharded
    from opticalflow2d_tpu.solvers.demons import make_demons_step

    mesh = make_mesh(data=1, x=1)
    kw = dict(sigma_i=1.0, sigma_x=0.25, sigma_diffusion=2.0,
              sigma_fluid=2.0, kernelwidth=5)
    sp = make_demons_step_sharded(mesh, halo=2, use_pallas=True, **kw)
    serial = make_demons_step(diffeomorphic=False, warp_halo=2,
                              use_pallas=True, **kw)
    iref2 = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    a = sp(u, iref2, img)
    b = serial(u, iref2, img)
    md = float(jnp.max(jnp.abs(a - b)))
    emit(check="sp_fused_demons_step_onchip", maxdiff=md)
    sec = slope_time(lambda s: sp(jnp.tanh(s) * 1.5, iref2, img), u)
    emit(bench="sp_fused_demons_step", us=round(sec * 1e6, 1))

    emit(done="r2e")


if __name__ == "__main__":
    main()
