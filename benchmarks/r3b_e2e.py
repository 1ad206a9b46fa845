"""Round-3 on-chip validation + e2e: blocked-driver registration (serial
and SP) and the strip-local blocked kernels' Mosaic lowering (manual DMA +
scalar prefetch — interpret mode cannot catch alignment issues).
One jitted scalar-returning call per e2e measurement (r2d pattern).
Appends to benchmarks/r3_results.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(__file__), "r3_results.jsonl")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def timeit(fn, *args, reps=5):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        best = min(best, (float(fn(*args)), time.perf_counter() - t0)[1])
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
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

    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import _register_impl

    # --- strip kernels Mosaic lowering: whole image as one strip ---
    from opticalflow2d_tpu.pallas_kernels import diffusion_block as db
    from opticalflow2d_tpu.pallas_kernels import elastic_block as eb
    from opticalflow2d_tpu.solvers.base import derivatives

    d = derivatives(iref, imov)
    g = db.stack_derivs(d.grad_i, d.it)
    rng = np.random.default_rng(7)
    u0 = jnp.asarray(rng.standard_normal((2, nx, ny)).astype(np.float32))
    uz = u0.at[:, 0, :].set(0).at[:, -1, :].set(0)
    uz = uz.at[:, :, 0].set(0).at[:, :, -1].set(0)

    @jax.jit
    def val_strips(u, uzz):
        pad = db.required_pad(8)
        up = jnp.pad(u, ((0, 0), (pad, pad), (0, 0)))
        gp = jnp.pad(g, ((0, 0), (pad, pad), (0, 0)))
        got, s1 = db.diffusion_block_strip(up, gp, 0, nx, 0.5, k=8, tb=128)
        want, s2 = db.diffusion_block_pallas(u, g, 0.5, k=8, tb=128)
        md_d = jnp.max(jnp.abs(got - want))
        ms_d = jnp.max(jnp.abs(s1 - s2))
        pad_e = eb.required_pad(4)
        upe = jnp.pad(uzz, ((0, 0), (pad_e, pad_e), (0, 0)))
        gpe = jnp.pad(g, ((0, 0), (pad_e, pad_e), (0, 0)))
        got_e, t1 = eb.elastic_block_strip(
            upe, gpe, 0, nx, 0.25, 0.1, 1.5, True, k=4, tb=64)
        want_e, t2 = eb.elastic_block_pallas(
            uzz, g, 0.25, 0.1, 1.5, True, k=4, tb=64)
        return (md_d, ms_d, jnp.max(jnp.abs(got_e - want_e)),
                jnp.max(jnp.abs(t1 - t2)))

    md_d, ms_d, md_e, ms_e = [float(x) for x in val_strips(u0, uz)]
    emit(kind="validate_strip", diffusion_maxdiff=md_d, diffusion_sums=ms_d,
         elastic_maxdiff=md_e, elastic_sums=ms_e)

    # --- e2e: serial driver, blocked vs not ---
    def e2e(name, **over):
        cfg = RegConfig(niter=(25, 25), nscales=1, warp_halo_outer=4, **over)
        f = jax.jit(lambda r, m: jnp.sum(_register_impl(r, m, cfg).motion))
        sec = timeit(f, iref, imov)
        emit(bench=name, ms_per_reg=round(sec * 1e3, 1))

    e2e("r3_e2e_diffusion_jnp", method=Method.DIFFUSION, alpha=0.5,
        warp_halo=2)
    e2e("r3_e2e_diffusion_pallas_k1", method=Method.DIFFUSION, alpha=0.5,
        warp_halo=2, use_pallas=True, pallas_block_k=1)
    e2e("r3_e2e_diffusion_blocked_k8", method=Method.DIFFUSION, alpha=0.5,
        warp_halo=2, use_pallas=True, pallas_block_k=8)
    e2e("r3_e2e_diffusion_blocked_k16", method=Method.DIFFUSION, alpha=0.5,
        warp_halo=2, use_pallas=True, pallas_block_k=16)
    e2e("r3_e2e_elastic_sor", method=Method.ELASTIC, mu=0.5, warp_halo=2,
        use_pallas=True, pallas_block_k=1)
    e2e("r3_e2e_elastic_blocked_k4", method=Method.ELASTIC, mu=0.5,
        warp_halo=2, use_pallas=True, pallas_block_k=4,
        pallas_block_elastic=True)

    # Deep-iteration configs: at niter=25 the solve is ~1 ms of the e2e;
    # the blocked kernel can only show at production iteration counts.
    def e2e_n(name, niter, **over):
        cfg = RegConfig(niter=niter, nscales=1, warp_halo_outer=4, **over)
        f = jax.jit(lambda r, m: jnp.sum(_register_impl(r, m, cfg).motion))
        sec = timeit(f, iref, imov)
        emit(bench=name, ms_per_reg=round(sec * 1e3, 1))

    e2e_n("r3_e2e_diffusion_jnp_n400", (400, 25), method=Method.DIFFUSION,
          alpha=0.5, warp_halo=2)
    e2e_n("r3_e2e_diffusion_blocked_k16_n400", (400, 25),
          method=Method.DIFFUSION, alpha=0.5, warp_halo=2, use_pallas=True,
          pallas_block_k=16)

    # --- component bisection: where do the ~50 ms/level go? ---
    from opticalflow2d_tpu.ops.warp import warp2d, compose
    from opticalflow2d_tpu.ops.resample import (
        downsample_image, upsample_motion, downsample_motion,
    )
    from jax import lax as _lax

    def op_time(name, fn, state, reps=100):
        @jax.jit
        def run(s):
            return jnp.sum(_lax.fori_loop(0, reps, lambda _, x: fn(x), s))

        float(run(state))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(state))
            best = min(best, time.perf_counter() - t0)
        emit(bench=name, us_per_call=round(best / reps * 1e6, 1))

    u_small = jnp.asarray(
        np.clip(rng.standard_normal((2, nx, ny)), -1.5, 1.5).astype(np.float32))
    op_time("r3_op_warp2d_h4_xla", lambda s: jnp.broadcast_to(
        warp2d(iref, s, 4, False)[None], s.shape) * 0.999 + s * 0.001,
        u_small)
    op_time("r3_op_warp2d_h4_pallas", lambda s: jnp.broadcast_to(
        warp2d(iref, s, 4, True)[None], s.shape) * 0.999 + s * 0.001,
        u_small)
    op_time("r3_op_compose_h4_xla", lambda s: compose(s, s * 0.001, 4, False),
            u_small)
    op_time("r3_op_compose_h4_pallas", lambda s: compose(s, s * 0.001, 4, True),
            u_small)
    op_time("r3_op_derivatives", lambda s: jnp.broadcast_to(
        db.stack_derivs(*derivatives(iref, s[0]))[0:2] * 0.5, s.shape),
        u_small)
    op_time("r3_op_upsample_motion", lambda s: upsample_motion(
        downsample_motion(s, (nx // 2, ny // 2)), (nx, ny)), u_small)
    op_time("r3_op_downsample_image", lambda s: s.at[
        :, :nx // 2, :ny // 2].add(
        0.001 * downsample_image(s[0], (nx // 2, ny // 2))[None]),
        u_small, reps=50)

    # --- SP drivers on a 1-device mesh (real collectives lowering) ---
    from opticalflow2d_tpu.parallel import make_mesh
    from opticalflow2d_tpu.parallel.spatial import make_register_sp

    mesh = make_mesh(data=1, x=1)
    for fam, kw, scfg in [
        ("diffusion", dict(alpha=0.5, block_k=8),
         dict(method=Method.DIFFUSION, alpha=0.5, use_pallas=True,
              pallas_block_k=8)),
        ("elastic", dict(mu=0.5, lam=0.0, block_k=4),
         dict(method=Method.ELASTIC, mu=0.5, lam=0.0, use_pallas=True,
              pallas_block_k=4, pallas_block_elastic=True)),
    ]:
        solve = make_register_sp(mesh, fam, niter=[25, 25], nscales=1,
                                 halo=4, use_pallas=True, **kw)
        t0 = time.time()
        u_sp, iters = solve(iref, imov)
        u_sp = np.asarray(u_sp)
        cfg = RegConfig(niter=(25, 25), nscales=1, warp_halo=4,
                        warp_halo_outer=4, **scfg)
        res = _register_impl(iref, imov, cfg)
        md = float(np.max(np.abs(u_sp - np.asarray(res.motion))))
        emit(kind="validate_sp_blocked", family=fam, maxdiff=md,
             iters_sp=[int(x) for x in np.asarray(iters)],
             iters_serial=[int(t.iterations) for t in res.traces],
             wall_s=round(time.time() - t0, 1))
    emit(done="r3b")


if __name__ == "__main__":
    main()
