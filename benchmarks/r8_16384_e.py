"""Round-8: 16384^2 probe E — incremental isolation of the driver-program
compile crash (probe C: per-level e2e still HTTP-500s with zero exact
gathers in-program). Stack the level driver's ingredients one at a time,
each as its own jit, all in one process:

  a. derivatives + while_loop(25x jnp diffusion step), no warps/logger
  b. a + Logger error arithmetic in the carry
  c. b + Pallas warp before the loop + Pallas compose after (the full
     _solve_level_variational shape, minus the register() wrapper)
  d. register() nscales=0 (adds API plumbing/trace packaging)
  e. register() coarse level only (adds 16384->8192 box-matmul
     downsample + 8192 level + motion upsample)

Run (real TPU, background): python benchmarks/r8_16384_e.py
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
    from opticalflow2d_tpu.ops.warp import warp2d, compose
    from opticalflow2d_tpu.solvers.base import derivatives
    from opticalflow2d_tpu.solvers.diffusion import diffusion_step

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_e", **row}
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

    def attempt(name, fn, *args):
        try:
            t0 = time.perf_counter()
            float(fn(*args))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(fn(*args))
            emit({"step": name, "ok": True, "compile_s": round(comp, 1),
                  "run_s": round(time.perf_counter() - t0, 3)})
            return True
        except Exception as e:
            emit({"step": name, "error": type(e).__name__,
                  "msg": str(e)[:160]})
            return False

    # a. derivatives + plain while_loop of 25 steps
    @jax.jit
    def prog_a(r, m):
        d = derivatives(r, m)
        u0 = jnp.zeros((2, N, N), jnp.float32)

        def body(carry):
            u, it = carry
            return (diffusion_step(u, d, 0.5), it + 1)

        u, _ = jax.lax.while_loop(lambda c: c[1] < 25, body,
                                  (u0, jnp.int32(0)))
        return jnp.sum(u)

    ok_a = attempt("a_derivs_whileloop", prog_a, iref, imov)

    # b. + Logger error arithmetic (abs-diff sums + convergence carry)
    @jax.jit
    def prog_b(r, m):
        d = derivatives(r, m)
        u0 = jnp.zeros((2, N, N), jnp.float32)
        errs0 = jnp.zeros((25,), jnp.float32)

        def body(carry):
            u, it, conv, errs = carry
            u_new = diffusion_step(u, d, 0.5)
            dn = jnp.sum(jnp.sqrt(jnp.sum((u_new - u) ** 2, axis=0)))
            pn = jnp.sum(jnp.sqrt(jnp.sum(u ** 2, axis=0)))
            err = jnp.where(pn == 0, 0.0, dn / jnp.where(pn == 0, 1.0, pn))
            errs = errs.at[it].set(err)
            conv = (err < 1e-3) & (it > 1)
            return (u_new, it + 1, conv, errs)

        u, it, _, errs = jax.lax.while_loop(
            lambda c: (c[1] < 25) & ~c[2], body,
            (u0, jnp.int32(0), jnp.bool_(False), errs0))
        return jnp.sum(u) + jnp.sum(errs)

    ok_b = attempt("b_plus_logger", prog_b, iref, imov)

    # c. + Pallas warp before, Pallas compose after
    @jax.jit
    def prog_c(r, m, u_in):
        iaux = warp2d(m, u_in, 4, True)
        d = derivatives(r, iaux)
        u0 = jnp.zeros((2, N, N), jnp.float32)

        def body(carry):
            u, it = carry
            return (diffusion_step(u, d, 0.5), it + 1)

        u_est, _ = jax.lax.while_loop(lambda c: c[1] < 25, body,
                                      (u0, jnp.int32(0)))
        return jnp.sum(compose(u_in, u_est, 4, True))

    u_in = jnp.zeros((2, N, N), jnp.float32)
    ok_c = attempt("c_plus_warp_compose", prog_c, iref, imov, u_in)

    # d. register() nscales=0
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register

    cfg0 = RegConfig(method=Method.DIFFUSION, alpha=0.5, niter=(25,),
                     nscales=0, warp_halo_auto=False, warp_halo_outer=4)

    def prog_d(r, m):
        return jnp.sum(register(r, m, cfg0).motion)

    attempt("d_register_nscales0", prog_d, iref, imov)

    # e. register() coarse level only (16384 -> 8192 resample in-program)
    cfg1 = RegConfig(method=Method.DIFFUSION, alpha=0.5, niter=(25, 25),
                     nscales=1, warp_halo_auto=False, warp_halo_outer=4)

    def prog_e(r, m):
        return jnp.sum(register(r, m, cfg1, start_scale=1,
                                stop_scale=1).motion)

    attempt("e_register_coarse_level", prog_e, iref, imov)
    fh.close()


if __name__ == "__main__":
    main()
