"""Round-8: 16384^2 probe G — can ``lax.optimization_barrier`` keep the
level driver in ONE program? (Probe F: while_loop(step) compiles when
derivatives arrive as args; probe E: computing them in-program ahead of
the loop HTTP-500s the helper. If a barrier between the two fixes the
compile, the engine needs one line, not a phase-split driver.)

  g1. derivatives -> barrier -> while_loop(25 steps)          [prog_a + barrier]
  g2. warp -> derivatives -> barrier -> while_loop -> compose [full level shape]
  g3. g2 without the barrier (control; expected HTTP 500)
Then probe D's blocked-kernel cells (k, tb) at 16384 lanes.

Run (real TPU, background): python benchmarks/r8_16384_g.py
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
    from opticalflow2d_tpu.solvers.base import Derivatives, derivatives
    from opticalflow2d_tpu.solvers.diffusion import diffusion_step

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_g", **row}
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

    def loop(d, u0, n_it=25):
        def body(c):
            return (diffusion_step(c[0], d, 0.5), c[1] + 1)

        u, _ = jax.lax.while_loop(lambda c: c[1] < n_it, body,
                                  (u0, jnp.int32(0)))
        return u

    @jax.jit
    def g1(r, m):
        d = derivatives(r, m)
        gi, it_img = jax.lax.optimization_barrier((d.grad_i, d.it))
        u = loop(Derivatives(gi, it_img), jnp.zeros((2, N, N), jnp.float32))
        return jnp.sum(u)

    attempt("g1_barrier_derivs_loop", g1, iref, imov)

    @jax.jit
    def g2(r, m, u_in):
        iaux = warp2d(m, u_in, 4, True)
        d = derivatives(r, iaux)
        gi, it_img = jax.lax.optimization_barrier((d.grad_i, d.it))
        u_est = loop(Derivatives(gi, it_img),
                     jnp.zeros((2, N, N), jnp.float32))
        return jnp.sum(compose(u_in, u_est, 4, True))

    u_in = jnp.zeros((2, N, N), jnp.float32)
    ok2 = attempt("g2_full_level_barrier", g2, iref, imov, u_in)

    if ok2:
        @jax.jit
        def g3(r, m, u_in):
            iaux = warp2d(m, u_in, 4, True)
            d = derivatives(r, iaux)
            u_est = loop(d, jnp.zeros((2, N, N), jnp.float32))
            return jnp.sum(compose(u_in, u_est, 4, True))

        attempt("g3_full_level_nobarrier_control", g3, iref, imov, u_in)
    del u_in

    # --- probe D cells: blocked diffusion kernel at 16384 lanes -------------
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs,
    )
    from opticalflow2d_tpu.utils.profiling import kernel_timer

    d = jax.jit(derivatives)(iref, imov)
    g = stack_derivs(d.grad_i, d.it)
    u0 = jnp.zeros((2, N, N), jnp.float32)
    float(jnp.sum(g))
    del d

    for k, tbs in ((16, (16, 32)), (8, (8, 16))):
        for tb in tbs:
            try:
                def step(st, k=k, tb=tb):
                    u, acc = st
                    out, sums = diffusion_block_pallas(
                        u, g, 0.5, k=k, tb=tb, with_errors=True)
                    return (out, acc + jnp.sum(sums))

                s = kernel_timer(step, (u0, jnp.float32(0)),
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
