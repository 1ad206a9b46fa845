"""Round-8: 16384^2 probe I — is the Logger arithmetic the second
compile killer? (Probe H: the real driver still HTTP-500s with the
derivative fence; probe G's fenced loop WITHOUT logger compiles. Probe
E's b_plus_logger — unfenced derivs + logger loop — crashed, leaving
logger-vs-derivs confounded. All cells here take derivatives as ARGS so
the derivative fusion is out of the picture.)

  i1. loop + full variational Logger body (norm sqrt-reductions, errs
      array scatter, prev carry, convergence flag)
  i2. i1 minus the errs-array scatter (scalar err carry only)
  i3. i1 with sum-of-squares norms (no per-pixel sqrt)
  i4. i1 minus reductions (constant err) — control, expected ok

Run (real TPU, background): python benchmarks/r8_16384_i.py
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
    from opticalflow2d_tpu.ops.reduce import motion_norm
    from opticalflow2d_tpu.solvers.base import Derivatives, derivatives
    from opticalflow2d_tpu.solvers.diffusion import diffusion_step

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_i", **row}
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

    d = jax.jit(derivatives)(blow_up(seed_r), blow_up(seed_m))
    float(jnp.sum(d.it))

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

    u0 = jnp.zeros((2, N, N), jnp.float32)

    def make(err_mode, with_errs_array):
        @jax.jit
        def prog(u0, gi, it_img):
            dd = Derivatives(gi, it_img)
            errs0 = jnp.zeros((25,), jnp.float32)

            def body(carry):
                u_est, prev, it, conv, errs = carry
                u_new = diffusion_step(u_est, dd, 0.5)
                if err_mode == "norm":
                    pn = motion_norm(prev)
                    dn = motion_norm(u_new - prev)
                    err = jnp.where(pn == 0, 0.0,
                                    dn / jnp.where(pn == 0, 1.0, pn))
                elif err_mode == "sumsq":
                    pn = jnp.sum(prev ** 2)
                    dn = jnp.sum((u_new - prev) ** 2)
                    err = jnp.where(pn == 0, 0.0,
                                    dn / jnp.where(pn == 0, 1.0, pn))
                else:
                    err = jnp.float32(1.0)
                if with_errs_array:
                    errs = errs.at[it].set(err)
                conv = (err < 1e-3) & (it > 1)
                return (u_new, u_new, it + 1, conv, errs)

            u, _, it, _, errs = jax.lax.while_loop(
                lambda c: (c[2] < 25) & ~c[3], body,
                (u0, u0, jnp.int32(0), jnp.bool_(False), errs0))
            return jnp.sum(u) + jnp.sum(errs) + it

        return prog

    attempt("i1_logger_full", make("norm", True), u0, d.grad_i, d.it)
    attempt("i2_no_errs_array", make("norm", False), u0, d.grad_i, d.it)
    attempt("i3_sumsq_norms", make("sumsq", True), u0, d.grad_i, d.it)
    attempt("i4_const_err_control", make("none", True), u0, d.grad_i, d.it)
    fh.close()


if __name__ == "__main__":
    main()
