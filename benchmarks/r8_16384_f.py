"""Round-8: 16384^2 probe F — what exactly kills the remote compile at
16384? (Probe E: derivatives + while_loop(diffusion step) HTTP-500s
while derivatives + ONE step compiles.)

  w1. while_loop(25x, trivial body u*0.99+1) on [2, 16384, 16384]
  w2. while_loop(25x, diffusion step) with derivatives passed as ARGS
      (no in-program derivative computation)
  w3. three UNROLLED diffusion steps (no while_loop), derivatives as args
  w4. memory stats readback after the standing allocations

Run (real TPU, background): python benchmarks/r8_16384_f.py
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
    from opticalflow2d_tpu.solvers.base import Derivatives, derivatives
    from opticalflow2d_tpu.solvers.diffusion import diffusion_step

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_f", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(16)
    seed_r = jnp.asarray(rng.random((N // 64, N // 64), dtype=np.float32))
    seed_m = jnp.asarray(rng.random((N // 64, N // 64), dtype=np.float32))

    @jax.jit
    def blow_up(s):
        x = s
        for _ in range(6):
            nx, ny = x.shape
            x = upsample_image(x, (2 * nx, 2 * ny))
        return x

    iref = blow_up(seed_r)
    imov = blow_up(seed_m)
    d = jax.jit(derivatives)(iref, imov)
    float(jnp.sum(d.it))
    del imov

    def attempt(name, fn, *args):
        try:
            t0 = time.perf_counter()
            float(fn(*args))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(fn(*args))
            emit({"step": name, "ok": True, "compile_s": round(comp, 1),
                  "run_s": round(time.perf_counter() - t0, 3)})
        except Exception as e:
            emit({"step": name, "error": type(e).__name__,
                  "msg": str(e)[:160]})

    @jax.jit
    def w1(u0):
        def body(c):
            return (c[0] * 0.99 + 1.0, c[1] + 1)

        u, _ = jax.lax.while_loop(lambda c: c[1] < 25, body,
                                  (u0, jnp.int32(0)))
        return jnp.sum(u)

    u0 = jnp.zeros((2, N, N), jnp.float32)
    attempt("w1_whileloop_trivial", w1, u0)

    @jax.jit
    def w2(u0, gi, it_img):
        dd = Derivatives(gi, it_img)

        def body(c):
            return (diffusion_step(c[0], dd, 0.5), c[1] + 1)

        u, _ = jax.lax.while_loop(lambda c: c[1] < 25, body,
                                  (u0, jnp.int32(0)))
        return jnp.sum(u)

    attempt("w2_whileloop_step_args", w2, u0, d.grad_i, d.it)

    @jax.jit
    def w3(u0, gi, it_img):
        dd = Derivatives(gi, it_img)
        u = u0
        for _ in range(3):
            u = diffusion_step(u, dd, 0.5)
        return jnp.sum(u)

    attempt("w3_unrolled3_args", w3, u0, d.grad_i, d.it)

    try:
        stats = jax.local_devices()[0].memory_stats()
        emit({"step": "w4_memstats",
              "bytes_in_use_gb": round(stats.get("bytes_in_use", 0) / 2**30, 2),
              "peak_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 2),
              "limit_gb": round(stats.get("bytes_limit", 0) / 2**30, 2)})
    except Exception as e:
        emit({"step": "w4_memstats", "error": type(e).__name__,
              "msg": str(e)[:160]})
    fh.close()


if __name__ == "__main__":
    main()
