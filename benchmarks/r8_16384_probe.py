"""Round-8: 16384^2 capability probe (one chip).

The reference caps at single-node memory; its largest demonstrated grid
is the 512-class demo. Rounds 3-4 unlocked 8192^2 end to end; this probe
walks the component stack at 16384^2 (1 GB per f32 plane) to find which
pieces compile/run on one chip and which hit the next wall, each in its
own try/except so one failure doesn't mask the rest:

  1. derivatives + one jnp diffusion step (pure stencils)
  2. blocked-diffusion Pallas tier feasibility + timing if available
  3. MXU box downsample 16384 -> 8192 and bilinear upsample back
  4. exact-gather warp (the >4096-lane driver-warp path)
  5. a small end-to-end diffusion registration (nscales=1, tiny niter)

Known traps designed around: no closure constants (everything threaded
as args), no jnp roll chains past 4096 lanes (ops.warp guard), matrices
iota-built on device.

Run (real TPU, background): python benchmarks/r8_16384_probe.py
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
    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    # Band-limited pair, generated on device from a small host seed grid
    # (a 1 GB host->device transfer through the tunnel would dominate;
    # kron/upsample on device instead).
    from opticalflow2d_tpu.ops.resample import upsample_image

    rng = np.random.default_rng(16)
    seed_r = jnp.asarray(rng.random((N // 64, N // 64), dtype=np.float32))
    seed_m = jnp.asarray(rng.random((N // 64, N // 64), dtype=np.float32))

    @jax.jit
    def blow_up(s):
        x = s
        for _ in range(6):  # 256 -> 16384 in six 2x bilinear upsamples
            nx, ny = x.shape
            x = upsample_image(x, (2 * nx, 2 * ny))
        return x

    try:
        iref = blow_up(seed_r)
        imov = blow_up(seed_m)
        float(jnp.sum(iref))
        emit({"step": "make_pair", "ok": True})
    except Exception as e:
        emit({"step": "make_pair", "error": type(e).__name__,
              "msg": str(e)[:200]})
        fh.close()
        return

    from opticalflow2d_tpu.solvers.base import Derivatives, derivatives
    from opticalflow2d_tpu.solvers.diffusion import diffusion_step

    # 1. derivatives + one jnp diffusion step
    try:
        @jax.jit
        def one_step(r, m):
            d = derivatives(r, m)
            u = jnp.zeros((2, N, N), jnp.float32)
            return jnp.sum(diffusion_step(u, d, 0.5))

        t0 = time.perf_counter()
        float(one_step(iref, imov))
        emit({"step": "jnp_diffusion_step", "ok": True,
              "compile_and_run_s": round(time.perf_counter() - t0, 1)})
    except Exception as e:
        emit({"step": "jnp_diffusion_step", "error": type(e).__name__,
              "msg": str(e)[:200]})

    # 2. blocked-diffusion Pallas tier
    try:
        from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
            _pick_tiles, diffusion_block_pallas, stack_derivs,
        )

        tiles = _pick_tiles(N, 16, None, N)
        emit({"step": "blocked_tier_lookup", "tiles": repr(tiles)})
        if tiles is not None:
            d = jax.jit(derivatives)(iref, imov)
            g = stack_derivs(d.grad_i, d.it)

            @jax.jit
            def blk(u, g):
                out, sums = diffusion_block_pallas(u, g, 0.5, k=16,
                                                   with_errors=True)
                return jnp.sum(out) + jnp.sum(sums)

            u0 = jnp.zeros((2, N, N), jnp.float32)
            t0 = time.perf_counter()
            float(blk(u0, g))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(blk(u0, g))
            emit({"step": "blocked_diffusion_k16", "ok": True,
                  "compile_s": round(comp, 1),
                  "run_s": round(time.perf_counter() - t0, 3)})
            del d, g, u0
    except Exception as e:
        emit({"step": "blocked_diffusion_k16", "error": type(e).__name__,
              "msg": str(e)[:200]})

    # 3. box downsample / bilinear upsample round trip
    try:
        from opticalflow2d_tpu.ops.resample import downsample_image

        @jax.jit
        def rt(r):
            lo = downsample_image(r, (N // 2, N // 2))
            return jnp.sum(upsample_image(lo, (N, N)))

        t0 = time.perf_counter()
        float(rt(iref))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(rt(iref))
        emit({"step": "resample_roundtrip", "ok": True,
              "compile_s": round(comp, 1),
              "run_s": round(time.perf_counter() - t0, 3)})
    except Exception as e:
        emit({"step": "resample_roundtrip", "error": type(e).__name__,
              "msg": str(e)[:200]})

    # 4. warp at 16384 (exact-gather driver path; Pallas tier if present)
    def _iota_motion():
        r = jnp.sin(
            jax.lax.broadcasted_iota(jnp.float32, (N, N), 0) * 0.001
        )
        return jnp.stack([r * 2.0, -r * 1.5])

    for use_pallas in (False, True):
        try:
            from opticalflow2d_tpu.ops.warp import warp2d

            @jax.jit
            def w(m, up=use_pallas):
                return jnp.sum(warp2d(m, _iota_motion(), 4, up))

            t0 = time.perf_counter()
            float(w(imov))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(w(imov))
            emit({"step": f"warp_halo4_pallas{int(use_pallas)}", "ok": True,
                  "compile_s": round(comp, 1),
                  "run_s": round(time.perf_counter() - t0, 3)})
        except Exception as e:
            emit({"step": f"warp_halo4_pallas{int(use_pallas)}",
                  "error": type(e).__name__, "msg": str(e)[:200]})

    # 5. small end-to-end diffusion registration
    try:
        from opticalflow2d_tpu.config import Method, RegConfig
        from opticalflow2d_tpu.engine.registration import register

        cfg = RegConfig(method=Method.DIFFUSION, alpha=0.5, niter=(4, 4),
                        nscales=1, warp_halo_auto=False, warp_halo_outer=4)
        t0 = time.perf_counter()
        res = register(iref, imov, cfg)
        float(jnp.sum(res.motion))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = register(iref, imov, cfg)
        float(jnp.sum(res.motion))
        emit({"step": "e2e_diffusion_2level", "ok": True,
              "compile_s": round(comp, 1),
              "run_s": round(time.perf_counter() - t0, 3)})
    except Exception as e:
        emit({"step": "e2e_diffusion_2level", "error": type(e).__name__,
              "msg": str(e)[:200]})

    fh.close()


if __name__ == "__main__":
    main()
