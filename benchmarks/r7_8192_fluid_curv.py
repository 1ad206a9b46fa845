"""Round-7: close the two 8192^2 end-to-end holes (VERDICT r3 tasks 3+4).

1. FLUID 3-level @8192^2 — the r6 monolithic 3-level program crashed the
   remote compile helper (three regrid-branch sizes in one program,
   r6_results.jsonl `fluid_3level_nopallas`). Here each pyramid level is
   its own program via ``register(start_scale=s, stop_scale=s)`` — the
   checkpoint-resume split, which matches the monolithic run to ~1 ulp —
   so the compiler sees ONE regrid branch per program.
2. CURVATURE @4096^2 and @8192^2 — first e2e rows for the DCT family past
   2048. The 8192 run rides the round-4 device-generated transform
   matrices/eigenvalues (ops/dct.py: no giant compile-request constants).

Also probes: DCT roundtrip accuracy on TPU at 2048/4096/8192 (validating
the device-generated tables against the host-table path's semantics) and
a curvature per-iteration microbench at 4096/8192.

Input pair: band-limited random fields (smooth), not raw uniform noise —
pure noise drives the fluid regridder pathologically (every iteration
regrids; r6 "fluid_2level" took 40 s on noise) and measures the regrid
path, not the solver. The diffusion/elastic/demons r6 rows used raw
noise, so fluid/curvature rows here are NOT comparable to those; the
matching smooth-pair rows for all families come from r7_e2e_smooth.

Run (real TPU, single process, background): python benchmarks/r7_8192_fluid_curv.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r7_results.jsonl")


def emit(row, fh):
    print(json.dumps(row), flush=True)
    fh.write(json.dumps(row) + "\n")
    fh.flush()


def smooth_pair(n, rng, strength=3.0):
    """Band-limited random pair: common smooth background + a smooth
    deformation of it, like a real registration workload."""
    coarse = rng.random((n // 64, n // 64), dtype=np.float32)
    img = np.kron(coarse, np.ones((64, 64), np.float32))
    # cheap separable blur to kill the blockiness
    k = np.ones(33, np.float32) / 33.0
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, img)
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    ys = np.linspace(0, 4 * np.pi, n, dtype=np.float32)
    sx = strength * np.sin(ys)[None, :] * np.cos(ys)[:, None]
    ix = np.clip(np.arange(n)[:, None] + sx, 0, n - 1).astype(np.int32)
    mov = img[ix, np.arange(n)[None, :]]
    return img.astype(np.float32), mov.astype(np.float32)


def run_levels(iref, imov, cfg, register):
    """Per-level chained registration (one program per pyramid level)."""
    res = register(iref, imov, cfg, start_scale=cfg.nscales,
                   stop_scale=cfg.nscales)
    for s in range(cfg.nscales - 1, -1, -1):
        res = register(iref, imov, cfg, initial_motion=res.motion,
                       start_scale=s, stop_scale=s)
    float(jnp.sum(res.motion))
    return res


def main():
    fh = open(OUT, "a")
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register

    rng = np.random.default_rng(7)

    # --- DCT device-table validation on TPU --------------------------------
    from opticalflow2d_tpu.ops import dct as D
    import jax

    for n in (2048, 4096, 8192):
        try:
            x = jnp.asarray(rng.standard_normal((n, 256)).astype(np.float32))

            @jax.jit
            def rt(a, n=n):
                return D.idct2_fftw(D.dct2_fftw(a)) / (4.0 * n * 256)

            r = rt(x)
            rel = float(jnp.max(jnp.abs(r - x)) / jnp.max(jnp.abs(x)))
            emit({"bench": "dct_roundtrip_tpu", "n": n, "rel": rel}, fh)
        except Exception as e:
            emit({"bench": "dct_roundtrip_tpu", "n": n,
                  "error": type(e).__name__, "msg": str(e)[:160]}, fh)

    # --- curvature per-iteration micro @4096/8192 ---------------------------
    from opticalflow2d_tpu.solvers.base import Derivatives
    from opticalflow2d_tpu.solvers.curvature import make_curvature_step
    from opticalflow2d_tpu.utils.profiling import kernel_timer

    for n in (4096, 8192):
        try:
            iref_n = jnp.asarray(rng.random((n, n), dtype=np.float32))
            imov_n = jnp.asarray(rng.random((n, n), dtype=np.float32))
            from opticalflow2d_tpu.solvers.base import derivatives
            d = derivatives(iref_n, imov_n)
            u0 = jnp.zeros((2, n, n), jnp.float32)

            def stepc(st, n=n):
                # Build the step INSIDE the traced fn: constructed eagerly,
                # its eigenvalue table would be a concrete [n, n] device
                # array that the timing jit captures as a 256 MB compile-
                # request constant at 8192 (the relay 413 trap). Traced,
                # it is an in-program iota+cos (hoisted loop-invariant).
                step = make_curvature_step(n, n, 0.1, 1.0)
                v, gi, it_img = st
                return (step(v, Derivatives(gi, it_img)), gi, it_img)

            s = kernel_timer(stepc, (u0, d.grad_i, d.it), iters_lo=2,
                             iters_hi=10)
            emit({"bench": "curvature_step", "n": n, "dct_impl": "split_high",
                  "us_per_iter": round(s * 1e6, 1)}, fh)
            del iref_n, imov_n, d, u0
        except Exception as e:
            emit({"bench": "curvature_step", "n": n,
                  "error": type(e).__name__, "msg": str(e)[:160]}, fh)

    # --- e2e rows ------------------------------------------------------------
    for n in (4096, 8192):
        iref_np, imov_np = smooth_pair(n, rng)
        iref = jnp.asarray(iref_np)
        imov = jnp.asarray(imov_np)
        for method, kw in [
            (Method.CURVATURE, dict(alpha=0.1, tau=1.0)),
            (Method.FLUID, dict(mu=0.25, lam=0.0)),
        ]:
            cfg = RegConfig(method=method, niter=(25, 25, 25), nscales=2,
                            use_pallas=True, warp_halo_auto=False,
                            warp_halo_outer=5, **kw)
            try:
                t0 = time.perf_counter()
                run_levels(iref, imov, cfg, register)
                comp = time.perf_counter() - t0
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    res = run_levels(iref, imov, cfg, register)
                    best = min(best, time.perf_counter() - t0)
                from opticalflow2d_tpu.ops.warp import warp2d
                # use_pallas: at 8192 the halo-5 jnp path is an XLA roll
                # chain whose COMPILATION crashes the remote helper — the
                # r7 first-run e2e "failures" were this check, not the
                # registration (isolation probes passed every level).
                ireg = warp2d(imov, res.motion, 5, True)
                ssd0 = float(jnp.sum((iref - imov) ** 2))
                ssd1 = float(jnp.sum((iref - ireg) ** 2))
                emit({"bench": "e2e_perlevel_smooth", "method": method.name,
                      "n": n, "ms": round(best * 1e3, 1),
                      "compile_s": round(comp, 1),
                      "ssd_red": round(1 - ssd1 / ssd0, 4)}, fh)
            except Exception as e:
                emit({"bench": "e2e_perlevel_smooth", "method": method.name,
                      "n": n, "error": type(e).__name__,
                      "msg": str(e)[:200]}, fh)
        del iref, imov
    fh.close()


if __name__ == "__main__":
    main()
