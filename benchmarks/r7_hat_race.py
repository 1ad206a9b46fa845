"""Round-7: hat-accumulation gather vs the r4-r6 select chain, on TPU.

The warp/compose gathers were the VPU cost center of every demons kernel
(VERDICT r3 weak #3: one-pass Thirion 11x slower per pixel than blocked
diffusion). The hat restructure (demons_fused._bilinear_tile,
warp_fused._gather_kernel) cuts rolls from 4(2h+1)^2+(2h+2) to
(2h+2)^2+(2h+2) and drops the 4 live g-tile accumulators + selects,
bit-identically (weights are the original expressions, same accumulation
order). This bench races hat vs select in ONE process via the
demons_fused._GATHER_IMPL switch, checks bitwise equality on real TPU,
and re-measures the standalone warp gather (hat-only now; compare against
the recorded r6 rows: onepass 216.8 us @1024, 937.6 @2048, 4567.2 @4096;
warp gather halo2 72.1 us @1024 tb128).

Run (real TPU, background): python benchmarks/r7_hat_race.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r7_results.jsonl")


def main():
    from opticalflow2d_tpu.pallas_kernels import demons_fused as df
    from opticalflow2d_tpu.pallas_kernels import demons_onepass as dop
    from opticalflow2d_tpu.pallas_kernels.warp_fused import (
        warp2d_pallas, compose_pallas)
    from opticalflow2d_tpu.utils.profiling import kernel_timer

    fh = open(OUT, "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(0)

    def clear_caches():
        dop.thirion_onepass_pallas._clear_cache()
        for name in ("demons_correspondence_pallas", "compose_smooth_pallas"):
            fn = getattr(df, name, None)
            if fn is not None and hasattr(fn, "_clear_cache"):
                fn._clear_cache()

    # --- bitwise hat-vs-select check on real TPU @1024 ----------------------
    n = 1024
    iaux = jnp.asarray(rng.random((n, n), dtype=np.float32))
    iref = jnp.asarray(rng.random((n, n), dtype=np.float32))
    u = jnp.asarray(np.tanh(
        rng.standard_normal((2, n, n)).astype(np.float32)) * 1.8)

    outs = {}
    for impl in ("hat", "select"):
        df._GATHER_IMPL = impl
        clear_caches()
        outs[impl] = np.asarray(dop.thirion_onepass_pallas(
            iaux, iref, u, 1.0, 0.25, 2.0, 2.0, 5, halo=2))
    bit_eq = bool(np.array_equal(outs["hat"], outs["select"]))
    md = float(np.max(np.abs(outs["hat"] - outs["select"])))
    emit({"bench": "hat_vs_select_bitwise", "n": n, "equal": bit_eq,
          "maxdiff": md})

    # --- onepass timing race -------------------------------------------------
    for n, tbs in ((1024, (64, 128, 256)), (2048, (32, 64, 128)),
                   (4096, (32, 64))):
        ia = jnp.asarray(rng.random((n, n), dtype=np.float32))
        ir = jnp.asarray(rng.random((n, n), dtype=np.float32))
        uu = jnp.asarray(np.clip(
            rng.standard_normal((2, n, n)), -1.6, 1.6).astype(np.float32))
        for impl in ("hat", "select"):
            df._GATHER_IMPL = impl
            clear_caches()
            for tb in tbs:
                try:
                    def step(st, tb=tb):
                        v, a, r = st
                        return (dop.thirion_onepass_pallas(
                            a, r, v, 1.0, 0.25, 2.0, 2.0, 5, 2,
                            addition=False, tb=tb), a, r)

                    s = kernel_timer(step, (uu, ia, ir), iters_lo=5,
                                     iters_hi=25)
                    emit({"bench": "onepass_race", "impl": impl, "n": n,
                          "tb": tb, "us_per_iter": round(s * 1e6, 1)})
                except Exception as e:
                    emit({"bench": "onepass_race", "impl": impl, "n": n,
                          "tb": tb, "error": type(e).__name__,
                          "msg": str(e)[:160]})
        # two-kernel chain (kernel A + B) at the tier default tile
        for impl in ("hat", "select"):
            df._GATHER_IMPL = impl
            clear_caches()
            try:
                def step2(st):
                    v, a, r = st
                    c = df.demons_correspondence_pallas(
                        a, r, v, 1.0, 0.25, 2.0, 5, 2)
                    return (df.compose_smooth_pallas(v, c, 2.0, 5, 1), a, r)

                s = kernel_timer(step2, (uu, ia, ir), iters_lo=5, iters_hi=25)
                emit({"bench": "twokernel_race", "impl": impl, "n": n,
                      "us_per_iter": round(s * 1e6, 1)})
            except Exception as e:
                emit({"bench": "twokernel_race", "impl": impl, "n": n,
                      "error": type(e).__name__, "msg": str(e)[:160]})
        del ia, ir, uu

    df._GATHER_IMPL = "hat"
    clear_caches()

    # --- standalone warp gather / compose (hat-only; vs recorded r6 rows) ---
    for n, halo, tb in ((1024, 2, 128), (2048, 2, 32), (4096, 2, 16),
                        (8192, 2, 16), (1024, 4, 32), (4096, 4, 16)):
        try:
            img = jnp.asarray(rng.random((n, n), dtype=np.float32))
            uu = jnp.asarray(np.clip(
                rng.standard_normal((2, n, n)), -(halo - 0.4), halo - 0.4
            ).astype(np.float32))

            def stepw(st, halo=halo, tb=tb):
                im, v = st
                return (warp2d_pallas(im, v, halo=halo, tb=tb), v)

            s = kernel_timer(stepw, (img, uu), iters_lo=5, iters_hi=25)
            emit({"bench": "warp_gather_hat", "n": n, "halo": halo, "tb": tb,
                  "us_per_iter": round(s * 1e6, 1)})
            del img, uu
        except Exception as e:
            emit({"bench": "warp_gather_hat", "n": n, "halo": halo, "tb": tb,
                  "error": type(e).__name__, "msg": str(e)[:160]})

    for n, halo, tb in ((1024, 2, 64), (4096, 2, 16)):
        try:
            ut = jnp.asarray(np.clip(
                rng.standard_normal((2, n, n)), -1.5, 1.5).astype(np.float32))
            ui = jnp.asarray(np.clip(
                rng.standard_normal((2, n, n)), -1.5, 1.5).astype(np.float32))

            def stepc(st, halo=halo, tb=tb):
                a, b = st
                return (compose_pallas(a, b, halo=halo, tb=tb), b)

            s = kernel_timer(stepc, (ut, ui), iters_lo=5, iters_hi=25)
            emit({"bench": "compose_hat", "n": n, "halo": halo, "tb": tb,
                  "us_per_iter": round(s * 1e6, 1)})
            del ut, ui
        except Exception as e:
            emit({"bench": "compose_hat", "n": n, "halo": halo, "tb": tb,
                  "error": type(e).__name__, "msg": str(e)[:160]})
    fh.close()


if __name__ == "__main__":
    main()
