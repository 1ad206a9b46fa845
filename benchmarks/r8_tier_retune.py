"""Round-8: retune the hat-gather tiers at 2048/4096.

The r7 hat remeasure kept the r4 select-chain tier table unchanged, but
the hat kernel has a different live-temporary profile (one fma
accumulator vs four live tap tiles), so the optimal (tb, scoped-vmem
limit) can differ: @1024 the hat gather already wanted tb=128 (27.9 us)
where the select chain's sweep had chosen it too, but @2048 the hat
measured 313.4 us at the tier tb=32 vs the select chain's 272.7 — a 15%
regression that was left "within tunnel jitter, not re-tiered". This
sweep races tb x vmem-limit combos for the standalone warp gather and
the one-pass Thirion kernel at 2048/4096 and records every cell, so the
tier tables can be updated from data (or confirmed).

Run (real TPU, background): python benchmarks/r8_tier_retune.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r8_results.jsonl")
MB = 1024 * 1024


def main():
    from opticalflow2d_tpu.pallas_kernels import warp_fused as wf
    from opticalflow2d_tpu.pallas_kernels import demons_onepass as dop
    from opticalflow2d_tpu.utils.profiling import kernel_timer

    fh = open(OUT, "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(1)
    orig_wf = wf._TIERS_H2
    orig_dop = dop._TIERS_H2

    def set_limit(mod, orig, n, limit):
        mod._TIERS_H2 = tuple(
            (cap, tb, limit if cap == n else lim) for cap, tb, lim in orig
        )

    # --- standalone warp gather halo2 ---------------------------------------
    plans = {
        2048: ([16, 32, 64, 128], [None, 48 * MB, 64 * MB, 100 * MB]),
        4096: ([8, 16, 32, 64], [32 * MB, 64 * MB, 100 * MB]),
    }
    for n, (tbs, limits) in plans.items():
        img = jnp.asarray(rng.random((n, n), dtype=np.float32))
        u = jnp.asarray(np.tanh(
            rng.standard_normal((2, n, n)).astype(np.float32)) * 1.8)
        for limit in limits:
            set_limit(wf, orig_wf, n, limit)
            wf.warp2d_pallas._clear_cache()
            for tb in tbs:
                try:
                    def step(st, tb=tb):
                        im, uu = st
                        return (wf.warp2d_pallas(im, uu, 2, tb), uu)

                    s = kernel_timer(step, (img, u), iters_lo=5, iters_hi=25)
                    emit({"bench": "retune_warp_h2", "n": n, "tb": tb,
                          "limit_mb": None if limit is None else limit // MB,
                          "us": round(s * 1e6, 1)})
                except Exception as e:
                    emit({"bench": "retune_warp_h2", "n": n, "tb": tb,
                          "limit_mb": None if limit is None else limit // MB,
                          "error": type(e).__name__, "msg": str(e)[:160]})
        wf._TIERS_H2 = orig_wf
        wf.warp2d_pallas._clear_cache()
        del img, u

    # --- one-pass Thirion halo2 (production kw=5, with_errors) --------------
    plans = {
        2048: ([32, 64, 128], [48 * MB, 64 * MB, 100 * MB]),
        4096: ([16, 32, 64], [64 * MB, 100 * MB]),
    }
    for n, (tbs, limits) in plans.items():
        iaux = jnp.asarray(rng.random((n, n), dtype=np.float32))
        iref = jnp.asarray(rng.random((n, n), dtype=np.float32))
        u0 = jnp.asarray(np.tanh(
            rng.standard_normal((2, n, n)).astype(np.float32)) * 0.9)
        for limit in limits:
            set_limit(dop, orig_dop, n, limit)
            dop.thirion_onepass_pallas._clear_cache()
            for tb in tbs:
                try:
                    def step(st, tb=tb):
                        uu, acc = st
                        out, sums = dop.thirion_onepass_pallas(
                            iaux, iref, uu, 1.0, 0.25, 2.0, 2.0, 5,
                            halo=2, tb=tb, with_errors=True)
                        return (out, acc + jnp.sum(sums))

                    s = kernel_timer(step, (u0, jnp.float32(0)),
                                     iters_lo=5, iters_hi=25)
                    emit({"bench": "retune_onepass_h2", "n": n, "tb": tb,
                          "limit_mb": limit // MB,
                          "us": round(s * 1e6, 1)})
                except Exception as e:
                    emit({"bench": "retune_onepass_h2", "n": n, "tb": tb,
                          "limit_mb": limit // MB,
                          "error": type(e).__name__, "msg": str(e)[:160]})
        dop._TIERS_H2 = orig_dop
        dop.thirion_onepass_pallas._clear_cache()
        del iaux, iref, u0
    fh.close()


if __name__ == "__main__":
    main()
