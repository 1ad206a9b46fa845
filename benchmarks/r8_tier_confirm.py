"""Round-8: confirm the promising retune cells with a noise-proof
protocol (iters 20/100 — the 5/25 sweep's slope is tunnel-jitter
dominated for sub-ms kernels; one cell measured 27.6 us @2048, above
HBM speed, i.e. impossible).

Run (real TPU, background): python benchmarks/r8_tier_confirm.py
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

    warp_cells = [
        (2048, 32, None), (2048, 64, None), (2048, 64, 48 * MB),
        (4096, 16, 32 * MB), (4096, 64, 64 * MB), (4096, 64, 32 * MB),
    ]
    data = {}
    for n in (2048, 4096):
        img = jnp.asarray(rng.random((n, n), dtype=np.float32))
        u = jnp.asarray(np.tanh(
            rng.standard_normal((2, n, n)).astype(np.float32)) * 1.8)
        data[n] = (img, u)
    for n, tb, limit in warp_cells:
        img, u = data[n]
        try:
            set_limit(wf, orig_wf, n, limit)
            wf.warp2d_pallas._clear_cache()

            def step(st, tb=tb):
                im, uu = st
                return (wf.warp2d_pallas(im, uu, 2, tb), uu)

            s = kernel_timer(step, (img, u), iters_lo=20, iters_hi=100)
            emit({"bench": "confirm_warp_h2", "n": n, "tb": tb,
                  "limit_mb": None if limit is None else limit // MB,
                  "us": round(s * 1e6, 1)})
        except Exception as e:
            emit({"bench": "confirm_warp_h2", "n": n, "tb": tb,
                  "error": type(e).__name__, "msg": str(e)[:120]})
    wf._TIERS_H2 = orig_wf
    wf.warp2d_pallas._clear_cache()

    onepass_cells = [
        (2048, 64, 48 * MB), (2048, 64, 64 * MB),
        (4096, 32, 64 * MB), (4096, 64, 64 * MB),
    ]
    pairs = {}
    for n in (2048, 4096):
        pairs[n] = (
            jnp.asarray(rng.random((n, n), dtype=np.float32)),
            jnp.asarray(rng.random((n, n), dtype=np.float32)),
            jnp.asarray(np.tanh(
                rng.standard_normal((2, n, n)).astype(np.float32)) * 0.9),
        )
    for n, tb, limit in onepass_cells:
        iaux, iref, u0 = pairs[n]
        try:
            set_limit(dop, orig_dop, n, limit)
            dop.thirion_onepass_pallas._clear_cache()

            def step(st, tb=tb):
                uu, acc = st
                out, sums = dop.thirion_onepass_pallas(
                    iaux, iref, uu, 1.0, 0.25, 2.0, 2.0, 5,
                    halo=2, tb=tb, with_errors=True)
                return (out, acc + jnp.sum(sums))

            iters = (20, 100) if n == 2048 else (5, 25)
            s = kernel_timer(step, (u0, jnp.float32(0)),
                             iters_lo=iters[0], iters_hi=iters[1])
            emit({"bench": "confirm_onepass_h2", "n": n, "tb": tb,
                  "limit_mb": limit // MB, "us": round(s * 1e6, 1)})
        except Exception as e:
            emit({"bench": "confirm_onepass_h2", "n": n, "tb": tb,
                  "error": type(e).__name__, "msg": str(e)[:120]})
    dop._TIERS_H2 = orig_dop
    fh.close()


if __name__ == "__main__":
    main()
