"""Round-6g: controlled halo A/B at 4096^2 demons — r6d measured halo=4/
outer=5 FASTER end-to-end than halo=2/outer=4 (508 vs 892 ms) with zero
fallbacks either way, which contradicts per-iteration select-chain costs.
Vary one knob at a time and print iteration counts to locate the cause.

Run (real TPU, single process): python benchmarks/r6g_halo_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e_bench import make_pair  # noqa: E402

N = 4096


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import _register_impl

    out = open("benchmarks/r6_results.jsonl", "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    iref, imov = make_pair(N)
    iref, imov = jnp.asarray(iref), jnp.asarray(imov)

    for label, halo, outer in [
        ("h2_o4", 2, 4), ("h4_o4", 4, 4), ("h2_o5", 2, 5), ("h4_o5", 4, 5),
    ]:
        cfg = RegConfig(method=Method.THIRIONS_DEMONS, niter=(25, 25, 25),
                        nscales=2, use_pallas=True, warp_halo=halo,
                        warp_halo_outer=outer)

        @jax.jit
        def run(r, m, cfg=cfg):
            res = _register_impl(r, m, cfg)
            return (jnp.sum(res.motion),
                    jnp.stack([t.iterations for t in res.traces]))

        try:
            t0 = time.perf_counter()
            s, iters = run(iref, imov)
            float(s)
            comp = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                s, iters = run(iref, imov)
                float(s)
                best = min(best, time.perf_counter() - t0)
            emit({"bench": "halo_ab_4096", "mode": label,
                  "ms": round(best * 1e3, 1), "compile_s": round(comp, 1),
                  "iters": [int(v) for v in np.asarray(iters)]})
        except Exception as e:
            emit({"bench": "halo_ab_4096", "mode": label,
                  "error": type(e).__name__, "msg": str(e)[:160]})
    out.close()


if __name__ == "__main__":
    main()
