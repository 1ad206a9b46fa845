"""Round-6h: dispatch-free e2e device time via the slope protocol.

Every wall-clock e2e row in this corpus includes the ~28 ms axon-tunnel
dispatch (one host->device call per registration). CLAUDE.md's timing
rule — slope between two loop lengths — applies to registrations too:
jit a program that runs the full registration K times back-to-back
(feeding the warped output back as the next moving image so XLA cannot
CSE the copies), and take (t_K2 - t_K1)/(K2 - K1). That is the number a
production server amortizing dispatch over a stream of pairs sees.

Run (real TPU, single process): python benchmarks/r6h_e2e_slope.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e_bench import make_pair  # noqa: E402

N = 1024
K1, K2 = 1, 4


def main():
    import jax
    import jax.numpy as jnp

    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import _register_impl

    out = open("benchmarks/r6_results.jsonl", "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    iref, imov = make_pair(N)
    iref, imov = jnp.asarray(iref), jnp.asarray(imov)

    def bench(name, cfg):
        def chain(k):
            @jax.jit
            def run(r, m):
                acc = jnp.float32(0)
                mm = m
                for _ in range(k):
                    res = _register_impl(r, mm, cfg)
                    s = jnp.sum(res.motion)
                    acc = acc + s
                    # Dependency without changing values: mm + 0*s is not
                    # provably mm to XLA (0*NaN rules), so registrations
                    # serialize, but every repetition does IDENTICAL work
                    # (same inputs -> same iteration counts and regrids;
                    # warping mm forward would change the problem and,
                    # for fluid, the regrid count per repetition).
                    mm = mm + 0.0 * s
                return acc
            return run

        try:
            lo, hi = chain(K1), chain(K2)

            def best(run, reps=3):
                float(run(iref, imov))
                b = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    float(run(iref, imov))
                    b = min(b, time.perf_counter() - t0)
                return b

            t1, t2 = best(lo), best(hi)
            per = (t2 - t1) / (K2 - K1)
            emit({"bench": "e2e_slope_1024", "config": name,
                  "ms_per_reg_device": round(per * 1e3, 1),
                  "ms_walls": [round(t1 * 1e3, 1), round(t2 * 1e3, 1)]})
        except Exception as e:
            emit({"bench": "e2e_slope_1024", "config": name,
                  "error": type(e).__name__, "msg": str(e)[:160]})

    # outer halo 5 fits this pair's 4 px total motion (overshoot past
    # -4.0 floors to -5): outer=4 silently takes the exact gather in the
    # refinement warps and fluid's regrid branch — fluid measured
    # 101.4 ms/reg device at outer=4 vs the no-cliff number below.
    bench("thirion_fused_h2_o5", RegConfig(
        method=Method.THIRIONS_DEMONS, niter=(25, 25), nscales=1,
        warp_halo=2, warp_halo_outer=5, use_pallas=True))
    bench("fluid_fused_o5", RegConfig(
        method=Method.FLUID, mu=0.25, lam=0.0, niter=(25, 25), nscales=1,
        warp_halo=2, warp_halo_outer=5, use_pallas=True))
    bench("diffusion_blocked_o5", RegConfig(
        method=Method.DIFFUSION, alpha=0.5, niter=(25, 25), nscales=1,
        warp_halo=2, warp_halo_outer=5, use_pallas=True))
    out.close()


if __name__ == "__main__":
    main()
