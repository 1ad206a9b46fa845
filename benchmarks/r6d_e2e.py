"""Round-6d e2e: fused-kernel end-to-end wall-clock for the two families
this round rebuilt (demons one-pass, fluid fused iteration), plus the
warp_halo_auto acceptance run at 4096^2 (VERDICT r2 items #1, #2, #3).

Targets: demons e2e @1024^2 <= 35 ms; fluid e2e @1024^2 <= 60 ms; 4096^2
demons with default-config auto halo within 1.3x of the hand-tuned halo.

Run (real TPU, single process, background):
  python benchmarks/r6d_e2e.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e_bench import make_pair  # noqa: E402  (same synthetic pair: 4 px motion)


def emit(row, fh):
    print(json.dumps(row), flush=True)
    fh.write(json.dumps(row) + "\n")
    fh.flush()


def run_cfg(iref, imov, cfg, reps=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from opticalflow2d_tpu.engine.registration import register

    def run():
        res = register(iref, imov, cfg)
        np.asarray(res.motion)
        return res

    t0 = time.perf_counter()
    res = run()
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        res = run()
        best = min(best, time.perf_counter() - t0)
    fb = [int(t.fallbacks) for t in res.traces]
    return best, compile_s, fb


def main():
    from opticalflow2d_tpu.config import Method, RegConfig

    out = open("benchmarks/r6_results.jsonl", "a")

    for n in (1024, 2048):
        iref, imov = make_pair(n)
        for method, kw in [
            (Method.THIRIONS_DEMONS, {}),
            (Method.FLUID, dict(mu=0.25, lam=0.0)),
        ]:
            for pallas in (True, False):
                cfg = RegConfig(method=method, niter=(25, 25, 25), nscales=2,
                                use_pallas=pallas, warp_halo_auto=True, **kw)
                try:
                    best, comp, fb = run_cfg(iref, imov, cfg)
                    row = {"bench": "e2e", "method": method.name, "n": n,
                           "use_pallas": pallas,
                           "ms": round(best * 1e3, 1),
                           "compile_s": round(comp, 1), "fallbacks": fb}
                except Exception as e:
                    row = {"bench": "e2e", "method": method.name, "n": n,
                           "use_pallas": pallas,
                           "error": type(e).__name__, "msg": str(e)[:160]}
                emit(row, out)

    # 4096^2 demons: default config + auto halo vs hand-tuned halo
    # (RESULTS.md r4: 6,502 ms with the silent fallback, 1,269 ms tuned).
    n = 4096
    iref, imov = make_pair(n)
    for label, kw in [
        ("auto", dict(warp_halo_auto=True)),
        ("hand_tuned", dict(warp_halo=4, warp_halo_outer=5)),
        ("default_no_auto", dict()),
    ]:
        cfg = RegConfig(method=Method.THIRIONS_DEMONS, niter=(25, 25, 25),
                        nscales=2, use_pallas=True, **kw)
        try:
            best, comp, fb = run_cfg(iref, imov, cfg, reps=2)
            row = {"bench": "e2e_4096_demons", "halo_mode": label,
                   "ms": round(best * 1e3, 1), "compile_s": round(comp, 1),
                   "fallbacks": fb}
        except Exception as e:
            row = {"bench": "e2e_4096_demons", "halo_mode": label,
                   "error": type(e).__name__, "msg": str(e)[:160]}
        emit(row, out)
    out.close()


if __name__ == "__main__":
    main()
