"""Round-6d e2e: fused-kernel end-to-end wall-clock for the two families
this round rebuilt (demons one-pass, fluid fused iteration), plus the
warp_halo_auto acceptance run at 4096^2 (VERDICT r2 items #1, #2, #3).

Targets: demons e2e @1024^2 <= 35 ms; fluid e2e @1024^2 <= 60 ms; 4096^2
demons with default-config auto halo within 1.3x of the hand-tuned halo.

Protocol: single-jit programs that reduce the motion to a scalar (the
r2-r4 convention — pulling the full field through the tunnel costs
~400 ms of transfer at 1024^2 and would swamp the measurement). The
auto-halo rows are wall-clock around register(): the mid-run max|u|
readback forces ~3 tunnel dispatches (~28 ms each) that a local chip
would not pay; they are reported with that caveat.

Run (real TPU, single process, background):
  python benchmarks/r6d_e2e.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e_bench import make_pair  # noqa: E402  (synthetic pair: 4 px motion)


def emit(row, fh):
    print(json.dumps(row), flush=True)
    fh.write(json.dumps(row) + "\n")
    fh.flush()


def time_singlejit(iref, imov, cfg, reps=3):
    """r2-r4 protocol: one jit, scalar readback."""
    import jax
    import jax.numpy as jnp

    from opticalflow2d_tpu.engine.registration import _register_impl

    @jax.jit
    def run(r, m):
        res = _register_impl(r, m, cfg)
        iters = jnp.stack([t.iterations for t in res.traces])
        fb = jnp.stack([jnp.asarray(t.fallbacks) for t in res.traces])
        return jnp.sum(res.motion), iters, fb

    t0 = time.perf_counter()
    s, iters, fb = run(iref, imov)
    float(s)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s, iters, fb = run(iref, imov)
        float(s)
        best = min(best, time.perf_counter() - t0)
    import numpy as np

    return best, compile_s, [int(v) for v in np.asarray(fb)]


def time_auto_wallclock(iref, imov, cfg, reps=3):
    """Wall-clock around register() for warp_halo_auto (two jits + one
    scalar readback mid-run)."""
    import jax.numpy as jnp

    from opticalflow2d_tpu.engine.registration import register

    def run():
        res = register(iref, imov, cfg)
        float(jnp.sum(res.motion))
        return res

    t0 = time.perf_counter()
    res = run()
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        res = run()
        best = min(best, time.perf_counter() - t0)
    return best, compile_s, [int(t.fallbacks) for t in res.traces]


def main():
    import jax.numpy as jnp

    from opticalflow2d_tpu.config import Method, RegConfig

    out = open("benchmarks/r6_results.jsonl", "a")

    for n in (1024, 2048):
        iref, imov = make_pair(n)
        iref, imov = jnp.asarray(iref), jnp.asarray(imov)
        for method, kw in [
            (Method.THIRIONS_DEMONS, {}),
            (Method.FLUID, dict(mu=0.25, lam=0.0)),
        ]:
            for pallas in (True, False):
                # halo=4 fits the pair's 4 px motion (fallbacks must be 0).
                cfg = RegConfig(method=method, niter=(25, 25, 25), nscales=2,
                                use_pallas=pallas, warp_halo=4,
                                warp_halo_outer=5, **kw)
                try:
                    best, comp, fb = time_singlejit(iref, imov, cfg)
                    row = {"bench": "e2e", "method": method.name, "n": n,
                           "use_pallas": pallas, "halo": 4,
                           "ms": round(best * 1e3, 1),
                           "compile_s": round(comp, 1), "fallbacks": fb}
                except Exception as e:
                    row = {"bench": "e2e", "method": method.name, "n": n,
                           "use_pallas": pallas, "halo": 4,
                           "error": type(e).__name__, "msg": str(e)[:160]}
                emit(row, out)

        # halo=2 demons rows for continuity with the r2 e2e table (the 4 px
        # pair exceeds halo=2, so fallbacks fire — the honest default row).
        cfg2 = RegConfig(method=Method.THIRIONS_DEMONS, niter=(25, 25, 25),
                         nscales=2, use_pallas=True)
        try:
            best, comp, fb = time_singlejit(iref, imov, cfg2)
            row = {"bench": "e2e", "method": "THIRIONS_DEMONS", "n": n,
                   "use_pallas": True, "halo": 2,
                   "ms": round(best * 1e3, 1), "compile_s": round(comp, 1),
                   "fallbacks": fb}
        except Exception as e:
            row = {"bench": "e2e", "method": "THIRIONS_DEMONS", "n": n,
                   "use_pallas": True, "halo": 2,
                   "error": type(e).__name__, "msg": str(e)[:160]}
        emit(row, out)

    # 4096^2 demons: default config + auto halo vs hand-tuned halo
    # (RESULTS.md r4: 6,502 ms with the silent fallback, 1,269 ms tuned).
    n = 4096
    iref, imov = make_pair(n)
    iref, imov = jnp.asarray(iref), jnp.asarray(imov)
    for label, kw, auto in [
        ("auto", dict(warp_halo_auto=True), True),
        ("hand_tuned", dict(warp_halo=4, warp_halo_outer=5), False),
        ("default_no_auto", dict(), False),
    ]:
        cfg = RegConfig(method=Method.THIRIONS_DEMONS, niter=(25, 25, 25),
                        nscales=2, use_pallas=True, **kw)
        try:
            if auto:
                best, comp, fb = time_auto_wallclock(iref, imov, cfg, reps=2)
            else:
                best, comp, fb = time_singlejit(iref, imov, cfg, reps=2)
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
