"""Round-6e: first 8192^2 rows (VERDICT r2 item #4).

NO Pallas kernel ships through the axon relay at ny=8192 — remote_compile
rejects the program (HTTP 413 "length limit exceeded" / broken pipe)
after ~25 min of retries; probed and recorded for the one-pass demons,
two-kernel fused demons, AND blocked diffusion kernels
(r6_results.jsonl). An environment limit of the tunnel, not of the
kernels (the same programs compile at 4096 lanes, and compiled-code size
scales with the lane extent). UPDATE (r6i-r6l): the "relay limit" was benchmark closures embedding
256 MB device arrays as compile-request constants; with arrays as
arguments every kernel compiles at 8192, tier tables now cover it, and
the warp-gather 8192 tier fixed the remote-compiler crash (the outer
warps' XLA roll chain was what blew the helper). This script records the
3-level 8192^2 e2e rows for diffusion / elastic / demons.

Run (real TPU, single process, background):
  python benchmarks/r6e_8192.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from opticalflow2d_tpu.utils.profiling import kernel_timer

N = 8192


def emit(row, fh):
    print(json.dumps(row), flush=True)
    fh.write(json.dumps(row) + "\n")
    fh.flush()


def main():
    from opticalflow2d_tpu.solvers.base import derivatives

    out = open("benchmarks/r6_results.jsonl", "a")
    rng = np.random.default_rng(0)
    iref = jnp.asarray(rng.random((N, N), dtype=np.float32))
    imov = jnp.asarray(rng.random((N, N), dtype=np.float32))
    d = derivatives(iref, imov)
    u = jnp.zeros((2, N, N), jnp.float32)

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()


    # (c) e2e rows (pyramid, convergence loops). use_pallas=True so the
    # run records exactly what the production driver does at this size:
    # every Pallas tier gate returns False at ny=8192 and the XLA paths
    # run instead.
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register
    from e2e_bench import make_pair

    iref_e, imov_e = make_pair(N)
    for method, kw in [
        (Method.DIFFUSION, dict(alpha=0.5)),
        (Method.ELASTIC, dict(mu=0.25, lam=0.0)),
        (Method.THIRIONS_DEMONS, dict(warp_halo_auto=True)),
    ]:
        cfg = RegConfig(method=method, niter=(25, 25, 25), nscales=2,
                        use_pallas=True, **kw)
        try:
            def run():
                res = register(iref_e, imov_e, cfg)
                float(jnp.sum(res.motion))
                return res

            t0 = time.perf_counter()
            run()
            comp = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                res = run()
                best = min(best, time.perf_counter() - t0)
            row = {"bench": "e2e_8192", "method": method.name,
                   "ms": round(best * 1e3, 1), "compile_s": round(comp, 1),
                   "fallbacks": [int(t.fallbacks) for t in res.traces]}
        except Exception as e:
            row = {"bench": "e2e_8192", "method": method.name,
                   "error": type(e).__name__, "msg": str(e)[:160]}
        emit(row)
    out.close()


if __name__ == "__main__":
    main()
