"""Round-9 (driver round 5): 16384^2 e2e for the three families the
round-4 VERDICT left blocked at that size — via the new host-stepped
level driver (one program per iteration, Logger/regrid control on the
host; engine/registration._solve_level_stepped):

  - diffeomorphic demons: static-count exp map (VERDICT r4 task 3) —
    nsq bound from |c| <= sigma_x/(2 sigma_i), 0 at the default params,
    so the map is exactly the reference's nsquares==0 early return;
  - fluid: regridding as a host phase boundary (task 4) — the regrid
    predicate is a scalar readback, the compose/re-warp/re-derive runs
    as its own program;
  - curvature: per-iteration programs + u_est donation shrink HBM
    residency below the 16 GB that OOM'd the monolithic level (task 2).

Protocol matches the r8 16k rows (same make_pair_16k input, 3-level
pyramid, niter 25/level, ssd_red via halo-5 Pallas warp).

Run (real TPU, background): python benchmarks/r9_16384_stepped.py
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from r8_16384_m import make_pair_16k

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r9_results.jsonl")
N = 16384

FAMILIES = [
    ("diffeo", dict(method="DIFFEOMORPHIC_DEMONS")),
    ("fluid", dict(method="FLUID", mu=0.25, lam=0.0)),
    ("curvature", dict(method="CURVATURE", alpha=0.1, tau=1.0,
                       dct_impl="split_fast")),
]


def _ssd_red_chunked(iref, imov, motion, chunk=2048):
    """SSD reduction with the verification warp evaluated in row chunks:
    the whole-plane exact gather at 16384^2 materializes ~8 GB of index/
    tap temporaries next to the pair + motion — an OOM of its own. Same
    expressions as ops.warp.warp2d's exact path, chunked over output
    rows (the gather source stays the full moving image)."""
    import functools

    from opticalflow2d_tpu.ops.warp import (
        _bilinear_from_taps, _gather_taps_exact)

    @functools.partial(jax.jit, static_argnames=("r0", "chunk"))
    def chunk_ssd(iref, imov, u, r0: int, chunk: int):
        gi = jax.lax.broadcasted_iota(jnp.float32, (chunk, N), 0) + r0
        gj = jax.lax.broadcasted_iota(jnp.float32, (chunk, N), 1)
        px = gi + u[0, r0:r0 + chunk]
        py = gj + u[1, r0:r0 + chunk]
        value, weight, in_b = _bilinear_from_taps(
            imov[None], px, py, _gather_taps_exact)
        ok = in_b & (weight != 0)
        safe_w = jnp.where(weight != 0, weight, 1.0)
        ireg = jnp.where(ok, value[0] / safe_w, imov[r0:r0 + chunk])
        return (jnp.sum((iref[r0:r0 + chunk] - ireg) ** 2),
                jnp.sum((iref[r0:r0 + chunk] - imov[r0:r0 + chunk]) ** 2))

    ssd1 = 0.0
    ssd0 = 0.0
    for r0 in range(0, N, chunk):
        a, b = chunk_ssd(iref, imov, motion, r0, chunk)
        ssd1 += float(a)
        ssd0 += float(b)
    return 1 - ssd1 / ssd0


def main():
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register_phased

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "e2e_16384_stepped", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    only = set(sys.argv[1:])
    iref, imov = make_pair_16k()

    for name, kw in FAMILIES:
        if only and name not in only:
            continue
        kw = dict(kw)
        method = Method[kw.pop("method")]
        cfg = RegConfig(method=method, niter=(25, 25, 25), nscales=2, **kw)
        try:
            t0 = time.perf_counter()
            res = register_phased(iref, imov, cfg)
            float(jnp.sum(res.motion))
            cold = time.perf_counter() - t0
            iters = [int(t.iterations) for t in res.traces]
            regrids = [int(t.regrids) for t in res.traces]
            fallbacks = [int(t.fallbacks) for t in res.traces]
            red = _ssd_red_chunked(iref, imov, res.motion)
            # Warm rerun is best-effort: the fluid level's steady
            # footprint fits a fresh allocator but the first run's
            # long-lived small buffers can fragment the second attempt
            # past 16 GB (r9 series: cold reproducibly fits, warm
            # reproducibly does not, identical live sets).
            del res
            gc.collect()
            warm = None
            try:
                t0 = time.perf_counter()
                res = register_phased(iref, imov, cfg)
                float(jnp.sum(res.motion))
                warm = round(time.perf_counter() - t0, 2)
                del res
            except Exception as we:
                warm = f"OOM:{type(we).__name__}"
            emit({"family": name, "ok": True, "n": N, "nscales": 2,
                  "cold_s": round(cold, 1), "warm_s": warm,
                  "ssd_red": round(red, 4),
                  "iters": iters, "regrids": regrids,
                  "fallbacks": fallbacks})
        except Exception as e:
            import traceback as _tb

            frames = [f"{f.filename.split('/')[-1]}:{f.lineno}"
                      for f in _tb.extract_tb(e.__traceback__)
                      if "repo" in f.filename or "r9_" in f.filename]
            emit({"family": name, "error": type(e).__name__,
                  "msg": str(e)[:300], "where": frames[-6:]})
        gc.collect()
    fh.close()


if __name__ == "__main__":
    main()
