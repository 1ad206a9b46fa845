"""Round-7: production-size quality gate (VERDICT r3 task 7).

Measures the ACCUMULATED precision drift of the production configuration
(fused Pallas kernels, temporal blocking, split_high DCT, auto halo) vs
the parity-grade configuration (jnp ops, dense HIGHEST DCT, no blocking)
on converged registrations at 1024^2 (all six families) and 2048^2
(curvature + fluid — the spectral family with the largest per-step drift
and the trajectory-sensitive family). Each individual source is bounded
per step (split_high 3.4e-5 rel, fused kernels ~1 ulp, blocked Logger
partial-sum association); this measures their composition through the
convergence gate, which can also shift the early-stop iteration.

Emits one JSON row per (family, n): SSD reduction under both configs,
endpoint stats between the two motion fields, iteration counts. Asserts
the regression gate at the bottom (tolerances justified inline).

Run (real TPU, background): python benchmarks/r7_quality_prod.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r7_results.jsonl")


def smooth_pair(n, rng, strength=2.5):
    coarse = rng.random((n // 32, n // 32), dtype=np.float32)
    img = np.kron(coarse, np.ones((32, 32), np.float32))
    k = np.ones(17, np.float32) / 17.0
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, img)
    img = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, img)
    ys = np.linspace(0, 6 * np.pi, n, dtype=np.float32)
    sx = strength * np.sin(ys)[None, :] * np.cos(ys * 0.7)[:, None]
    ix = np.clip(np.arange(n)[:, None] + sx, 0, n - 1).astype(np.int32)
    mov = img[ix, np.arange(n)[None, :]]
    return img.astype(np.float32), mov.astype(np.float32)


FAMILIES = [
    ("diffusion", dict(method="DIFFUSION", alpha=0.5)),
    ("curvature", dict(method="CURVATURE", alpha=0.1, tau=1.0)),
    ("elastic", dict(method="ELASTIC", mu=0.5, lam=0.0)),
    ("thirions", dict(method="THIRIONS_DEMONS")),
    ("diffeo", dict(method="DIFFEOMORPHIC_DEMONS")),
    ("fluid", dict(method="FLUID", mu=0.25, lam=0.0)),
]


def main():
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register
    from opticalflow2d_tpu.ops.warp import warp2d

    fh = open(OUT, "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(11)
    gate_rows = []
    for n in (1024, 2048):
        iref_np, imov_np = smooth_pair(n, rng)
        iref = jnp.asarray(iref_np)
        imov = jnp.asarray(imov_np)
        ssd0 = float(jnp.sum((iref - imov) ** 2))
        fams = FAMILIES if n == 1024 else [FAMILIES[1], FAMILIES[5]]
        for name, kw in fams:
            kw = dict(kw)
            method = Method[kw.pop("method")]
            base = dict(method=method, niter=(60, 40), nscales=1,
                        warp_halo=2, warp_halo_outer=4, **kw)
            cfg_prod = RegConfig(use_pallas=True, warp_halo_auto=True,
                                 **base)
            cfg_par = RegConfig(use_pallas=False, warp_halo_auto=False,
                                dct_impl="matmul", pallas_block_k=1,
                                pallas_block_elastic=False, **base)
            try:
                rp = register(iref, imov, cfg_prod)
                rq = register(iref, imov, cfg_par)
                d = rp.motion - rq.motion
                ee = jnp.sqrt(d[0] ** 2 + d[1] ** 2)
                mag = float(jnp.mean(jnp.sqrt(rq.motion[0] ** 2
                                              + rq.motion[1] ** 2)))

                def red(res):
                    w = warp2d(imov, res.motion, 4, True)
                    return 1.0 - float(jnp.sum((iref - w) ** 2)) / ssd0

                row = {
                    "bench": "quality_prod_vs_parity", "family": name,
                    "n": n,
                    "ssd_red_prod": round(red(rp), 6),
                    "ssd_red_parity": round(red(rq), 6),
                    "ee_mean": float(jnp.mean(ee)),
                    "ee_max": float(jnp.max(ee)),
                    "motion_mean_mag": mag,
                    "iters_prod": [int(t.iterations) for t in rp.traces],
                    "iters_parity": [int(t.iterations) for t in rq.traces],
                }
                emit(row)
                gate_rows.append(row)
            except Exception as e:
                emit({"bench": "quality_prod_vs_parity", "family": name,
                      "n": n, "error": type(e).__name__,
                      "msg": str(e)[:200]})
        del iref, imov

    # Regression gate. Justification:
    # - SSD reduction: the production config must register at least as well
    #   as parity minus 0.5% absolute — kernel drift must not cost quality.
    # - mean endpoint difference <= 0.02 px: per-step bounds (split_high
    #   3.4e-5 rel on ~1 px fields, fused-kernel ~1 ulp) compound over
    #   <= 100 iterations to ~3e-3 px; 0.02 leaves ~6x margin while still
    #   catching any real regression (a wrong stencil or halo bug shows up
    #   as O(0.1-1) px immediately). Early-stop iteration shifts can add
    #   one solver step's worth of change, bounded by the same scale.
    failures = []
    for r in gate_rows:
        if r["ssd_red_prod"] < r["ssd_red_parity"] - 0.005:
            failures.append((r["family"], r["n"], "ssd", r["ssd_red_prod"],
                             r["ssd_red_parity"]))
        if r["ee_mean"] > 0.02:
            failures.append((r["family"], r["n"], "ee_mean", r["ee_mean"]))
    emit({"bench": "quality_gate", "pass": not failures,
          "failures": [list(map(str, f)) for f in failures]})
    fh.close()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
