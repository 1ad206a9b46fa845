"""Round-9 (driver round 5): ONE shared-protocol 8192^2 e2e table
(VERDICT r4 weak #5: the r7 rows mixed a band-limited pair for
fluid/curvature with a noise pair for diffusion/elastic/demons — not
comparable across families).

Protocol: the same band-limited smooth pair for ALL SIX families
(upsampled random seed + smooth sinusoidal displacement — the 16k
protocol at N=8192), 3-level pyramid, production defaults, best-of-2
wall time after the compile pass, ssd_red via halo-5 Pallas warp.

Run (real TPU, background): python benchmarks/r9_8192_shared.py
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r9_results.jsonl")
N = 8192

FAMILIES = [
    ("diffusion", dict(method="DIFFUSION", alpha=0.5)),
    ("elastic", dict(method="ELASTIC", mu=0.5, lam=0.0)),
    ("thirions", dict(method="THIRIONS_DEMONS")),
    ("diffeo", dict(method="DIFFEOMORPHIC_DEMONS")),
    ("fluid", dict(method="FLUID", mu=0.25, lam=0.0)),
    ("curvature", dict(method="CURVATURE", alpha=0.1, tau=1.0)),
]


def make_pair_8k():
    from opticalflow2d_tpu.ops.resample import upsample_image
    from opticalflow2d_tpu.ops.warp import warp2d

    rng = np.random.default_rng(16)
    seed = jnp.asarray(rng.random((N // 64, N // 64), dtype=np.float32))

    @jax.jit
    def blow_up(s):
        x = s
        for _ in range(6):
            nx, ny = x.shape
            x = upsample_image(x, (2 * nx, 2 * ny))
        return x

    @jax.jit
    def displace(img):
        gi = jax.lax.broadcasted_iota(jnp.float32, (N, N), 0)
        gj = jax.lax.broadcasted_iota(jnp.float32, (N, N), 1)
        ux = 2.5 * jnp.sin(gi * (2 * np.pi / 1300.0)) * \
            jnp.cos(gj * (2 * np.pi / 1700.0))
        uy = -2.0 * jnp.cos(gi * (2 * np.pi / 1100.0)) * \
            jnp.sin(gj * (2 * np.pi / 900.0))
        return warp2d(img, jnp.stack([ux, uy]), 4, True)

    iref = blow_up(seed)
    imov = displace(iref)
    float(jnp.sum(imov))
    return iref, imov


def main():
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register
    from opticalflow2d_tpu.ops.warp import warp2d

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "e2e_8192_shared", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    iref, imov = make_pair_8k()
    ssd0 = float(jnp.sum((iref - imov) ** 2))

    for name, kw in FAMILIES:
        kw = dict(kw)
        method = Method[kw.pop("method")]
        cfg = RegConfig(method=method, niter=(25, 25, 25), nscales=2, **kw)
        try:
            t0 = time.perf_counter()
            res = register(iref, imov, cfg)
            float(jnp.sum(res.motion))
            cold = time.perf_counter() - t0
            iters = [int(t.iterations) for t in res.traces]
            regrids = [int(t.regrids) for t in res.traces]
            t0 = time.perf_counter()
            res = register(iref, imov, cfg)
            float(jnp.sum(res.motion))
            warm = time.perf_counter() - t0
            ireg = warp2d(imov, res.motion, 5, True)
            ssd1 = float(jnp.sum((iref - ireg) ** 2))
            emit({"family": name, "ok": True, "n": N, "nscales": 2,
                  "cold_s": round(cold, 1), "warm_ms": round(warm * 1e3, 1),
                  "ssd_red": round(1 - ssd1 / ssd0, 4),
                  "iters": iters, "regrids": regrids})
            del res, ireg
        except Exception as e:
            emit({"family": name, "error": type(e).__name__,
                  "msg": str(e)[:300]})
        gc.collect()
    fh.close()


if __name__ == "__main__":
    main()
