"""Round-8: converged quality of the split_fast curvature tier.

r8_curv_prec measured split_fast (1-pass bf16-input split-radix matmul
DCT) at 2.50x/1.55x/1.42x over the production split_high tier at
2048/4096/8192 with ~7e-3 relative error PER STEP. The per-step error is
bf16 input rounding — effectively noise injected each iteration — so the
decision-relevant number is the CONVERGED field: SSD reduction and
endpoint difference of a full registration under split_fast vs the
production (split_high) and parity (dense HIGHEST) configs.

Reference anchor: semi-implicit spectral curvature update,
``/root/reference/src/regularization/OpticalFlow/
OpticalFlowCurvature.cpp:144-167``.

Run (real TPU, background): python benchmarks/r8_curv_fast_quality.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r8_results.jsonl")


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
    for n in (1024, 2048, 4096):
        iref_np, imov_np = smooth_pair(n, rng)
        iref = jnp.asarray(iref_np)
        imov = jnp.asarray(imov_np)
        ssd0 = float(jnp.sum((iref - imov) ** 2))
        base = dict(method=Method.CURVATURE, alpha=0.1, tau=1.0,
                    niter=(60, 40), nscales=1, warp_halo=2,
                    warp_halo_outer=4, use_pallas=True, warp_halo_auto=True)
        results = {}
        for impl in ("matmul", "split_high", "split_fast"):
            cfg = RegConfig(dct_impl=impl, **base)
            try:
                results[impl] = register(iref, imov, cfg)
            except Exception as e:
                emit({"bench": "curv_fast_quality", "n": n, "dct_impl": impl,
                      "error": type(e).__name__, "msg": str(e)[:200]})
        if "matmul" not in results:
            del iref, imov
            continue
        ref = results["matmul"]

        def red(res):
            w = warp2d(imov, res.motion, 4, True)
            return 1.0 - float(jnp.sum((iref - w) ** 2)) / ssd0

        mag = float(jnp.mean(jnp.sqrt(ref.motion[0] ** 2
                                      + ref.motion[1] ** 2)))
        for impl, res in results.items():
            d = res.motion - ref.motion
            ee = jnp.sqrt(d[0] ** 2 + d[1] ** 2)
            emit({
                "bench": "curv_fast_quality", "n": n, "dct_impl": impl,
                "ssd_red": round(red(res), 6),
                "ee_mean_vs_parity": float(jnp.mean(ee)),
                "ee_max_vs_parity": float(jnp.max(ee)),
                "motion_mean_mag": mag,
                "iters": [int(t.iterations) for t in res.traces],
            })
        del iref, imov, results
    fh.close()


if __name__ == "__main__":
    main()
