"""Round-8: serving-throughput table under the production defaults.

Registrations/s for full registrations (pyramid + refine + convergence,
niter=(25,25), nscales=1) batched via ``register_batch(impl="auto")`` —
vmap for the variational families, per-pair map programs for the
cond-heavy demons/fluid — at 256^2/512^2/1024^2 across batch sizes.
The one-pair-at-a-time reference wrapper
(``/root/reference/WrapperOpticalFlow2d.cpp:86-102``) has no analog of
this amortization; prior rows covered 256^2 only (r2/r6).

Run (real TPU, background): python benchmarks/r8_serving_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r8_results.jsonl")


def pair(n, k=0):
    xs = np.arange(n)[:, None]
    ys = np.arange(n)[None, :]
    img = np.zeros((n, n), np.float32)
    r = np.random.default_rng(k)
    for _ in range(20):
        cx, cy = r.uniform(0, n, 2)
        s = r.uniform(2, max(4.0, n * 0.1))
        img += r.uniform(-1, 1) * np.exp(
            -((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * s * s)
        ).astype(np.float32)
    mov = np.roll(img, (1, -1), (0, 1))
    return img, mov


def main():
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.parallel.batch import register_batch

    fh = open(OUT, "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    plans = [
        (256, (1, 16, 64)),
        (512, (1, 8, 32)),
        (1024, (1, 4, 16)),
    ]
    methods = [
        (Method.DIFFUSION, dict(alpha=0.5)),
        (Method.FLUID, dict(mu=0.25, lam=0.0)),
        (Method.THIRIONS_DEMONS, dict()),
    ]
    for n, batches in plans:
        base_r, base_m = pair(n)
        for method, kw in methods:
            cfg = RegConfig(method=method, niter=(25, 25), nscales=1, **kw)
            for b in batches:
                irefs = jnp.asarray(np.stack([base_r] * b))
                imovs = jnp.asarray(np.stack([base_m] * b))

                def run():
                    return float(jnp.sum(
                        register_batch(irefs, imovs, cfg).motion))

                try:
                    t0 = time.perf_counter()
                    run()  # compile
                    comp = time.perf_counter() - t0
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.perf_counter()
                        run()
                        best = min(best, time.perf_counter() - t0)
                    emit({"bench": "serving_sweep", "method": method.name,
                          "n": n, "batch": b,
                          "ms": round(best * 1e3, 2),
                          "reg_per_s": round(b / best, 1),
                          "mpix_per_s": round(b * n * n / best / 1e6, 1),
                          "compile_s": round(comp, 1)})
                except Exception as e:
                    emit({"bench": "serving_sweep", "method": method.name,
                          "n": n, "batch": b, "error": type(e).__name__,
                          "msg": str(e)[:200]})
                del irefs, imovs
    fh.close()


if __name__ == "__main__":
    main()
