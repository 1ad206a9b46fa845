"""Round-8: curvature DCT precision tiers at MAC-bound sizes.

The r5 study measured ``split_fast`` (single-pass, bf16-input matmuls)
LOSING to ``matmul_fast`` at 1024^2, where the one-pass step is
bandwidth-bound and the split recursion's extra concat/reverse passes
cost more than the saved MACs. But past 2048^2 the curvature step is
MXU-MAC-bound (the transform is O(N^3): split_high measures 15,989.8
us/iter @4096, 111,944 @8192 — r7_results.jsonl), so the 1-pass tier's
~3x MAC-rate advantage over the 3-pass HIGH tier should dominate there.
This probe times every tier at 2048/4096/8192 and pins the per-step
accuracy of each against the dense-HIGHEST parity transform on device,
so the fast tier ships as a measured option, not a guess.

Reference anchor: the step being timed is the semi-implicit spectral
curvature update of ``/root/reference/src/regularization/OpticalFlow/
OpticalFlowCurvature.cpp:144-167``.

Run (real TPU, single process, background):
  python benchmarks/r8_curv_prec.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r8_results.jsonl")


def emit(row, fh):
    print(json.dumps(row), flush=True)
    fh.write(json.dumps(row) + "\n")
    fh.flush()


def main():
    fh = open(OUT, "a")
    from opticalflow2d_tpu.solvers.base import Derivatives, derivatives
    from opticalflow2d_tpu.solvers.curvature import make_curvature_step
    from opticalflow2d_tpu.utils.profiling import kernel_timer

    rng = np.random.default_rng(8)

    for n in (2048, 4096, 8192):
        iref = jnp.asarray(rng.random((n, n), dtype=np.float32))
        imov = jnp.asarray(rng.random((n, n), dtype=np.float32))
        d = derivatives(iref, imov)
        u0 = jnp.asarray(
            np.tanh(rng.standard_normal((2, n, n)).astype(np.float32))
        )

        # Per-step accuracy vs the dense HIGHEST (parity) transform, all
        # four tiers in ONE program so the 8192 case compiles once.
        impls = ("split_high", "split_fast", "matmul_high", "matmul_fast")

        @jax.jit
        def acc(u, gi, it_img, n=n):
            dd = Derivatives(gi, it_img)
            ref = make_curvature_step(n, n, 0.1, 1.0, dct_impl="matmul")(u, dd)
            sc = jnp.max(jnp.abs(ref))
            outs = []
            for impl in impls:
                s = make_curvature_step(n, n, 0.1, 1.0, dct_impl=impl)(u, dd)
                outs.append(jnp.max(jnp.abs(s - ref)) / sc)
            return jnp.stack(outs)

        try:
            rels = np.asarray(acc(u0, d.grad_i, d.it))
            for impl, rel in zip(impls, rels):
                emit({"bench": "curv_prec_acc", "n": n, "dct_impl": impl,
                      "rel_vs_highest": float(rel)}, fh)
        except Exception as e:
            emit({"bench": "curv_prec_acc", "n": n,
                  "error": type(e).__name__, "msg": str(e)[:200]}, fh)

        for impl in impls:
            try:
                def stepc(st, n=n, impl=impl):
                    step = make_curvature_step(n, n, 0.1, 1.0, dct_impl=impl)
                    v, gi, it_img = st
                    return (step(v, Derivatives(gi, it_img)), gi, it_img)

                t0 = time.perf_counter()
                s = kernel_timer(stepc, (u0, d.grad_i, d.it), iters_lo=2,
                                 iters_hi=10)
                emit({"bench": "curv_prec_step", "n": n, "dct_impl": impl,
                      "us_per_iter": round(s * 1e6, 1),
                      "wall_s": round(time.perf_counter() - t0, 1)}, fh)
            except Exception as e:
                emit({"bench": "curv_prec_step", "n": n, "dct_impl": impl,
                      "error": type(e).__name__, "msg": str(e)[:200]}, fh)
        del iref, imov, d, u0
    fh.close()


if __name__ == "__main__":
    main()
