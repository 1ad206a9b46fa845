"""Round-6l: Pallas gather (warp2d/compose) sweep at 8192 lanes + e2e
retry. The 8192 e2e register() programs crash the remote Mosaic compiler
(HTTP 500, three fresh processes) — hypothesis: the OUTER warps at
halo_outer=5 have no gather tier at 8192, so they lower to the XLA roll
select chain ((2*5+2)^2 = 144 shifted 256 MB copies) whose compilation
blows the helper. If the pallas gather compiles at 8192 (kernels do,
r6j), extending its tier should unlock e2e.

Run (real TPU, single process, background):
  python benchmarks/r6l_warp8192.py
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


def main():
    from opticalflow2d_tpu.pallas_kernels import warp_fused

    out = open("benchmarks/r6_results.jsonl", "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((N, N), dtype=np.float32))
    u2 = jnp.asarray(rng.uniform(-1.4, 1.4, (2, N, N)).astype(np.float32))
    u5 = jnp.asarray(rng.uniform(-4.4, 4.4, (2, N, N)).astype(np.float32))

    for halo, u in ((2, u2), (5, u5)):
        for tb in (8, 16):
            try:
                def step(st, tb=tb, halo=halo):
                    im, v = st
                    w = warp_fused.warp2d_pallas(im, v, halo=halo, tb=tb)
                    return (w, v)

                s = kernel_timer(step, (img, u), iters_lo=2, iters_hi=10)
                emit({"kernel": "warp gather", "n": N, "halo": halo,
                      "tb": tb, "us_per_iter": round(s * 1e6, 1)})
            except Exception as e:
                emit({"kernel": "warp gather", "n": N, "halo": halo,
                      "tb": tb, "error": type(e).__name__,
                      "msg": str(e)[:160]})
    out.close()


if __name__ == "__main__":
    main()
