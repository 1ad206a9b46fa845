"""Round-8: 16384^2 probe R — wide-halo gather cells (halo 5/6/7) at
16384 lanes. The auto-halo path in register_phased can legally pick any
halo up to 7 at 16k; probe B only measured halo 2/4. Confirm each cell
compiles and runs (or record the crash so the tier table can cap).

Run (real TPU, background): python benchmarks/r8_16384_r.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from r8_16384_m import make_pair_16k

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r8_results.jsonl")
N = 16384


def main():
    from opticalflow2d_tpu.pallas_kernels.warp_fused import (
        warp2d_pallas, compose_pallas,
    )

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_r", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    iref, _ = make_pair_16k()

    @jax.jit
    def mk_u():
        gi = jax.lax.broadcasted_iota(jnp.float32, (N, N), 0)
        gj = jax.lax.broadcasted_iota(jnp.float32, (N, N), 1)
        ux = 4.5 * jnp.sin(gi * 0.001) * jnp.cos(gj * 0.0007)
        uy = -4.0 * jnp.cos(gi * 0.0008) * jnp.sin(gj * 0.0011)
        return jnp.stack([ux, uy])

    u = mk_u()
    float(jnp.sum(u))
    # Arrays as ARGUMENTS (closed over, 1-2 GB compile-request constants
    # hang the relay — the CLAUDE.md trap).
    for halo in (5, 6, 7):
        for name, fn in (
            ("warp", lambda img, uu, h: jnp.sum(warp2d_pallas(img, uu, h))),
            ("compose",
             lambda img, uu, h: jnp.sum(compose_pallas(uu, 0.3 * uu, h))),
        ):
            try:
                run = jax.jit(lambda img, uu, h=halo, f=fn: f(img, uu, h))
                t0 = time.perf_counter()
                float(run(iref, u))
                comp = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(run(iref, u))
                emit({"step": f"{name}_h{halo}", "ok": True,
                      "compile_s": round(comp, 1),
                      "run_s": round(time.perf_counter() - t0, 3)})
            except Exception as e:
                emit({"step": f"{name}_h{halo}", "error": type(e).__name__,
                      "msg": str(e)[:160]})
    fh.close()


if __name__ == "__main__":
    main()
