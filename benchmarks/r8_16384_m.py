"""Round-8: 16384^2 probe M — the REAL level-solver programs
(``_jitted_level``: halo warps + fenced derivatives + blocked while_loop
INCLUDING the partial-block recompute ``lax.cond`` + compose) for
diffusion and elastic, on a small-displacement pair (the probe-L pair
had ~128 px motion — an auto-halo stress test, not a registration
workload). If elastic's program still crashes, drill into its recompute
branch.

Run (real TPU, background): python benchmarks/r8_16384_m.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r8_results.jsonl")
N = 16384


def make_pair_16k():
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
    from opticalflow2d_tpu.engine.registration import _jitted_level

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "probe_16384_m", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    iref, imov = make_pair_16k()
    u0 = jnp.zeros((2, N, N), jnp.float32)

    for method, kw in [
        (Method.DIFFUSION, dict(alpha=0.5)),
        (Method.ELASTIC, dict(mu=0.5, lam=0.0)),
    ]:
        cfg = RegConfig(method=method, niter=(25,), nscales=0,
                        warp_halo_auto=False, warp_halo_outer=4, **kw)
        try:
            fn = _jitted_level(cfg, 25, 0)
            t0 = time.perf_counter()
            u_out, traces = fn(u0, iref, imov)
            float(jnp.sum(u_out))
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            u_out, traces = fn(u0, iref, imov)
            float(jnp.sum(u_out))
            emit({"step": f"m_level_{method.name.lower()}", "ok": True,
                  "compile_s": round(comp, 1),
                  "run_s": round(time.perf_counter() - t0, 3),
                  "iters": int(traces[0].iterations)})
            del u_out
        except Exception as e:
            emit({"step": f"m_level_{method.name.lower()}",
                  "error": type(e).__name__, "msg": str(e)[:200]})
    fh.close()


if __name__ == "__main__":
    main()
