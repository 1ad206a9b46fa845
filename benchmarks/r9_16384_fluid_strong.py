"""Round-9: fluid 16384^2 on a STRONG-displacement pair.

On the shared 16k protocol pair the displacement (2.5 px at 16384 —
tiny relative to feature scale after 6 upsampling doublings) produces a
force so small that fluid's adaptive timestep hits the reference's own
skip branch (dt >= 65, OpticalFlowFluid.cpp:135-137) and the Logger
stops at 3 iterations with ~zero motion — faithful, but it exercises
nothing. This variant scales the displacement to ~5.5 px (outer halo
fits the auto-halo cap of 7) so the 16384^2 fluid path demonstrably
converges. Protocol otherwise identical to r9_16384_stepped.

Run (real TPU, background): python benchmarks/r9_16384_fluid_strong.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from r9_16384_stepped import _ssd_red_chunked

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r9_results.jsonl")
N = 16384


def make_pair_strong():
    """Like make_pair_16k but ~5.5 px displacement, applied via a CHUNKED
    exact warp: the whole-plane halo-6 warp's exact-gather temporaries
    (~8 GB) fragment the allocator enough that the subsequent fluid level
    OOMs even though its own peak fits (r9 series)."""
    import functools

    from opticalflow2d_tpu.ops.resample import upsample_image
    from opticalflow2d_tpu.ops.warp import (
        _bilinear_from_taps, _gather_taps_exact)

    rng = np.random.default_rng(16)
    seed = jnp.asarray(rng.random((N // 64, N // 64), dtype=np.float32))

    @jax.jit
    def blow_up(s):
        x = s
        for _ in range(6):
            nx, ny = x.shape
            x = upsample_image(x, (2 * nx, 2 * ny))
        return x

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("r0", "chunk"))
    def displace_chunk(acc, img, r0: int, chunk: int):
        gi = jax.lax.broadcasted_iota(jnp.float32, (chunk, N), 0) + r0
        gj = jax.lax.broadcasted_iota(jnp.float32, (chunk, N), 1)
        ux = 5.5 * jnp.sin(gi * (2 * np.pi / 1300.0)) * \
            jnp.cos(gj * (2 * np.pi / 1700.0))
        uy = -4.5 * jnp.cos(gi * (2 * np.pi / 1100.0)) * \
            jnp.sin(gj * (2 * np.pi / 900.0))
        px = gi + ux
        py = gj + uy
        value, weight, in_b = _bilinear_from_taps(
            img[None], px, py, _gather_taps_exact)
        ok = in_b & (weight != 0)
        safe_w = jnp.where(weight != 0, weight, 1.0)
        rows = jnp.where(ok, value[0] / safe_w, img[r0:r0 + chunk])
        return jax.lax.dynamic_update_slice(acc, rows, (r0, 0))

    iref = blow_up(seed)
    imov = jnp.zeros((N, N), jnp.float32)
    for r0 in range(0, N, 2048):
        imov = displace_chunk(imov, iref, r0, 2048)
    float(jnp.sum(imov))
    return iref, imov


def main():
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register_phased

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "e2e_16384_fluid_strong", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    iref, imov = make_pair_strong()
    cfg = RegConfig(method=Method.FLUID, mu=0.25, lam=0.0,
                    niter=(25, 25, 25), nscales=2)
    try:
        t0 = time.perf_counter()
        res = register_phased(iref, imov, cfg)
        float(jnp.sum(res.motion))
        cold = time.perf_counter() - t0
        red = _ssd_red_chunked(iref, imov, res.motion)
        emit({"ok": True, "n": N, "nscales": 2, "cold_s": round(cold, 1),
              "ssd_red": round(red, 4),
              "iters": [int(t.iterations) for t in res.traces],
              "regrids": [int(t.regrids) for t in res.traces],
              "fallbacks": [int(t.fallbacks) for t in res.traces]})
    except Exception as e:
        import traceback as _tb

        frames = [f"{f.filename.split('/')[-1]}:{f.lineno}"
                  for f in _tb.extract_tb(e.__traceback__)
                  if "repo" in f.filename or "r9_" in f.filename]
        emit({"error": type(e).__name__, "msg": str(e)[:300],
              "where": frames[-6:]})
    fh.close()


if __name__ == "__main__":
    main()
