"""bf16 accuracy study: per-family endpoint error and SSD reduction of
bfloat16 registration vs the float32 run (VERDICT round-1 item 8).

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/bf16_study.py
    python benchmarks/bf16_study.py          # on TPU (same table on-chip)

Prints a markdown table (one row per (family, size)) and a supported-dtype
verdict per family. The f32 run is the accuracy anchor: round-1 parity
tests pin f32 to the C++ oracle at <=1e-6 px, so EE(bf16, f32) measures the
full bf16 error.
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from conftest import make_pair  # noqa: E402
from opticalflow2d_tpu import register, RegConfig, Method  # noqa: E402
from opticalflow2d_tpu.metrics import ssd_reduction, endpoint_error  # noqa: E402

FAMILIES = [
    (Method.DIFFUSION, dict(alpha=0.5)),
    (Method.CURVATURE, dict(alpha=0.1, tau=1.0)),
    (Method.ELASTIC, dict(mu=0.5, lam=0.0)),
    (Method.FLUID, dict(mu=0.25, lam=0.0)),
    (Method.THIRIONS_DEMONS, {}),
    (Method.DIFFEOMORPHIC_DEMONS, {}),
]

SIZES = [(48, 40, (1.5, -0.8)), (128, 128, (2.5, -1.5))]


def main():
    print(f"backend: {jax.default_backend()}")
    rows = []
    for nx, ny, shift in SIZES:
        iref, imov = make_pair(nx, ny, shift=shift)
        ir, im = jnp.asarray(iref), jnp.asarray(imov)
        for method, kw in FAMILIES:
            base = dict(method=method, niter=(30, 15), nscales=1,
                        warp_halo=0, warp_halo_outer=0, **kw)
            f32 = register(iref, imov, RegConfig(dtype="float32", **base))
            bf16 = register(iref, imov, RegConfig(dtype="bfloat16", **base))
            u32 = f32.motion
            u16 = jnp.asarray(bf16.motion, jnp.float32)
            ee = float(endpoint_error(u16, u32))
            maxee = float(jnp.max(jnp.sqrt(
                (u16[0] - u32[0]) ** 2 + (u16[1] - u32[1]) ** 2)))
            red32 = float(ssd_reduction(ir, im, u32))
            red16 = float(ssd_reduction(ir, im, u16))
            it32 = [int(t.iterations) for t in f32.traces]
            it16 = [int(t.iterations) for t in bf16.traces]
            rows.append((method.name.lower(), f"{nx}x{ny}", ee, maxee,
                         red32, red16, it32, it16))

    print("\n| family | size | mean EE (px) | max EE (px) | SSD red f32 | "
          "SSD red bf16 | iters f32 | iters bf16 |")
    print("|---|---|---|---|---|---|---|---|")
    for name, size, ee, maxee, r32, r16, i32, i16 in rows:
        print(f"| {name} | {size} | {ee:.3g} | {maxee:.3g} | {r32:.3f} | "
              f"{r16:.3f} | {i32} | {i16} |")

    print("\nverdicts (mean EE < 0.1 px and SSD within 0.05 of f32 at both "
          "sizes = 'safe'):")
    for method, _ in FAMILIES:
        fam = [r for r in rows if r[0] == method.name.lower()]
        safe = all(r[2] < 0.1 and r[5] > r[4] - 0.05 for r in fam)
        print(f"  {method.name.lower()}: {'safe' if safe else 'DEGRADED'}")


if __name__ == "__main__":
    main()
