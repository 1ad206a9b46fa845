"""Quality evaluation: all six methods vs the C++ oracle on a synthetic
deformable pair — the evidence table behind PARITY.md (SSD reduction +
endpoint error vs oracle, per method).

Runs on CPU (prefix `PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu`).
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from conftest import make_pair
    from oracle_utils import run_oracle, endpoint_error
    from opticalflow2d_tpu import register, RegConfig, Method, CompatFlags
    from opticalflow2d_tpu.metrics import ssd_reduction

    iref, imov = make_pair(64, 56, shift=(1.8, -1.1))
    compat = CompatFlags(maxabs_bug=True, conv_flatwrap=True)

    rows = []
    configs = [
        ("diffusion", Method.DIFFUSION, [0.5], {}),
        ("curvature", Method.CURVATURE, [0.1, 1.0], {}),
        ("elastic", Method.ELASTIC, [0.5, 0.0], dict(sor_ordering="lexicographic")),
        ("thirions", Method.THIRIONS_DEMONS, [1.0, 0.25, 2.0, 2.0, 5, 0], {}),
        ("diffeo", Method.DIFFEOMORPHIC_DEMONS, [1.0, 0.25, 2.0, 2.0, 5], {}),
        ("fluid", Method.FLUID, [0.25, 0.0], dict(sor_ordering="lexicographic")),
    ]
    niter = [30, 20]
    print(f"{'method':10s} {'SSD red (ours)':>14s} {'SSD red (C++)':>14s} "
          f"{'EE vs oracle':>13s}")
    for name, method, params, kw in configs:
        u_ref, war_ref = run_oracle(iref, imov, 1, 1, int(method), params, niter)
        cfg = RegConfig.from_regparams(
            method, niter, 1, params, 1, compat=compat, warp_halo=0, **kw
        )
        res = register(iref, imov, cfg)
        red_ours = float(ssd_reduction(jnp.asarray(iref), jnp.asarray(imov), res.motion))
        ssd0 = ((iref - imov) ** 2).sum()
        red_cpp = 1.0 - ((iref - war_ref) ** 2).sum() / ssd0
        ee = endpoint_error(np.asarray(res.motion, np.float64), u_ref)
        print(f"{name:10s} {red_ours:14.4f} {red_cpp:14.4f} {ee:13.2e}")
        rows.append((name, red_ours, red_cpp, ee))

    worst_ee = max(r[3] for r in rows)
    print(f"\nmax endpoint error vs C++ oracle: {worst_ee:.2e} px")


if __name__ == "__main__":
    main()
