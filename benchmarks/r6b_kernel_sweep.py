"""Round-6b: (a) one-pass Thirion sweep with the halo_c compose-chain cut
and clamped BlockSpec halos; (b) fused fluid iteration kernel sweep vs the
jnp fluid chain.

Run (real TPU, single process, background):
  python benchmarks/r6b_kernel_sweep.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from opticalflow2d_tpu.pallas_kernels.demons_onepass import (
    thirion_onepass_pallas,
)
from opticalflow2d_tpu.pallas_kernels.fluid_fused import fluid_iter_pallas
from opticalflow2d_tpu.pallas_kernels.diffusion_block import stack_derivs
from opticalflow2d_tpu.solvers.base import derivatives
from opticalflow2d_tpu.solvers.fluid import make_fluid_step
from opticalflow2d_tpu.utils.profiling import kernel_timer

SI, SX, SF, SD, KW, HALO = 1.0, 0.25, 2.0, 2.0, 5, 2
MU, LAM, OMEGA = 0.25, 0.0, 1.5


def make_fields(n, seed=0):
    rng = np.random.default_rng(seed)
    iref = jnp.asarray(rng.random((n, n), dtype=np.float32))
    iaux = jnp.asarray(rng.random((n, n), dtype=np.float32))
    u = jnp.asarray(rng.uniform(-1.4, 1.4, size=(2, n, n)).astype(np.float32))
    return iref, iaux, u


def emit(row, fh):
    print(json.dumps(row), flush=True)
    fh.write(json.dumps(row) + "\n")
    fh.flush()


def main():
    out = open("benchmarks/r6_results.jsonl", "a")
    plan = [
        (1024, (64, 128, 256), 200, 1000),
        (2048, (32, 64, 128), 100, 400),
        (4096, (16, 32, 64), 30, 120),
    ]
    # ny=8192 one-pass attempts are excluded: the axon relay rejects the
    # compiled program ("length limit exceeded" / broken pipe) — recorded
    # in r6_results.jsonl.
    if os.environ.get("OF2D_SWEEP_ONEPASS"):
      for n, tbs, lo, hi in plan:
        iref, iaux, u = make_fields(n)
        for tb in tbs:
            try:
                def step(v, tb=tb):
                    return thirion_onepass_pallas(
                        iaux, iref, v, SI, SX, SF, SD, KW, HALO,
                        addition=False, tb=tb)

                s = kernel_timer(step, u, iters_lo=lo, iters_hi=hi)
                row = {"kernel": "onepass halo_c", "n": n, "tb": tb,
                       "us_per_iter": round(s * 1e6, 1)}
            except Exception as e:
                row = {"kernel": "onepass halo_c", "n": n, "tb": tb,
                       "error": type(e).__name__, "msg": str(e)[:160]}
            emit(row, out)

    # Fused fluid iteration: time the full step (kernel + dt/Euler tail)
    # and the jnp chain it replaces.
    for n, tbs, lo, hi in plan:
        iref, imov, u = make_fields(n, seed=1)
        d = derivatives(iref, imov)
        g = stack_derivs(d.grad_i, d.it)
        vel0 = jnp.zeros_like(u)

        for tb in tbs:
            try:
                def step(carry, tb=tb):
                    uu, vv = carry
                    vv, r, maxsq = fluid_iter_pallas(
                        uu, vv, g, MU, LAM, OMEGA, True, False, tb=tb)
                    m = jnp.sqrt(maxsq)
                    dt = 0.65 / m
                    do = dt < 65.0
                    uu = jnp.where(do, uu + r * jnp.where(do, dt, 0.0), uu)
                    return (uu, vv)

                s = kernel_timer(step, (u, vel0), iters_lo=lo, iters_hi=hi)
                row = {"kernel": "fluid fused step", "n": n, "tb": tb,
                       "us_per_iter": round(s * 1e6, 1)}
            except Exception as e:
                row = {"kernel": "fluid fused step", "n": n, "tb": tb,
                       "error": type(e).__name__, "msg": str(e)[:160]}
            emit(row, out)

        if n <= 4096:
            try:
                jstep = make_fluid_step(MU, LAM, OMEGA, use_pallas=False)

                def stepj(carry):
                    uu, vv = carry
                    uu, vv, _dt = jstep(uu, vv, d)
                    return (uu, vv)

                s = kernel_timer(stepj, (u, vel0), iters_lo=lo, iters_hi=hi)
                row = {"kernel": "fluid jnp step", "n": n,
                       "us_per_iter": round(s * 1e6, 1)}
            except Exception as e:
                row = {"kernel": "fluid jnp step", "n": n,
                       "error": type(e).__name__, "msg": str(e)[:160]}
            emit(row, out)
    out.close()


if __name__ == "__main__":
    main()
