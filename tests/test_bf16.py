"""bf16 accuracy assertions: registration in bfloat16 vs float32 for ALL
six families, with per-family tolerances calibrated from the bf16 study
(``benchmarks/bf16_study.py``; table in benchmarks/RESULTS.md).

Verdicts from the study (two sizes, 48x40 and 128x128):
- diffusion / curvature / elastic: safe (mean EE <= 6e-3 px).
- thirions / diffeomorphic demons: safe (mean EE <= 0.09 px; the per-
  iteration re-warp accumulates rounding but quality is preserved).
- fluid: DEGRADED trajectory — the adaptive timestep ``dumax / max|r|`` is
  computed from a bf16 max, so the dt sequence (and early-stop iteration
  counts) diverge from f32; registration QUALITY stays high. Use f32 for
  fluid when trajectory reproducibility matters.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import make_pair
from opticalflow2d_tpu import register, RegConfig, Method
from opticalflow2d_tpu.metrics import ssd_reduction, endpoint_error


def _run_pair(method, kw, size=(48, 40)):
    iref, imov = make_pair(*size, shift=(1.5, -0.8))
    base = dict(method=method, niter=(30, 15), nscales=1,
                warp_halo=0, warp_halo_outer=0, **kw)
    f32 = register(iref, imov, RegConfig(dtype="float32", **base))
    bf16 = register(iref, imov, RegConfig(dtype="bfloat16", **base))
    u32 = f32.motion
    u16 = jnp.asarray(bf16.motion, jnp.float32)
    ir, im = jnp.asarray(iref), jnp.asarray(imov)
    return dict(
        ee=float(endpoint_error(u16, u32)),
        red32=float(ssd_reduction(ir, im, u32)),
        red16=float(ssd_reduction(ir, im, u16)),
        dtype=bf16.motion.dtype,
    )


@pytest.mark.parametrize(
    "method,kw,ee_tol",
    [
        (Method.DIFFUSION, dict(alpha=0.5), 0.02),
        (Method.CURVATURE, dict(alpha=0.1, tau=1.0), 0.02),
        (Method.ELASTIC, dict(mu=0.5, lam=0.0), 0.01),
        (Method.THIRIONS_DEMONS, {}, 0.15),
        (Method.DIFFEOMORPHIC_DEMONS, {}, 0.15),
    ],
    ids=["diffusion", "curvature", "elastic", "thirions", "diffeo"],
)
def test_bf16_safe_families(method, kw, ee_tol):
    r = _run_pair(method, kw)
    assert r["dtype"] == jnp.bfloat16
    # Within the calibrated distance of the f32 field and a modest fraction
    # of its registration quality.
    assert r["ee"] < ee_tol, r
    assert r["red16"] > r["red32"] - 0.05, r


def test_bf16_fluid_quality_preserved_trajectory_degraded():
    r = _run_pair(Method.FLUID, dict(mu=0.25, lam=0.0))
    # The documented bf16 limitation: the adaptive-dt trajectory drifts
    # (study: mean EE ~0.1 px, max ~3 px, different early-stop counts), but
    # the registration itself stays strong.
    assert r["red16"] > 0.9, r
    assert r["ee"] < 1.0, r
