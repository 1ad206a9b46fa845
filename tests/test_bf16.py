"""bf16 accuracy study: registration in bfloat16 vs float32 (the TPU
low-precision mode; STATUS.md roadmap item)."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import make_pair
from opticalflow2d_tpu import register, RegConfig, Method
from opticalflow2d_tpu.metrics import ssd_reduction, endpoint_error


@pytest.mark.parametrize(
    "method,kw",
    [
        (Method.DIFFUSION, dict(alpha=0.5)),
        (Method.THIRIONS_DEMONS, {}),
        (Method.FLUID, dict(mu=0.25, lam=0.0)),
    ],
    ids=["diffusion", "thirions", "fluid"],
)
def test_bf16_registration_quality(method, kw):
    iref, imov = make_pair(48, 40, shift=(1.5, -0.8))
    base = dict(method=method, niter=(30, 15), nscales=1,
                warp_halo=0, warp_halo_outer=0, **kw)
    f32 = register(iref, imov, RegConfig(dtype="float32", **base))
    bf16 = register(iref, imov, RegConfig(dtype="bfloat16", **base))

    ir = jnp.asarray(iref)
    im = jnp.asarray(imov)
    red_f32 = float(ssd_reduction(ir, im, f32.motion))
    red_bf16 = float(ssd_reduction(ir, im, jnp.asarray(bf16.motion, jnp.float32)))
    ee = float(
        endpoint_error(
            jnp.asarray(bf16.motion, jnp.float32), f32.motion
        )
    )
    # bf16 (8-bit mantissa) should stay within a modest fraction of the f32
    # registration quality and a sub-pixel distance of the f32 field.
    assert red_bf16 > red_f32 - 0.15, (red_f32, red_bf16)
    assert ee < 0.5, ee
