"""Pallas kernel correctness vs the jnp reference path (interpret mode on
CPU; the same kernels compile with Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from conftest import make_pair
from opticalflow2d_tpu.solvers.base import derivatives
from opticalflow2d_tpu.solvers.diffusion import diffusion_step
from opticalflow2d_tpu.pallas_kernels.diffusion_fused import diffusion_step_pallas


@pytest.mark.parametrize("shape,tb", [((64, 48), 16), ((64, 48), 64), ((48, 40), 8)])
def test_diffusion_pallas_matches_jnp(shape, tb, rng):
    nx, ny = shape
    iref, imov = make_pair(nx, ny, shift=(1.2, -0.7))
    d = derivatives(jnp.asarray(iref), jnp.asarray(imov))
    u = jnp.asarray(rng.standard_normal((2, nx, ny)).astype(np.float32))

    want = diffusion_step(u, d, 0.5)
    with pltpu.force_tpu_interpret_mode():
        got = diffusion_step_pallas(u, d.grad_i, d.it, alpha=0.5, tb=tb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_diffusion_pallas_iterated(rng):
    nx, ny = 32, 32
    iref, imov = make_pair(nx, ny, shift=(1.0, -0.5))
    d = derivatives(jnp.asarray(iref), jnp.asarray(imov))
    u_a = jnp.zeros((2, nx, ny))
    u_b = jnp.zeros((2, nx, ny))
    with pltpu.force_tpu_interpret_mode():
        for _ in range(5):
            u_a = diffusion_step_pallas(u_a, d.grad_i, d.it, alpha=0.5, tb=16)
            u_b = diffusion_step(u_b, d, 0.5)
    np.testing.assert_allclose(np.asarray(u_a), np.asarray(u_b), rtol=1e-5, atol=1e-6)


def test_register_with_pallas_diffusion_matches_jnp():
    from opticalflow2d_tpu import register, RegConfig, Method

    iref, imov = make_pair(32, 32, shift=(1.0, -0.5))
    base = RegConfig(method=Method.DIFFUSION, niter=(10,), nscales=0,
                     alpha=0.5, warp_halo=0, warp_halo_outer=0)
    pal = RegConfig(method=Method.DIFFUSION, niter=(10,), nscales=0,
                    alpha=0.5, warp_halo=0, warp_halo_outer=0, use_pallas=True)
    want = register(iref, imov, base)
    with pltpu.force_tpu_interpret_mode():
        got = register(iref, imov, pal)
    np.testing.assert_allclose(
        np.asarray(got.motion), np.asarray(want.motion), rtol=1e-5, atol=1e-6
    )


def test_warp_pallas_matches_jnp(rng):
    from opticalflow2d_tpu.ops.warp import warp2d
    from opticalflow2d_tpu.pallas_kernels.warp_fused import warp2d_pallas

    nx, ny = 64, 48
    img = jnp.asarray(rng.standard_normal((nx, ny)).astype(np.float32))
    u = jnp.asarray(
        np.clip(1.5 * rng.standard_normal((2, nx, ny)), -1.9, 1.9).astype(np.float32)
    )
    want = warp2d(img, u)
    with pltpu.force_tpu_interpret_mode():
        got = warp2d_pallas(img, u, halo=2, tb=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_compose_pallas_matches_jnp(rng):
    from opticalflow2d_tpu.ops.warp import compose
    from opticalflow2d_tpu.pallas_kernels.warp_fused import compose_pallas

    nx, ny = 64, 48
    u_total = jnp.asarray(
        np.clip(2.0 * rng.standard_normal((2, nx, ny)), -4, 4).astype(np.float32)
    )
    u_inc = jnp.asarray(
        np.clip(1.0 * rng.standard_normal((2, nx, ny)), -1.9, 1.9).astype(np.float32)
    )
    want = compose(u_total, u_inc)
    with pltpu.force_tpu_interpret_mode():
        got = compose_pallas(u_total, u_inc, halo=2, tb=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_register_demons_with_pallas_warp_matches():
    """Full demons registration with use_pallas (interpret mode) vs jnp."""
    from opticalflow2d_tpu import register, RegConfig, Method

    iref, imov = make_pair(32, 32, shift=(1.0, -0.5))
    base = RegConfig(method=Method.THIRIONS_DEMONS, niter=(6,), nscales=0,
                     warp_halo=2, warp_halo_outer=2)
    pal = RegConfig(method=Method.THIRIONS_DEMONS, niter=(6,), nscales=0,
                    warp_halo=2, warp_halo_outer=2, use_pallas=True)
    want = register(iref, imov, base)
    with pltpu.force_tpu_interpret_mode():
        got = register(iref, imov, pal)
    np.testing.assert_allclose(
        np.asarray(got.motion), np.asarray(want.motion), rtol=1e-5, atol=1e-6
    )
