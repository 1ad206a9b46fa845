"""Temporal-blocked diffusion kernel vs the single-step paths
(interpret mode on CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from conftest import make_pair
from opticalflow2d_tpu.solvers.base import derivatives
from opticalflow2d_tpu.solvers.diffusion import diffusion_step
from opticalflow2d_tpu.pallas_kernels.diffusion_fused import diffusion_step_pallas
from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
    diffusion_block_pallas,
    stack_derivs,
    _pick_tiles,
)


def _setup(nx, ny, rng, shift=(1.2, -0.7)):
    iref, imov = make_pair(nx, ny, shift=shift)
    d = derivatives(jnp.asarray(iref), jnp.asarray(imov))
    u = jnp.asarray(rng.standard_normal((2, nx, ny)).astype(np.float32))
    return u, d


@pytest.mark.parametrize("shape,k,tb", [
    ((64, 48), 4, 16),    # pad=8, interior block
    ((64, 48), 8, 32),    # pad=8=k (tight cone)
    ((64, 48), 16, 64),   # pad=16, single row-block (nblocks=1)
    ((48, 40), 5, None),  # auto tile, k not multiple of 8
    ((96, 40), 12, 48),   # pad=16 > k, three blocks
])
def test_block_matches_iterated_single_step(shape, k, tb, rng):
    """Interior must be bit-identical to k calls of the single-step kernel
    (same op order); we assert to float tolerance to stay robust in
    interpret mode."""
    nx, ny = shape
    u, d = _setup(nx, ny, rng)
    g = stack_derivs(d.grad_i, d.it)

    with pltpu.force_tpu_interpret_mode():
        want = u
        for _ in range(k):
            want = diffusion_step_pallas(want, d.grad_i, d.it, alpha=0.5)
        got, sums = diffusion_block_pallas(u, g, alpha=0.5, k=k, tb=tb)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7
    )
    assert sums.shape == (k, 2)


def test_block_matches_jnp_loop(rng):
    nx, ny = 64, 48
    u, d = _setup(nx, ny, rng)
    g = stack_derivs(d.grad_i, d.it)
    want = u
    for _ in range(8):
        want = diffusion_step(want, d, 0.7)
    with pltpu.force_tpu_interpret_mode():
        got, _ = diffusion_block_pallas(u, g, alpha=0.7, k=8)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_block_error_sums_match_explicit(rng):
    """Per-iteration (step magnitude, prev magnitude) sums must equal the
    explicitly computed motion_norm sums of the serial iterates."""
    from opticalflow2d_tpu.ops.reduce import motion_norm

    nx, ny = 64, 48
    u, d = _setup(nx, ny, rng)
    g = stack_derivs(d.grad_i, d.it)
    k = 6
    want = []
    prev = u
    for _ in range(k):
        nxt = diffusion_step(prev, d, 0.5)
        want.append((
            float(motion_norm(nxt - prev)) * nx * ny,
            float(motion_norm(prev)) * nx * ny,
        ))
        prev = nxt
    with pltpu.force_tpu_interpret_mode():
        _, sums = diffusion_block_pallas(u, g, alpha=0.5, k=k, tb=16)
    np.testing.assert_allclose(
        np.asarray(sums), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_block_zero_init_first_error_guard(rng):
    """From u=0 the first iteration's prev-magnitude sum is exactly 0 (the
    driver's rel-error guard divides conditionally)."""
    nx, ny = 48, 40
    _, d = _setup(nx, ny, rng)
    g = stack_derivs(d.grad_i, d.it)
    with pltpu.force_tpu_interpret_mode():
        _, sums = diffusion_block_pallas(
            jnp.zeros((2, nx, ny)), g, alpha=0.5, k=4
        )
    assert float(sums[0, 1]) == 0.0
    assert float(sums[1, 1]) > 0.0


@pytest.mark.parametrize("niter,k", [
    (12, 4),   # niter a block multiple
    (10, 4),   # partial final block (niter cap mid-block)
    (200, 8),  # early convergence fires mid-block
])
def test_register_blocked_matches_unblocked(niter, k):
    """The blocked driver must reproduce the single-step Pallas driver's
    motion, iteration count, and error trace exactly (partial final blocks
    are recomputed with the single-step kernel)."""
    from opticalflow2d_tpu import register, RegConfig, Method

    iref, imov = make_pair(48, 40, shift=(1.5, -0.8))
    base = RegConfig(method=Method.DIFFUSION, niter=(niter,), nscales=0,
                     alpha=0.1, use_pallas=True, pallas_block_k=1)
    blk = RegConfig(method=Method.DIFFUSION, niter=(niter,), nscales=0,
                    alpha=0.1, use_pallas=True, pallas_block_k=k)
    with pltpu.force_tpu_interpret_mode():
        want = register(iref, imov, base)
        got = register(iref, imov, blk)
    assert int(got.traces[0].iterations) == int(want.traces[0].iterations)
    np.testing.assert_allclose(
        np.asarray(got.motion), np.asarray(want.motion), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(got.traces[0].errors), np.asarray(want.traces[0].errors),
        rtol=1e-4, atol=1e-6
    )
    if niter == 200:  # sanity: the early stop actually fired mid-run
        assert int(got.traces[0].iterations) < niter


def test_register_blocked_pyramid_and_fallback():
    """Pyramid run: levels with a valid tiling use the blocked kernel,
    untileable row counts (44 rows with k=8 -> pad 8, no divisor) silently
    fall back to the single-step path; results match the unblocked driver."""
    from opticalflow2d_tpu import register, RegConfig, Method

    from opticalflow2d_tpu.pallas_kernels.diffusion_block import _pick_tiles
    assert _pick_tiles(44, 8, None) is None
    iref, imov = make_pair(88, 64, shift=(1.5, -0.8))  # level 1: 44x32
    base = RegConfig(method=Method.DIFFUSION, niter=(10, 8), nscales=1,
                     alpha=0.1, use_pallas=True, pallas_block_k=1)
    blk = RegConfig(method=Method.DIFFUSION, niter=(10, 8), nscales=1,
                    alpha=0.1, use_pallas=True, pallas_block_k=8)
    with pltpu.force_tpu_interpret_mode():
        want = register(iref, imov, base)
        got = register(iref, imov, blk)
    np.testing.assert_allclose(
        np.asarray(got.motion), np.asarray(want.motion), rtol=1e-6, atol=1e-6
    )


def test_pick_tiles_and_invalid_raise():
    assert _pick_tiles(1024, 8, None) == (128, 8)
    assert _pick_tiles(1024, 16, 128) == (128, 16)
    assert _pick_tiles(1024, 9, None) == (128, 16)
    assert _pick_tiles(1024, 8, 256) == (256, 8)  # explicit tb still allowed
    assert _pick_tiles(12, 8, None) is None  # 12 not divisible by 8
    with pytest.raises(ValueError):
        diffusion_block_pallas(
            jnp.zeros((2, 12, 40)), jnp.zeros((3, 12, 40)), alpha=0.5, k=8
        )
