"""Temporal-blocked diffusion kernel vs the single-step paths
(interpret mode on CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

requires_8 = pytest.mark.skipif(
    "len(jax.devices()) < 8", reason="needs 8 virtual devices"
)

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


def test_strip_kernel_matches_whole_image(rng):
    """diffusion_block_strip on 4 strips (halo rows carved from the full
    field, zeros beyond the global edge — what _halo_exchange_k provides)
    must reproduce the whole-image blocked kernel exactly."""
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_strip, required_pad,
    )

    nx, ny, k, strips = 64, 48, 4, 4
    u, d = _setup(nx, ny, rng)
    g = stack_derivs(d.grad_i, d.it)
    pad = required_pad(k)
    nxl = nx // strips

    with pltpu.force_tpu_interpret_mode():
        want, want_sums = diffusion_block_pallas(u, g, alpha=0.5, k=k, tb=16)
        up = jnp.pad(u, ((0, 0), (pad, pad), (0, 0)))
        gp = jnp.pad(g, ((0, 0), (pad, pad), (0, 0)))
        outs, sums = [], []
        for s in range(strips):
            r0 = s * nxl
            o, sm = diffusion_block_strip(
                up[:, r0:r0 + nxl + 2 * pad], gp[:, r0:r0 + nxl + 2 * pad],
                r0, alpha=0.5, k=k, nx_glob=nx, tb=16,
            )
            outs.append(o)
            sums.append(sm)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sum(sums)), np.asarray(want_sums), rtol=1e-5, atol=1e-4
    )


@requires_8
def test_register_sp_blocked_diffusion_matches_serial():
    """make_register_sp(diffusion, use_pallas + block_k) on the 8-device
    CPU mesh (interpret mode) vs the serial driver: one pad-row halo
    exchange per k iterations instead of per iteration."""
    from opticalflow2d_tpu import register, RegConfig, Method
    from opticalflow2d_tpu.parallel import make_mesh
    from opticalflow2d_tpu.parallel.spatial import make_register_sp

    mesh = make_mesh(data=1, x=8)
    iref, imov = make_pair(64, 48, shift=(1.2, -0.7))
    solve = make_register_sp(mesh, "diffusion", niter=[8, 6], nscales=1,
                             halo=4, use_pallas=True, block_k=4, alpha=0.5)
    with pltpu.force_tpu_interpret_mode():
        u, iters = solve(jnp.asarray(iref), jnp.asarray(imov))

    cfg = RegConfig(method=Method.DIFFUSION, alpha=0.5, niter=(8, 6),
                    nscales=1, warp_halo=4, warp_halo_outer=4)
    res = register(iref, imov, cfg)
    assert [int(x) for x in np.asarray(iters)] == [
        int(t.iterations) for t in res.traces
    ]
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(res.motion), rtol=1e-4, atol=1e-5
    )


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
    from opticalflow2d_tpu.pallas_kernels import MB

    assert _pick_tiles(1024, 8, None) == (128, 8, None)
    assert _pick_tiles(1024, 16, 128) == (128, 16, None)
    assert _pick_tiles(1024, 9, None) == (128, 16, None)
    # explicit tb still allowed (tier vmem limit rides along)
    assert _pick_tiles(1024, 8, 256) == (256, 8, None)
    assert _pick_tiles(12, 8, None) is None  # 12 not divisible by 8
    # Wider lane extents pick smaller tiles + raised Mosaic vmem limits
    # (the measured tier table; Mosaic's default 16M budget was
    # compile-FLAKY at ny >= 2048 — see pallas_kernels.__init__).
    assert _pick_tiles(2048, 16, None, ny=2048) == (64, 16, 32 * MB)
    assert _pick_tiles(2048, 8, None, ny=2048) == (64, 8, 32 * MB)
    # Error sums add reduction scratch -> their own tier (48M @2048):
    # measured 76.5 (k8) / 83.5 (k16) us/iter vs 119-123 for the
    # single-step fallback. (An r9 short-loop sweep briefly suggested
    # tb=64 for k=16; the back-to-back long-loop A/B refuted it —
    # RESULTS.md r9 Logger-tax section — so 128 stands.)
    assert _pick_tiles(2048, 16, None, ny=2048, with_errors=True) \
        == (128, 16, 48 * MB)
    assert _pick_tiles(2048, 8, None, ny=2048, with_errors=True) \
        == (128, 8, 48 * MB)
    assert _pick_tiles(1024, 16, None, ny=1024, with_errors=True) \
        == (128, 16, None)
    # k=16 @4096 without sums prefers the smaller tile (205.7 vs 294.0).
    assert _pick_tiles(4096, 16, None, ny=4096) == (32, 16, 64 * MB)
    assert _pick_tiles(4096, 8, None, ny=4096) == (64, 8, 64 * MB)
    assert _pick_tiles(4096, 16, None, ny=4096, with_errors=True) \
        == (64, 16, 64 * MB)
    with pytest.raises(ValueError):
        diffusion_block_pallas(
            jnp.zeros((2, 12, 40)), jnp.zeros((3, 12, 40)), alpha=0.5, k=8
        )
