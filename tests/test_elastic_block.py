"""Temporal-blocked elastic SOR kernel vs the serial red-black step
(interpret mode on CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from conftest import make_pair
from opticalflow2d_tpu.solvers.base import derivatives
from opticalflow2d_tpu.solvers.elastic import elastic_step
from opticalflow2d_tpu.pallas_kernels.diffusion_block import stack_derivs
from opticalflow2d_tpu.pallas_kernels.elastic_block import (
    elastic_block_pallas,
    _pick_tiles,
)

MU, LAM, OMEGA = 0.25, 0.1, 1.5


def _setup(nx, ny, rng):
    iref, imov = make_pair(nx, ny, shift=(1.2, -0.7))
    d = derivatives(jnp.asarray(iref), jnp.asarray(imov))
    u = jnp.asarray(rng.standard_normal((2, nx, ny)).astype(np.float32))
    # Borders start at zero, as in the driver (SOR never touches them).
    u = u.at[:, 0, :].set(0).at[:, -1, :].set(0)
    u = u.at[:, :, 0].set(0).at[:, :, -1].set(0)
    return u, d


@pytest.mark.parametrize("shape,k,tb,ref_stencil", [
    ((64, 48), 2, 16, True),    # pad=8, interior blocks
    ((64, 48), 4, 32, True),    # pad=8=2k (tight cone)
    ((64, 48), 8, 64, True),    # pad=16, single row-block
    ((48, 40), 3, None, True),  # auto tile, odd k
    ((96, 40), 4, 48, False),   # corrected symmetric stencil
])
def test_block_matches_iterated_elastic_step(shape, k, tb, ref_stencil, rng):
    nx, ny = shape
    u, d = _setup(nx, ny, rng)
    g = stack_derivs(d.grad_i, d.it)
    want = u
    for _ in range(k):
        want = elastic_step(want, d, MU, LAM, OMEGA, ref_stencil, "redblack")
    with pltpu.force_tpu_interpret_mode():
        got, sums = elastic_block_pallas(
            u, g, MU, LAM, OMEGA, ref_stencil, k=k, tb=tb
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )
    assert sums.shape == (k, 2)


def test_block_error_sums_match_explicit(rng):
    from opticalflow2d_tpu.ops.reduce import motion_norm

    nx, ny = 64, 48
    u, d = _setup(nx, ny, rng)
    g = stack_derivs(d.grad_i, d.it)
    k = 4
    want = []
    prev = u
    for _ in range(k):
        nxt = elastic_step(prev, d, MU, LAM, OMEGA, True, "redblack")
        want.append((
            float(motion_norm(nxt - prev)) * nx * ny,
            float(motion_norm(prev)) * nx * ny,
        ))
        prev = nxt
    with pltpu.force_tpu_interpret_mode():
        _, sums = elastic_block_pallas(u, g, MU, LAM, OMEGA, True, k=k, tb=16)
    np.testing.assert_allclose(
        np.asarray(sums), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_pick_tiles_cone_is_2k():
    from opticalflow2d_tpu.pallas_kernels import MB

    assert _pick_tiles(1024, 4, None) == (128, 8, 48 * MB)
    assert _pick_tiles(1024, 8, None) == (128, 16, 48 * MB)
    assert _pick_tiles(1024, 16, None) == (128, 32, 48 * MB)
    # explicit tb still allowed (tier vmem limit rides along)
    assert _pick_tiles(1024, 4, 128) == (128, 8, 48 * MB)
    assert _pick_tiles(44, 4, None) is None
    # Wider lane extents: measured tiers (64, 32M) @2048 and (64, 48M)
    # @4096 — 318.5 and 1495.2 us/iter vs 381.9 / 2825.6 at the old
    # 16M-feasible tiles.
    assert _pick_tiles(2048, 4, None, ny=2048) == (64, 8, 32 * MB)
    assert _pick_tiles(4096, 4, None, ny=4096) == (64, 8, 48 * MB)
    with pytest.raises(ValueError):
        elastic_block_pallas(
            jnp.zeros((2, 44, 40)), jnp.zeros((3, 44, 40)),
            MU, LAM, OMEGA, k=4
        )


def test_register_sp_blocked_elastic_matches_serial():
    """make_register_sp(elastic, use_pallas + block_k) on the 8-device CPU
    mesh (interpret mode) vs the serial driver."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from opticalflow2d_tpu import register, RegConfig, Method
    from opticalflow2d_tpu.parallel import make_mesh
    from opticalflow2d_tpu.parallel.spatial import make_register_sp

    mesh = make_mesh(data=1, x=8)
    iref, imov = make_pair(64, 48, shift=(1.2, -0.7))
    solve = make_register_sp(mesh, "elastic", niter=[8, 6], nscales=1,
                             halo=4, use_pallas=True, block_k=2,
                             mu=0.5, lam=0.0)
    with pltpu.force_tpu_interpret_mode():
        u, iters = solve(jnp.asarray(iref), jnp.asarray(imov))

    cfg = RegConfig(method=Method.ELASTIC, mu=0.5, lam=0.0, niter=(8, 6),
                    nscales=1, warp_halo=4, warp_halo_outer=4)
    res = register(iref, imov, cfg)
    assert [int(x) for x in np.asarray(iters)] == [
        int(t.iterations) for t in res.traces
    ]
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(res.motion), rtol=1e-4, atol=1e-5
    )


def test_register_blocked_elastic_matches_unblocked():
    """Full registration: blocked elastic driver equals the jnp driver
    (partial final blocks recomputed with elastic_step)."""
    from opticalflow2d_tpu import register, RegConfig, Method

    iref, imov = make_pair(48, 40, shift=(1.5, -0.8))
    base = RegConfig(method=Method.ELASTIC, niter=(10,), nscales=0,
                     mu=MU, lam=LAM, use_pallas=True, pallas_block_k=1)
    blk = RegConfig(method=Method.ELASTIC, niter=(10,), nscales=0,
                    mu=MU, lam=LAM, use_pallas=True, pallas_block_k=4,
                    pallas_block_elastic=True)
    # Diffusion block depth 8 with the elastic depth left on auto: the
    # elastic path must block at min(4, pallas_block_k) = 4, not 8 (k=8
    # tiles as (tb=pad, pad=2k) at wide lane extents — 3x pad overhead).
    blk_auto = RegConfig(method=Method.ELASTIC, niter=(10,), nscales=0,
                         mu=MU, lam=LAM, use_pallas=True, pallas_block_k=8,
                         pallas_block_elastic=True)
    with pltpu.force_tpu_interpret_mode():
        want = register(iref, imov, base)
        got = register(iref, imov, blk)
        got_auto = register(iref, imov, blk_auto)
    assert int(got.traces[0].iterations) == int(want.traces[0].iterations)
    np.testing.assert_allclose(
        np.asarray(got.motion), np.asarray(want.motion), rtol=1e-6, atol=1e-7
    )
    assert int(got_auto.traces[0].iterations) == int(want.traces[0].iterations)
    np.testing.assert_allclose(
        np.asarray(got_auto.motion), np.asarray(want.motion),
        rtol=1e-6, atol=1e-7
    )
