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


def test_single_step_tb_scales_with_lane_extent():
    """The auto row tile must stay in the stable region of Mosaic's
    scoped-vmem wall: tb=256@2048 / tb=64@4096 failed compile on v5e, and
    tb=128@2048 — exactly at the (tb+16)*ny = 294,912-lane wall — proved
    run-to-run flaky (compiled standalone, failed inside a registration
    program), so wide-lane caps back off to the measured-stable tiles."""
    from opticalflow2d_tpu.pallas_kernels.diffusion_fused import (
        _pick_tb_single)

    assert _pick_tb_single(1024, 1024) == 256
    assert _pick_tb_single(2048, 2048) == 64
    assert _pick_tb_single(4096, 4096) == 32
    # Explicit tb is honored when valid, re-searched when not.
    assert _pick_tb_single(2048, 2048, tb=128) == 128
    assert _pick_tb_single(120, 1024, tb=256) == 120
    # Every pick divides nx and is 8-aligned.
    for nx in (64, 120, 256, 1000, 4096):
        for ny in (128, 1024, 2048, 8192):
            tb = _pick_tb_single(nx, ny)
            assert nx % tb == 0 and tb % 8 == 0


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


def test_warp_pallas_strip_sharded_matches_serial(rng):
    """Strip-local Pallas warp under shard_map (8-device CPU mesh,
    interpret mode) vs the serial whole-image warp."""
    from opticalflow2d_tpu.ops.warp import warp2d
    from opticalflow2d_tpu.parallel import make_mesh
    from opticalflow2d_tpu.parallel.spatial import make_warp2d_sharded

    nx, ny = 128, 48  # nxl = 16 per device
    iref, imov = make_pair(nx, ny, shift=(1.2, -0.7))
    img = jnp.asarray(imov)
    u = jnp.asarray(
        np.clip(1.5 * rng.standard_normal((2, nx, ny)), -1.9, 1.9).astype(np.float32)
    )
    want = warp2d(img, u, halo=2)
    mesh = make_mesh(data=1, x=8)
    with pltpu.force_tpu_interpret_mode():
        warp_p = make_warp2d_sharded(mesh, halo=2, use_pallas=True)
        got = warp_p(img, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_compose_pallas_strip_sharded_matches_serial(rng):
    """Strip-local Pallas compose under shard_map vs serial compose."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from opticalflow2d_tpu.ops.warp import compose
    from opticalflow2d_tpu.parallel import make_mesh
    from opticalflow2d_tpu.parallel.spatial import _compose_local_pallas

    nx, ny = 128, 48
    u_total = jnp.asarray(
        np.clip(2.0 * rng.standard_normal((2, nx, ny)), -4, 4).astype(np.float32)
    )
    u_inc = jnp.asarray(
        np.clip(1.0 * rng.standard_normal((2, nx, ny)), -1.9, 1.9).astype(np.float32)
    )
    want = compose(u_total, u_inc, halo=2)
    mesh = make_mesh(data=1, x=8)
    spec = P(None, "x", None)
    f = shard_map(
        lambda a, b: _compose_local_pallas(a, b, 2, "x"),
        mesh=mesh, in_specs=(spec, spec), out_specs=spec, check_vma=False,
    )
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(f)(u_total, u_inc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_demons_step_sharded_pallas_matches(rng):
    """Explicit-SP demons step with use_pallas (strip-local fused kernels,
    incl. exp-map squarings) vs the jnp strip path, 8-device CPU mesh."""
    from opticalflow2d_tpu.parallel import make_mesh
    from opticalflow2d_tpu.parallel.spatial import make_demons_step_sharded

    nx, ny = 128, 48
    iref, imov = make_pair(nx, ny, shift=(1.3, -0.9))
    # Texture keeps |grad I| non-degenerate: in flat regions the demons
    # force denominator underflows and ulp-level warp differences (FMA
    # contraction in the fused kernel) amplify to O(1e-2) forces.
    xs = np.arange(nx)[:, None]; ys = np.arange(ny)[None, :]
    tex = (0.1 * np.sin(xs / 4.0) * np.cos(ys / 3.0)).astype(np.float32)
    iref, imov = jnp.asarray(iref + tex), jnp.asarray(imov + tex)
    u0 = jnp.asarray(
        np.clip(0.8 * rng.standard_normal((2, nx, ny)), -1.5, 1.5).astype(np.float32)
    )
    mesh = make_mesh(data=1, x=8)
    kw = dict(sigma_i=1.0, sigma_x=1.0, sigma_diffusion=1.0, sigma_fluid=1.0,
              kernelwidth=5, halo=2, diffeomorphic=True)
    want = make_demons_step_sharded(mesh, **kw)(u0, iref, imov)
    with pltpu.force_tpu_interpret_mode():
        got = make_demons_step_sharded(mesh, use_pallas=True, **kw)(u0, iref, imov)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("nx", [60, 120])
def test_warp_pallas_ragged_rows(nx, rng):
    """Row counts with no 8-aligned divisor go through the pad-to-8 path
    (unaligned tile heights stall the Mosaic compiler)."""
    from opticalflow2d_tpu.ops.warp import warp2d
    from opticalflow2d_tpu.pallas_kernels.warp_fused import warp2d_pallas

    ny = 48
    img = jnp.asarray(rng.standard_normal((nx, ny)).astype(np.float32))
    u = jnp.asarray(
        np.clip(1.5 * rng.standard_normal((2, nx, ny)), -1.9, 1.9).astype(np.float32)
    )
    want = warp2d(img, u, halo=2)
    with pltpu.force_tpu_interpret_mode():
        got = warp2d_pallas(img, u, halo=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_warp_pallas_strip_sharded_ragged(rng):
    """Sharded strips of 15 rows (no 8-aligned divisor) stay exact."""
    from opticalflow2d_tpu.ops.warp import warp2d
    from opticalflow2d_tpu.parallel import make_mesh
    from opticalflow2d_tpu.parallel.spatial import make_warp2d_sharded

    nx, ny = 120, 48  # nxl = 15 per device
    iref, imov = make_pair(nx, ny, shift=(1.2, -0.7))
    img = jnp.asarray(imov)
    u = jnp.asarray(
        np.clip(1.5 * rng.standard_normal((2, nx, ny)), -1.9, 1.9).astype(np.float32)
    )
    want = warp2d(img, u, halo=2)
    mesh = make_mesh(data=1, x=8)
    with pltpu.force_tpu_interpret_mode():
        got = make_warp2d_sharded(mesh, halo=2, use_pallas=True)(img, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_demons_fused_correspondence_matches_jnp(rng):
    """Fused kernel A (warp+gradient+force+fluid smooth) vs the jnp chain."""
    from opticalflow2d_tpu.ops.warp import warp2d
    from opticalflow2d_tpu.ops.conv import gaussian_smooth
    from opticalflow2d_tpu.solvers.base import derivatives, demons_force
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas)

    nx, ny = 64, 48
    iaux = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    iref = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    u = jnp.asarray(np.tanh(rng.standard_normal((2, nx, ny)).astype(np.float32)) * 1.8)

    iwar = warp2d(iaux, u)
    c = demons_force(derivatives(iref, iwar), 1.0, 0.25)
    want = gaussian_smooth(c, 2.0, 5)
    with pltpu.force_tpu_interpret_mode():
        got = demons_correspondence_pallas(iaux, iref, u, 1.0, 0.25, 2.0, 5,
                                           halo=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kw", [5, 7])
def test_demons_fused_compose_smooth_matches_jnp(kw, rng):
    """Fused kernel B (compose + diffusion smooth) vs the jnp chain."""
    from opticalflow2d_tpu.ops.warp import compose
    from opticalflow2d_tpu.ops.conv import gaussian_smooth
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        compose_smooth_pallas, fused_supported)

    assert fused_supported(2, kw)
    nx, ny = 64, 48
    u = jnp.asarray(
        np.clip(2.0 * rng.standard_normal((2, nx, ny)), -4, 4).astype(np.float32))
    c = jnp.asarray(
        np.clip(1.0 * rng.standard_normal((2, nx, ny)), -1.9, 1.9).astype(np.float32))
    want = gaussian_smooth(compose(u, c), 2.0, kw)
    with pltpu.force_tpu_interpret_mode():
        got = compose_smooth_pallas(u, c, 2.0, kw, halo=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pick_tb_tiers():
    """Pin the measured (tile, vmem-limit) tiers for the fused gather
    kernels (the r4 within-run tier races; see pallas_kernels.__init__
    for the scoped-vmem policy)."""
    from opticalflow2d_tpu.pallas_kernels import MB
    from opticalflow2d_tpu.pallas_kernels.demons_fused import _pick_tb

    assert _pick_tb(1024, 1024, 1, 2) == (256, 48 * MB)
    assert _pick_tb(2048, 2048, 2, 2) == (128, 48 * MB)
    assert _pick_tb(4096, 4096, 2, 2) == (64, 64 * MB)
    # Explicit valid tb honored (tier limit still applies).
    assert _pick_tb(1024, 1024, 2, 2, tb=32) == (32, 48 * MB)
    # Invalid explicit tb re-searched downward from the tier cap.
    assert _pick_tb(120, 1024, 1, 2, tb=256) == (120, 48 * MB)
    for nx in (64, 120, 1000, 4096):
        for ny in (128, 2048, 4096):
            tb, _ = _pick_tb(nx, ny, 2, 2)
            assert nx % tb == 0 and tb % 8 == 0


def test_fused_demons_halo_caps():
    """halo >= 3 triples the gather's live temporaries: tb=64 @1024
    OOM'd at halo=4 (20.5M) and nothing compiles at ny=4096 (24.5M at
    tb=8) — the cap is pinned at the measured-good (and fastest) tb=32
    @1024 footprint, and the solver must fall back to the op-chain step
    where no tile fits."""
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        _pick_tb, fused_feasible)

    from opticalflow2d_tpu.pallas_kernels import MB

    assert _pick_tb(1024, 1024, 1, 4) == (128, 48 * MB)
    assert _pick_tb(2048, 2048, 2, 4) == (64, 64 * MB)
    assert _pick_tb(4096, 4096, 1, 4) == (32, 64 * MB)
    # Kernel B's 2-channel gather measured a 72.35M stack at (32, 64M)
    # there — it halves the tile.
    assert _pick_tb(4096, 4096, 2, 4) == (16, 64 * MB)

    # Feasibility must track the tier tables (not last month's ceiling):
    # feasible exactly up to the largest lane tier, infeasible past it.
    from opticalflow2d_tpu.pallas_kernels import demons_fused, warp_fused

    for halo, tiers in ((2, demons_fused._TIERS_H2),
                        (4, demons_fused._TIERS_WIDE)):
        max_ny = max(cap for cap, _, _ in tiers)
        for cap_ny, _, _ in tiers:
            assert fused_feasible(cap_ny, cap_ny, halo)
        assert not fused_feasible(2 * max_ny, 2 * max_ny, halo)

    from opticalflow2d_tpu.pallas_kernels.warp_fused import gather_feasible

    for halo, tiers in ((2, warp_fused._TIERS_H2),
                        (4, warp_fused._TIERS_WIDE)):
        max_ny = max(cap for cap, _, _ in tiers)
        for cap_ny, _, _ in tiers:
            assert gather_feasible(cap_ny, halo)
        # Past the largest tier ops.warp falls to the roll path.
        assert not gather_feasible(2 * max_ny, halo)


def test_demons_step_infeasible_shape_falls_back(rng):
    """When no fused tile fits (trace-time shape gate), make_demons_step
    must run the op-chain path and still produce the same field."""
    from opticalflow2d_tpu.pallas_kernels import demons_fused as df
    from opticalflow2d_tpu.solvers.demons import make_demons_step

    nx, ny = 48, 40
    iref = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    imov = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    u = jnp.asarray(np.tanh(rng.standard_normal((2, nx, ny)).astype(np.float32)))

    step = make_demons_step(1.0, 0.25, 2.0, 2.0, 5, False,
                            warp_halo=2, use_pallas=True)
    ref_step = make_demons_step(1.0, 0.25, 2.0, 2.0, 5, False,
                                warp_halo=2, use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        want = step(u, iref, imov)
        orig = df._TIERS_H2
        try:
            df._TIERS_H2 = ()  # no tier -> op-chain path
            got = step(u, iref, imov)
        finally:
            df._TIERS_H2 = orig
    base = ref_step(u, iref, imov)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(want), np.asarray(base),
                               rtol=1e-5, atol=1e-6)


def test_demons_fused_ragged_rows(rng):
    """Non-8-divisible row counts go through the pad-to-8 path."""
    from opticalflow2d_tpu.ops.warp import warp2d
    from opticalflow2d_tpu.ops.conv import gaussian_smooth
    from opticalflow2d_tpu.solvers.base import derivatives, demons_force
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas)

    nx, ny = 60, 48
    iaux = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    iref = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    u = jnp.asarray(np.tanh(rng.standard_normal((2, nx, ny)).astype(np.float32)))

    iwar = warp2d(iaux, u)
    c = demons_force(derivatives(iref, iwar), 1.0, 0.25)
    want = gaussian_smooth(c, 2.0, 5)
    with pltpu.force_tpu_interpret_mode():
        got = demons_correspondence_pallas(iaux, iref, u, 1.0, 0.25, 2.0, 5,
                                           halo=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("method_kw", [
    dict(diffeomorphic=False), dict(diffeomorphic=True)],
    ids=["thirions", "diffeo"])
def test_demons_fused_step_matches_unfused(method_kw, rng):
    """The full fused demons step (2 Pallas kernels + fallback conds) vs the
    unfused jnp step, iterated."""
    from opticalflow2d_tpu.solvers.demons import make_demons_step

    nx, ny = 48, 40
    iref, imov = make_pair(nx, ny, shift=(1.3, -0.8))
    iref, imov = jnp.asarray(iref), jnp.asarray(imov)
    base = dict(sigma_i=1.0, sigma_x=0.25, sigma_diffusion=2.0,
                sigma_fluid=2.0, kernelwidth=5, warp_halo=2, **method_kw)
    step_jnp = make_demons_step(use_pallas=False, **base)
    step_fused = make_demons_step(use_pallas=True, **base)

    u_a = jnp.zeros((2, nx, ny))
    u_b = jnp.zeros((2, nx, ny))
    with pltpu.force_tpu_interpret_mode():
        for _ in range(4):
            u_a = step_fused(u_a, iref, imov)
            u_b = step_jnp(u_b, iref, imov)
    np.testing.assert_allclose(np.asarray(u_a), np.asarray(u_b),
                               rtol=1e-4, atol=1e-5)


def test_register_demons_fused_full_registration():
    """Full demons registration routed through the fused kernels equals the
    jnp driver."""
    from opticalflow2d_tpu import register, RegConfig, Method

    iref, imov = make_pair(32, 32, shift=(1.0, -0.5))
    base = RegConfig(method=Method.THIRIONS_DEMONS, niter=(6, 4), nscales=1,
                     warp_halo=2, warp_halo_outer=2)
    pal = RegConfig(method=Method.THIRIONS_DEMONS, niter=(6, 4), nscales=1,
                    warp_halo=2, warp_halo_outer=2, use_pallas=True)
    want = register(iref, imov, base)
    with pltpu.force_tpu_interpret_mode():
        got = register(iref, imov, pal)
    assert [int(t.iterations) for t in got.traces] == [
        int(t.iterations) for t in want.traces]
    np.testing.assert_allclose(
        np.asarray(got.motion), np.asarray(want.motion), rtol=1e-4, atol=1e-5
    )


def test_register_sp_thirions_fused_pallas_matches():
    """Complete explicit-SP pyramid with use_pallas (fused strip demons
    kernels) vs the jnp SP path, 8-device CPU mesh, interpret mode."""
    from opticalflow2d_tpu.parallel import make_mesh
    from opticalflow2d_tpu.parallel.spatial import make_register_sp

    nx, ny = 64, 48
    iref, imov = make_pair(nx, ny, shift=(1.2, -0.7))
    xs = np.arange(nx)[:, None]; ys = np.arange(ny)[None, :]
    tex = (0.1 * np.sin(xs / 4.0) * np.cos(ys / 3.0)).astype(np.float32)
    iref, imov = iref + tex, imov + tex
    mesh = make_mesh(data=1, x=4)
    kw = dict(sigma_i=1.0, sigma_x=0.25, sigma_diffusion=2.0,
              sigma_fluid=2.0, kernelwidth=5)

    want, it_w = make_register_sp(mesh, "thirions", niter=[4, 3], nscales=1,
                                  halo=2, **kw)(jnp.asarray(iref),
                                                jnp.asarray(imov))
    with pltpu.force_tpu_interpret_mode():
        got, it_g = make_register_sp(mesh, "thirions", niter=[4, 3],
                                     nscales=1, halo=2, use_pallas=True,
                                     **kw)(jnp.asarray(iref),
                                           jnp.asarray(imov))
    assert list(np.asarray(it_g)) == list(np.asarray(it_w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("accum,kw", [("comp", 5), ("comp", 7), ("add", 5)])
def test_thirion_onepass_matches_jnp_chain(accum, kw, rng):
    """Single-pass Thirion kernel vs the jnp chain AND vs the two-kernel
    fused path (must be bit-identical to the latter)."""
    from opticalflow2d_tpu.ops.warp import warp2d, compose
    from opticalflow2d_tpu.ops.conv import gaussian_smooth
    from opticalflow2d_tpu.solvers.base import derivatives, demons_force
    from opticalflow2d_tpu.pallas_kernels.demons_onepass import (
        thirion_onepass_pallas, onepass_supported)
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas, compose_smooth_pallas)

    assert onepass_supported(2, kw, 1.0, 0.25)
    nx, ny = 64, 48
    iaux = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    iref = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    u = jnp.asarray(np.tanh(rng.standard_normal((2, nx, ny)).astype(np.float32)) * 1.8)
    addition = accum == "add"

    iwar = warp2d(iaux, u)
    c = demons_force(derivatives(iref, iwar), 1.0, 0.25)
    c = gaussian_smooth(c, 2.0, kw)
    u_j = u + c if addition else compose(u, c)
    want = gaussian_smooth(u_j, 1.7, kw)

    with pltpu.force_tpu_interpret_mode():
        got = thirion_onepass_pallas(iaux, iref, u, 1.0, 0.25, 2.0, 1.7,
                                     kw, halo=2, addition=addition)
        c2 = demons_correspondence_pallas(iaux, iref, u, 1.0, 0.25, 2.0, kw,
                                          halo=2)
        if addition:
            twok = gaussian_smooth(u + c2, 1.7, kw)
        else:
            # halo=1: the static force bound sigma_x/(2*sigma_i) = 0.125,
            # so the production two-kernel path composes at halo_c = 1
            # (solvers.demons._make_fused_step) — the same enumeration the
            # one-pass kernel uses, which keeps the hat-gather tap chains
            # identical expression trees (bitwise comparison below).
            twok = compose_smooth_pallas(u, c2, 1.7, kw, halo=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    if addition:
        # The two-kernel addition path smooths in jnp (kernel B is
        # composition-only), whose summation order differs from the
        # in-kernel smooth by ~1 ulp.
        np.testing.assert_allclose(np.asarray(got), np.asarray(twok),
                                   rtol=1e-4, atol=1e-6)
    else:
        # Bit-identical to the two-kernel fused path: same expressions,
        # same order, per stage.
        np.testing.assert_array_equal(np.asarray(got), np.asarray(twok))


def test_thirion_onepass_ragged_rows(rng):
    """Non-8-divisible row counts through the pad-to-8 path."""
    from opticalflow2d_tpu.ops.warp import warp2d, compose
    from opticalflow2d_tpu.ops.conv import gaussian_smooth
    from opticalflow2d_tpu.solvers.base import derivatives, demons_force
    from opticalflow2d_tpu.pallas_kernels.demons_onepass import (
        thirion_onepass_pallas)

    nx, ny = 60, 48
    iaux = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    iref = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    u = jnp.asarray(np.tanh(rng.standard_normal((2, nx, ny)).astype(np.float32)))

    iwar = warp2d(iaux, u)
    c = demons_force(derivatives(iref, iwar), 1.0, 0.25)
    c = gaussian_smooth(c, 2.0, 5)
    want = gaussian_smooth(compose(u, c), 2.0, 5)
    with pltpu.force_tpu_interpret_mode():
        got = thirion_onepass_pallas(iaux, iref, u, 1.0, 0.25, 2.0, 2.0,
                                     5, halo=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_onepass_supported_gates():
    """Static preconditions: pad fit and the analytic correspondence
    bound sigma_x/(2*sigma_i) <= halo."""
    from opticalflow2d_tpu.pallas_kernels.demons_onepass import (
        onepass_supported, required_pad)

    assert required_pad(2, 5) == 8    # 2*2 + 2 + 2
    assert required_pad(2, 7) == 16   # 2*3 + 2 + 2 = 10 -> 16
    assert required_pad(4, 5) == 16   # 4 + 4 + 2 = 10 -> 16
    assert onepass_supported(2, 5, 1.0, 0.25)
    assert onepass_supported(1, 5, 1.0, 0.25)   # bound 0.125 <= 1
    assert not onepass_supported(1, 5, 0.1, 1.0)  # bound 5.0 > 1
    assert not onepass_supported(0, 5, 1.0, 0.25)
    assert not onepass_supported(2, 5, 0.0, 0.25)  # sigma_i == 0
    assert not onepass_supported(7, 9, 1.0, 0.25)  # pad 24 > 16


def test_onepass_infeasible_falls_back_to_two_kernel(rng):
    """With no onepass tier at this shape the step must take the
    two-kernel fused path and produce the identical field."""
    from opticalflow2d_tpu.pallas_kernels import demons_onepass as dop
    from opticalflow2d_tpu.solvers.demons import make_demons_step

    nx, ny = 48, 40
    iref, imov = make_pair(nx, ny, shift=(1.1, -0.6))
    iref, imov = jnp.asarray(iref), jnp.asarray(imov)
    u = jnp.asarray(0.5 * np.tanh(
        rng.standard_normal((2, nx, ny))).astype(np.float32))

    step = make_demons_step(1.0, 0.25, 2.0, 2.0, 5, False,
                            warp_halo=2, use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        want = step(u, iref, imov)
        orig = dop._TIERS_H2
        try:
            dop._TIERS_H2 = ()
            got = step(u, iref, imov)
        finally:
            dop._TIERS_H2 = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_thirion_onepass_with_errors_sums(rng):
    """with_errors: the kernel's Logger partial sums equal the full-array
    sums of |u_new - u| and |u| magnitudes (block partials of exact adds;
    allclose across the different summation orders), and the motion output
    is identical to the with_errors=False call."""
    from opticalflow2d_tpu.pallas_kernels.demons_onepass import (
        thirion_onepass_pallas)
    from opticalflow2d_tpu.solvers.demons import logger_sums

    nx, ny = 64, 48
    iaux = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    iref = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    u = jnp.asarray(np.tanh(
        rng.standard_normal((2, nx, ny)).astype(np.float32)) * 1.8)

    with pltpu.force_tpu_interpret_mode():
        plain = thirion_onepass_pallas(iaux, iref, u, 1.0, 0.25, 2.0, 2.0,
                                       5, halo=2, tb=16)
        got, sums = thirion_onepass_pallas(iaux, iref, u, 1.0, 0.25, 2.0,
                                           2.0, 5, halo=2, tb=16,
                                           with_errors=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(plain))
    want = logger_sums(got, u)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(want),
                               rtol=1e-6)


def test_thirion_onepass_with_errors_ragged(rng):
    """Alignment-pad rows (nx not a multiple of the 8-row pad) hold NaN
    from the renormalized smooth; the Logger partials must mask them."""
    from opticalflow2d_tpu.pallas_kernels.demons_onepass import (
        thirion_onepass_pallas)
    from opticalflow2d_tpu.solvers.demons import logger_sums

    nx, ny = 60, 48
    iaux = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    iref = jnp.asarray(rng.random((nx, ny)).astype(np.float32))
    u = jnp.asarray(np.tanh(
        rng.standard_normal((2, nx, ny)).astype(np.float32)))

    with pltpu.force_tpu_interpret_mode():
        got, sums = thirion_onepass_pallas(iaux, iref, u, 1.0, 0.25, 2.0,
                                           2.0, 5, halo=2,
                                           with_errors=True)
    assert np.isfinite(np.asarray(sums)).all()
    want = logger_sums(got, u)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(want),
                               rtol=1e-6)


def test_demons_onepass_trust_mode_past_8192():
    """Past 8192 lanes the one-pass demons step must trace WITHOUT the
    runtime lax.cond (its exact-gather jnp fallback branch cannot compile
    in a 16384^2 program — r8 probe_16384_o); at ordinary extents the
    runtime-checked fallback remains. Abstract shapes only."""
    import jax

    from opticalflow2d_tpu.solvers.demons import make_demons_step

    step = make_demons_step(1.0, 0.25, 2.0, 2.0, 5, diffeomorphic=False,
                            warp_halo=2, use_pallas=True, with_errors=True)

    def eqn_names(n):
        u = jax.ShapeDtypeStruct((2, n, n), jnp.float32)
        img = jax.ShapeDtypeStruct((n, n), jnp.float32)
        jaxpr = jax.make_jaxpr(step)(u, img, img)
        return {e.primitive.name for e in jaxpr.jaxpr.eqns}

    assert "cond" not in eqn_names(16384)
    assert "cond" in eqn_names(1024)


def test_logger_norms_pallas_matches_jnp(rng):
    """The Logger norm-pair kernel (the >8192 escape hatch for the
    non-blocked families' convergence errors) must match the jnp sums."""
    from jax.experimental.pallas import tpu as pltpu

    from opticalflow2d_tpu.pallas_kernels.logger_norms import (
        logger_norms_pallas,
    )

    u_new = jnp.asarray(rng.standard_normal((2, 64, 48)).astype(np.float32))
    u_prev = jnp.asarray(rng.standard_normal((2, 64, 48)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(logger_norms_pallas(u_new, u_prev))
    d = u_new - u_prev
    want = np.array([
        float(jnp.sum(jnp.sqrt(d[0] ** 2 + d[1] ** 2))),
        float(jnp.sum(jnp.sqrt(u_prev[0] ** 2 + u_prev[1] ** 2))),
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # Extent-gate policy: _rel_step_error only dispatches here past 8192
    # lanes AND under use_pallas (abstract shapes; nothing allocated).
    import jax as _jax

    from opticalflow2d_tpu.engine.registration import _rel_step_error

    def has_pallas(n, use_pallas):
        u = _jax.ShapeDtypeStruct((2, n, n), jnp.float32)
        jaxpr = _jax.make_jaxpr(
            lambda a, b: _rel_step_error(a, b, use_pallas))(u, u)
        names = set()
        for e in jaxpr.jaxpr.eqns:
            names.add(e.primitive.name)
            if e.primitive.name in ("jit", "pjit"):
                names |= {i.primitive.name
                          for i in e.params["jaxpr"].jaxpr.eqns}
        return "pallas_call" in names

    assert has_pallas(16384, True)
    assert not has_pallas(16384, False)
    assert not has_pallas(1024, True)


def test_fluid_metrics_pallas_matches_jnp():
    """fluid_metrics_pallas (Logger sums + jacobian min in one Mosaic
    pass — the 16384^2 fluid tail) must bit-match the jnp chain: same
    row-partial sum scheme as logger_norms_pallas, identical jacobian
    stencil expressions, association-exact min."""
    import numpy as np
    from opticalflow2d_tpu.ops.grid import jacobian_det
    from opticalflow2d_tpu.pallas_kernels.logger_norms import (
        fluid_metrics_pallas,
        logger_norms_pallas,
    )

    rng = np.random.default_rng(21)
    for nx, ny in ((64, 128), (40, 256)):
        u_new = jnp.asarray(
            np.tanh(rng.standard_normal((2, nx, ny))).astype(np.float32) * 1.3)
        u_prev = jnp.asarray(
            np.tanh(rng.standard_normal((2, nx, ny))).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            sums, jac_min = fluid_metrics_pallas(u_new, u_prev)
            sums_ref = logger_norms_pallas(u_new, u_prev)
        np.testing.assert_array_equal(np.asarray(sums), np.asarray(sums_ref))
        want_jac = float(jnp.min(jacobian_det(u_new)))
        # the det's a*b - c*d contracts (FMA) differently between the two
        # programs -> ~1 ulp; the regrid threshold compare is insensitive
        assert abs(float(jac_min) - want_jac) <= 2e-6 * max(1.0, abs(want_jac))
