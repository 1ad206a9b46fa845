"""Fused fluid iteration kernel vs the jnp step (interpret mode on CPU;
the same kernel compiles with Mosaic on TPU).

Trajectory contract: the fused path must produce the same trajectory
STRUCTURE — skip decisions, regrid events, iteration counts — as the jnp
path, with values tracking to ~1 ulp per step (different XLA graphs make
different FMA/fusion choices; bitwise equality across graphs is not a
property either path can promise).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from conftest import make_pair
from opticalflow2d_tpu.solvers.base import derivatives
from opticalflow2d_tpu.solvers.fluid import make_fluid_step
from opticalflow2d_tpu.pallas_kernels.diffusion_block import stack_derivs
from opticalflow2d_tpu.pallas_kernels.fluid_fused import (
    fluid_feasible,
    fluid_iter_pallas,
    _pick_tb,
)

MU, LAM, OMEGA = 0.25, 0.1, 1.5


def _setup(nx, ny, rng):
    iref, imov = make_pair(nx, ny, shift=(1.2, -0.7))
    d = derivatives(jnp.asarray(iref), jnp.asarray(imov))
    u = jnp.asarray(0.6 * np.tanh(
        rng.standard_normal((2, nx, ny))).astype(np.float32))
    vel = jnp.asarray(0.3 * np.tanh(
        rng.standard_normal((2, nx, ny))).astype(np.float32))
    vel = vel.at[:, 0, :].set(0).at[:, -1, :].set(0)
    vel = vel.at[:, :, 0].set(0).at[:, :, -1].set(0)
    return u, vel, d


@pytest.mark.parametrize("shape,tb,ref_stencil,bug", [
    ((64, 48), 16, True, False),
    ((64, 48), 64, True, True),    # single row-block + maxabs bug mode
    ((96, 40), 24, False, False),  # corrected symmetric stencil
    ((48, 40), None, True, False),  # auto tile
])
def test_fluid_fused_matches_jnp_step(shape, tb, ref_stencil, bug, rng):
    """The fused kernel's (velocity, R, maxabs) equal the jnp chain's
    to within 1 ulp — identical expressions, but the roll-based kernel
    and the pad/slice jnp path are different XLA graphs, so FMA/fusion
    decisions may differ (same reason the elastic_block tests use
    allclose). max is exact under any association, so maxabs matches the
    kernel's own R exactly."""
    from opticalflow2d_tpu.ops.grid import partial_x, partial_y
    from opticalflow2d_tpu.ops.reduce import motion_maxabs
    from opticalflow2d_tpu.solvers.base import lssd_force
    from opticalflow2d_tpu.solvers.elastic import sor_sweep

    nx, ny = shape
    u, vel, d = _setup(nx, ny, rng)
    g = stack_derivs(d.grad_i, d.it)

    f = lssd_force(d, u)
    vel_want = sor_sweep(vel, f, MU, LAM, OMEGA, ref_stencil, "redblack")
    r_want = (vel_want - partial_x(u) * vel_want[0:1]
              - partial_y(u) * vel_want[1:2])
    m_want = motion_maxabs(r_want, bug=bug)

    with pltpu.force_tpu_interpret_mode():
        vel_got, r_got, maxsq = fluid_iter_pallas(
            u, vel, g, MU, LAM, OMEGA, ref_stencil, bug, tb=tb)
    np.testing.assert_allclose(np.asarray(vel_got), np.asarray(vel_want),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(r_got), np.asarray(r_want),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.sqrt(np.asarray(maxsq)),
                               np.asarray(m_want), rtol=1e-5)
    # maxabs is exactly the max over the kernel's own R (associativity).
    np.testing.assert_array_equal(
        np.sqrt(np.asarray(maxsq)),
        np.asarray(motion_maxabs(r_got, bug=bug)))


@pytest.mark.parametrize("bug", [False, True])
def test_fluid_fused_step_trajectory_bitwise(bug, rng):
    """Several chained steps through make_fluid_step: the fused path's
    (u, velocity, dt) sequence must track the jnp path's to float
    tolerance, with identical skip decisions."""
    nx, ny = 64, 48
    u, vel, d = _setup(nx, ny, rng)

    step_j = make_fluid_step(MU, LAM, OMEGA, dumax=0.65, timestep_skip=65.0,
                             maxabs_bug=bug, use_pallas=False)
    step_p = make_fluid_step(MU, LAM, OMEGA, dumax=0.65, timestep_skip=65.0,
                             maxabs_bug=bug, use_pallas=True)
    uj, vj = u, vel
    up_, vp = u, vel
    with pltpu.force_tpu_interpret_mode():
        for _ in range(4):
            uj, vj, dtj = step_j(uj, vj, d)
            up_, vp, dtp = step_p(up_, vp, d)
            assert (float(dtp) < 65.0) == (float(dtj) < 65.0)
            np.testing.assert_allclose(np.asarray(dtp), np.asarray(dtj),
                                       rtol=1e-5)
            np.testing.assert_allclose(np.asarray(up_), np.asarray(uj),
                                       rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(np.asarray(vp), np.asarray(vj),
                                       rtol=1e-4, atol=1e-6)


def test_register_fluid_pallas_trajectory_matches_jnp():
    """Full fluid registration through the fused kernel: identical
    iteration counts and regrid events, error traces and motion to
    float tolerance."""
    from opticalflow2d_tpu import register, RegConfig, Method

    iref, imov = make_pair(64, 48, shift=(2.0, -1.4))
    base = RegConfig(method=Method.FLUID, niter=(8, 5), nscales=1,
                     nrefine=2)
    pal = RegConfig(method=Method.FLUID, niter=(8, 5), nscales=1,
                    nrefine=2, use_pallas=True)
    want = register(iref, imov, base)
    with pltpu.force_tpu_interpret_mode():
        got = register(iref, imov, pal)
    for tw, tg in zip(want.traces, got.traces):
        assert int(tg.iterations) == int(tw.iterations)
        assert int(tg.regrids) == int(tw.regrids)
        np.testing.assert_allclose(np.asarray(tg.errors),
                                   np.asarray(tw.errors),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.motion),
                               np.asarray(want.motion), rtol=1e-5, atol=1e-6)


def test_fluid_feasible_gates():
    """Shape gates: nx must be a multiple of the 8-row pad; odd pyramid
    levels fall back to the jnp step."""
    assert fluid_feasible(1024, 1024)
    assert fluid_feasible(64, 48)
    assert not fluid_feasible(139, 128)   # odd pyramid level
    assert not fluid_feasible(12, 128)    # too few rows
    # tile picks divide nx and are pad-aligned
    for nx in (64, 1024, 2048):
        for ny in (128, 1024, 4096):
            tb, _ = _pick_tb(nx, ny, None)
            assert nx % tb == 0 and tb % 8 == 0


def test_register_fluid_pallas_odd_shape_falls_back():
    """An nx not divisible by 8 must still register (jnp fallback) and
    match the jnp driver exactly (same code path, same graph)."""
    from opticalflow2d_tpu import register, RegConfig, Method

    iref, imov = make_pair(60, 48, shift=(1.0, -0.8))
    base = RegConfig(method=Method.FLUID, niter=(6,), nscales=0)
    pal = RegConfig(method=Method.FLUID, niter=(6,), nscales=0,
                    use_pallas=True)
    want = register(iref, imov, base)
    with pltpu.force_tpu_interpret_mode():
        got = register(iref, imov, pal)
    np.testing.assert_array_equal(np.asarray(got.motion),
                                  np.asarray(want.motion))


def test_fluid_stepped_two_pass_matches_jnp():
    """The huge-grid multi-pass fluid iteration (fluid_sweep_max_pallas
    + fluid_euler_pallas + fluid_metrics_pallas — R never materialized)
    must reproduce
    the jnp stepped path: same iteration counts, same regrid events
    (forced via a >1 threshold), values to float tolerance."""
    import dataclasses

    from opticalflow2d_tpu import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import _solve_level_stepped

    iref, imov = make_pair(64, 48, shift=(2.0, -1.4))
    iref = jnp.asarray(iref, jnp.float32)
    imov = jnp.asarray(imov, jnp.float32)
    base = RegConfig(method=Method.FLUID, mu=0.25, lam=0.0, niter=(6,),
                     nscales=0, warp_halo=0, warp_halo_outer=0,
                     regrid_threshold=0.999, use_pallas=False)
    u0 = jnp.zeros((2, 64, 48), jnp.float32)
    u_j, t_j = _solve_level_stepped(u0, iref, imov, base, 6, 0)
    cfg_p = dataclasses.replace(base, use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        u_p, t_p = _solve_level_stepped(u0, iref, imov, cfg_p, 6, 0)
    assert int(t_p[0].iterations) == int(t_j[0].iterations)
    assert int(t_p[0].regrids) == int(t_j[0].regrids)
    assert int(t_j[0].regrids) > 0, "setup failed to trigger a regrid"
    np.testing.assert_allclose(np.asarray(t_p[0].errors),
                               np.asarray(t_j[0].errors),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_j),
                               rtol=1e-4, atol=1e-6)
