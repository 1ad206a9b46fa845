"""Fused Horn-Schunck diffusion update as a Pallas TPU kernel.

One pass computes qlaplacian + L-SSD force + Jacobi update
(``OpticalFlowDiffusion.cpp:43-84`` semantics) with a single read of
``(u, gradI, It)`` and a single write of ``u_new`` — the memory-bound ideal
(~28 B/pixel-iteration) that XLA's generic fusion does not reach on the
pad/concat border stencils.

Tiling: the grid walks row-blocks of ``TB`` rows; the motion field stays in
HBM (``memory_space=ANY``) and each program DMAs its ``TB+2``-row halo
window into VMEM scratch (3 async copies: body, halo-up, halo-down). Image
derivatives stream through the standard blocked-VMEM pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _diffusion_kernel(u_hbm, gx_ref, gy_ref, it_ref, out_ref, u_sc, sems, *,
                      alpha: float, tb: int, nx: int):
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)

    # --- DMA the halo window of u into VMEM scratch ------------------------
    body = pltpu.make_async_copy(
        u_hbm.at[:, pl.ds(i * tb, tb), :], u_sc.at[:, pl.ds(1, tb), :], sems.at[0]
    )
    body.start()

    @pl.when(i > 0)
    def _():
        up = pltpu.make_async_copy(
            u_hbm.at[:, pl.ds(i * tb - 1, 1), :], u_sc.at[:, pl.ds(0, 1), :],
            sems.at[1],
        )
        up.start()
        up.wait()

    @pl.when(i < nblocks - 1)
    def _():
        dn = pltpu.make_async_copy(
            u_hbm.at[:, pl.ds((i + 1) * tb, 1), :], u_sc.at[:, pl.ds(tb + 1, 1), :],
            sems.at[2],
        )
        dn.start()
        dn.wait()

    # Global-border halo rows are never read (masked below), but zero them at
    # the edges so the arithmetic stays finite.
    @pl.when(i == 0)
    def _():
        u_sc[:, 0:1, :] = jnp.zeros_like(u_sc[:, 0:1, :])

    @pl.when(i == nblocks - 1)
    def _():
        u_sc[:, tb + 1 : tb + 2, :] = jnp.zeros_like(u_sc[:, tb + 1 : tb + 2, :])

    body.wait()

    u = u_sc[:, :, :]  # [2, tb+2, ny]
    ny = u.shape[-1]

    # --- qlaplacian with halo (gradients.h:72-80) --------------------------
    x_sum = u[:, 2:, :] + u[:, :-2, :]                     # [2, tb, ny]
    center = u[:, 1:-1, :]
    # y-shifts via circular roll along the lane dim (pad/concat on the minor
    # dimension doesn't lower in Mosaic); the wrapped entries land only in
    # the border columns, which the global-border mask zeroes below.
    lanes = center.shape[-1]
    y_sum = pltpu.roll(center, 1, 2) + pltpu.roll(center, lanes - 1, 2)
    q = (x_sum + y_sum) * 0.25

    # Zero at global borders.
    gi = lax.broadcasted_iota(jnp.int32, (tb, ny), 0) + i * tb
    gj = lax.broadcasted_iota(jnp.int32, (tb, ny), 1)
    border = (gi == 0) | (gi == nx - 1) | (gj == 0) | (gj == ny - 1)
    q = jnp.where(border[None], 0.0, q)

    # --- force + Jacobi update (OpticalFlow.cpp:15-39, ---------------------
    #     OpticalFlowDiffusion.cpp:57-84)
    gx = gx_ref[:, :]
    gy = gy_ref[:, :]
    it = it_ref[:, :]
    inner = it + q[0] * gx + q[1] * gy
    den = alpha * alpha + gx * gx + gy * gy
    scale = inner / den
    out_ref[0, :, :] = q[0] - gx * scale
    out_ref[1, :, :] = q[1] - gy * scale


@functools.partial(jax.jit, static_argnames=("alpha", "tb"))
def diffusion_step_pallas(u, grad_i, it_img, alpha: float, tb: int = 256):
    """Drop-in fused replacement for ``diffusion_step`` (same float math,
    same result). ``nx`` must be divisible by ``tb``; callers fall back to
    the jnp path otherwise."""
    _, nx, ny = u.shape
    if nx % tb != 0:
        tb = max(8, nx // max(1, nx // tb))
        while nx % tb != 0:
            tb -= 1
    nblocks = nx // tb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # u stays in HBM
            pl.BlockSpec((tb, ny), lambda i: (i, 0)),
            pl.BlockSpec((tb, ny), lambda i: (i, 0)),
            pl.BlockSpec((tb, ny), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, tb + 2, ny), u.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    kernel = functools.partial(_diffusion_kernel, alpha=alpha, tb=tb, nx=nx)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, nx, ny), u.dtype),
    )(u, grad_i[0], grad_i[1], it_img)
