"""Fused Horn-Schunck diffusion update as a Pallas TPU kernel.

One pass computes qlaplacian + L-SSD force + Jacobi update
(``OpticalFlowDiffusion.cpp:43-84`` semantics) with a single streamed read
of ``(u, gradI, It)`` and a single write of ``u_new`` — the memory-bound
ideal (~28 B/pixel-iteration).

Tiling: the grid walks ``TB``-row blocks. The motion field is consumed
three times through the standard blocked-VMEM pipeline: the center block
plus two 8-row halo blocks (8 = f32 sublane tile, keeping every VMEM slice
tile-aligned — Mosaic rejects 1-row offsets). Neighbour shifts are
``pltpu.roll``s with the wrapped row/column patched from the halo blocks
(rows) or masked by the global border (columns, where the stencil is zero
anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _diffusion_kernel(u_c_ref, u_up_ref, u_dn_ref, gx_ref, gy_ref, it_ref,
                      out_ref, *, alpha: float, tb: int, nx: int):
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)

    c = u_c_ref[:, :, :]          # [2, tb, ny]
    ny = c.shape[-1]

    ri = lax.broadcasted_iota(jnp.int32, (tb, ny), 0)

    # Row r of x_up must hold u[global r-1]: roll down by one, then patch
    # row 0 from the up-halo block (garbage when i == 0; masked below).
    x_up = pltpu.roll(c, 1, 1)
    up_row = u_up_ref[:, 7:8, :]  # last row of the 8-row halo block
    x_up = jnp.where((ri == 0)[None], up_row, x_up)

    x_dn = pltpu.roll(c, tb - 1, 1)
    dn_row = u_dn_ref[:, 0:1, :]
    x_dn = jnp.where((ri == tb - 1)[None], dn_row, x_dn)

    # Column neighbours via lane rolls; wrapped entries land in the border
    # columns, which the global-border mask zeroes.
    y_sum = pltpu.roll(c, 1, 2) + pltpu.roll(c, ny - 1, 2)

    q = (x_up + x_dn + y_sum) * 0.25

    # Zero at global borders (gradients.h:72-80).
    gi = ri + i * tb
    gj = lax.broadcasted_iota(jnp.int32, (tb, ny), 1)
    border = (gi == 0) | (gi == nx - 1) | (gj == 0) | (gj == ny - 1)
    q = jnp.where(border[None], 0.0, q)

    # Force + Jacobi update (OpticalFlow.cpp:15-39,
    # OpticalFlowDiffusion.cpp:57-84).
    gx = gx_ref[:, :]
    gy = gy_ref[:, :]
    it = it_ref[:, :]
    inner = it + q[0] * gx + q[1] * gy
    den = alpha * alpha + gx * gx + gy * gy
    scale = inner / den
    out_ref[0, :, :] = q[0] - gx * scale
    out_ref[1, :, :] = q[1] - gy * scale


def _pick_tb_single(nx: int, ny: int, tb: int = 0) -> int:
    """Row tile for the single-step kernel. ``tb=0`` uses per-lane-extent
    caps with margin against Mosaic's 16M scoped-vmem wall: tb=256@1024
    has compiled stably across rounds; tb=128@2048 sits exactly at the
    (tb+16)*ny = 294,912-lane wall and proved run-to-run flaky (compiled
    standalone at 87.5 us/iter, then an identical registration program
    failed to compile — near the limit Mosaic allocation is
    nondeterministic, see diffusion_block._fits_vmem), so wide-lane caps
    back off to the stable tiles: tb<=64 @2048 (102.3 us measured),
    tb<=32 @>=4096 (1050.1 us). An explicit ``tb`` must satisfy
    ``nx % tb == 0`` and ``tb % 8 == 0`` or the same descending divisor
    search runs from it."""
    if tb <= 0:
        tb = (256 if ny <= 1024 else
              (64 if ny <= 2048 else (32 if ny <= 4096 else 16)))
    if nx % tb != 0 or tb % 8 != 0:
        start = min(tb if tb % 8 == 0 else 256, nx)
        tb = 8
        for cand in range(start, 7, -8):
            if nx % cand == 0:
                tb = cand
                break
    return tb


def single_feasible(nx: int, ny: int) -> bool:
    """True when the single-step kernel has a measured-stable tile at
    this lane extent (tb=16 @8192: 6646.4 us/iter measured; tb=32 crashes
    the remote Mosaic compile — r6_results.jsonl). Drivers run the jnp
    step beyond."""
    return ny <= 8192


@functools.partial(jax.jit, static_argnames=("alpha", "tb"))
def diffusion_step_pallas(u, grad_i, it_img, alpha: float, tb: int = 0):
    """Drop-in fused replacement for ``diffusion_step`` (same float math,
    same result). Row tile via ``_pick_tb_single`` (lane-extent-aware;
    the flat 256-row default blew scoped vmem at ny >= 2048)."""
    _, nx, ny = u.shape
    tb = _pick_tb_single(nx, ny, tb)
    nblocks = nx // tb
    nb8 = tb // 8  # halo index stride in 8-row blocks
    last8 = nx // 8 - 1

    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec(
                (2, 8, ny), lambda i: (0, jnp.maximum(i * nb8 - 1, 0), 0)
            ),
            pl.BlockSpec(
                (2, 8, ny), lambda i: (0, jnp.minimum((i + 1) * nb8, last8), 0)
            ),
            pl.BlockSpec((tb, ny), lambda i: (i, 0)),
            pl.BlockSpec((tb, ny), lambda i: (i, 0)),
            pl.BlockSpec((tb, ny), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
    )
    kernel = functools.partial(_diffusion_kernel, alpha=alpha, tb=tb, nx=nx)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, nx, ny), u.dtype),
    )(u, u, u, grad_i[0], grad_i[1], it_img)
