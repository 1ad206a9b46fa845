"""Temporal-blocked elastic (Navier-Lame red-black SOR) iterations.

Same trick as ``diffusion_block.py``: stream a row block plus a halo into
VMEM, run ``k`` full elastic iterations (pointwise L-SSD force + red/black
half-sweeps, reference semantics ``src/regularization/OpticalFlow/
OpticalFlowElastic.cpp:13-55`` via the red-black reordering of
``solvers/elastic.py``) entirely on-chip, and write the interior back
once. Each iteration's dependence cone grows two rows (one per colored
half-sweep; the force is pointwise), so ``pad >= 2k`` keeps the interior
exact. The per-iteration float math is op-for-op identical to
``elastic_step(..., ordering="redblack")``, so interiors are bit-identical
to ``k`` serial steps.

Emits the same per-iteration (step magnitude, prev magnitude) partial sums
as the diffusion block kernel so the driver reconstructs every Logger
relative error exactly (``src/Logger.cpp:30-60`` semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflow2d_tpu.pallas_kernels import MB, compiler_params


def sor_candidate_tile(x, b, mu: float, lam: float, omega: float,
                       reference_stencil: bool):
    """SOR update value at every pixel of a ``[2, e, ny]`` tile — op-for-op
    the stacked form of ``elastic._gs_candidate`` (roll wrap garbage lands
    only in rows outside the iteration's valid trapezoid or in masked
    borders). Shared by the blocked elastic kernel and the fused fluid
    iteration kernel."""
    e, ny = x.shape[1], x.shape[2]
    inv_diag = omega / (-6.0 * mu - 2.0 * lam)
    xm = pltpu.roll(x, 1, 1)        # value at i-1
    xp = pltpu.roll(x, e - 1, 1)    # value at i+1
    ym = pltpu.roll(x, 1, 2)        # value at j-1
    yp = pltpu.roll(x, ny - 1, 2)   # value at j+1
    lap4 = xp + xm + yp + ym
    sw = pltpu.roll(x, 1, 0)        # channel swap (xo)
    swm = pltpu.roll(sw, 1, 1)      # xo at i-1
    swp = pltpu.roll(sw, e - 1, 1)  # xo at i+1
    cross = 0.25 * (
        pltpu.roll(swp, ny - 1, 2)   # (i+1, j+1)
        - pltpu.roll(swm, ny - 1, 2)  # (i-1, j+1)
        - pltpu.roll(swp, 1, 2)       # (i+1, j-1)
        + pltpu.roll(swm, 1, 2)       # (i-1, j-1)
    )
    if reference_stencil:
        second = xp + xm
    else:
        second = jnp.concatenate(
            [(xp + xm)[0:1], (yp + ym)[1:2]], axis=0
        )
    num = b - mu * lap4 - (mu + lam) * (second + cross)
    return (1.0 - omega) * x + inv_diag * num


def _block_body(c, g, gi0, out_ref, diff_ref, prev_ref, *, mu: float,
                lam: float, omega: float, reference_stencil: bool, k: int,
                tb: int, pad: int, nx, with_errors: bool):
    """k elastic iterations on one extended tile (see
    diffusion_block._block_body for the tiling/validity contract); ``gi0``
    is the global row index of tile row 0, ``nx`` the global x extent
    (both may be traced for strip-local callers)."""
    e = tb + 2 * pad
    ny = c.shape[-1]
    gx, gy, it_img = g[0], g[1], g[2]
    grad = g[:2]

    ri = lax.broadcasted_iota(jnp.int32, (e, ny), 0)
    gi = ri + gi0
    gj = lax.broadcasted_iota(jnp.int32, (e, ny), 1)
    interior = (gi >= 1) & (gi <= nx - 2) & (gj >= 1) & (gj <= ny - 2)
    red = (((gi + gj) % 2) == 0) & interior
    black = (((gi + gj) % 2) == 1) & interior

    def candidate(x, b):
        return sor_candidate_tile(x, b, mu, lam, omega, reference_stencil)

    # Vector error accumulation (see diffusion_block._block_kernel: scalar
    # SMEM stores in the loop serialize the schedule).
    if with_errors:
        acc_rows = lax.broadcasted_iota(jnp.int32, (k, ny), 0)
        acc_diff = jnp.zeros((k, ny), c.dtype)
        acc_prev = jnp.zeros((k, ny), c.dtype)

    for t in range(k):
        # Pointwise L-SSD force (OpticalFlow.cpp:15-39) on the whole tile.
        inner = it_img + c[0] * gx + c[1] * gy
        b = grad * inner[None]
        cand = candidate(c, b)
        c_half = jnp.where(red[None], cand, c)
        cand = candidate(c_half, b)
        c_new = jnp.where(black[None], cand, c_half)
        if with_errors:
            prev_i = c[:, pad:pad + tb, :]
            new_i = c_new[:, pad:pad + tb, :]
            diff = new_i - prev_i
            dsum = jnp.sum(jnp.sqrt(diff[0] ** 2 + diff[1] ** 2),
                           axis=0, keepdims=True)
            psum = jnp.sum(jnp.sqrt(prev_i[0] ** 2 + prev_i[1] ** 2),
                           axis=0, keepdims=True)
            acc_diff = jnp.where(acc_rows == t, dsum, acc_diff)
            acc_prev = jnp.where(acc_rows == t, psum, acc_prev)
        c = c_new

    out_ref[:, :, :] = c[:, pad:pad + tb, :]
    if with_errors:
        diff_ref[0, :, :] = acc_diff
        prev_ref[0, :, :] = acc_prev


def _block_kernel(u_c_ref, u_up_ref, u_dn_ref, g_c_ref, g_up_ref, g_dn_ref,
                  out_ref, diff_ref, prev_ref, *, mu: float, lam: float,
                  omega: float, reference_stencil: bool, k: int, tb: int,
                  pad: int, nx: int, with_errors: bool):
    i = pl.program_id(0)
    c = jnp.concatenate(
        [u_up_ref[:, :, :], u_c_ref[:, :, :], u_dn_ref[:, :, :]], axis=1
    )  # [2, e, ny]
    g = jnp.concatenate(
        [g_up_ref[:, :, :], g_c_ref[:, :, :], g_dn_ref[:, :, :]], axis=1
    )  # [3, e, ny]
    _block_body(c, g, i * tb - pad, out_ref, diff_ref, prev_ref, mu=mu,
                lam=lam, omega=omega, reference_stencil=reference_stencil,
                k=k, tb=tb, pad=pad, nx=nx, with_errors=with_errors)


def _strip_kernel(scal_ref, u_pad_hbm, g_pad_hbm, out_ref, diff_ref,
                  prev_ref, u_sc, g_sc, sem_u, sem_g, *, mu: float,
                  lam: float, omega: float, reference_stencil: bool,
                  k: int, tb: int, pad: int, with_errors: bool):
    """Strip-local variant (see diffusion_block._strip_kernel): manual-DMA
    extended tiles from the pre-halo-padded strip; ``scal_ref`` prefetches
    (strip global row origin, global x extent)."""
    i = pl.program_id(0)
    e = tb + 2 * pad
    dma_u = pltpu.make_async_copy(
        u_pad_hbm.at[:, pl.ds(i * tb, e), :], u_sc, sem_u
    )
    dma_g = pltpu.make_async_copy(
        g_pad_hbm.at[:, pl.ds(i * tb, e), :], g_sc, sem_g
    )
    dma_u.start()
    dma_g.start()
    dma_u.wait()
    dma_g.wait()
    gi0 = scal_ref[0] + i * tb - pad
    _block_body(u_sc[:, :, :], g_sc[:, :, :], gi0, out_ref, diff_ref,
                prev_ref, mu=mu, lam=lam, omega=omega,
                reference_stencil=reference_stencil, k=k, tb=tb, pad=pad,
                nx=scal_ref[1], with_errors=with_errors)


# Measured (tile cap, vmem limit) tiers (TPU v5e, `race_*`/`v100_*` rows
# in benchmarks/r4_results.jsonl; scoped-vmem policy in
# pallas_kernels.__init__): tb=128 @1024 (72.7 us/iter vs 86.0 at the old
# 16M-feasible tb=64), tb=64 @2048 (318.5 vs 381.9 at tb=32), tb=64
# @4096 at 48M (1495.2 vs 2825.6 at the default-limit tb=8 — 1.9x).
# ny=8192 (r6j): k=4 measured 6768.0 us/iter at tb=32; tb=64 crashes the
# remote Mosaic compile (HTTP 500), so the cap stays at 32.
# ny=16384 (r8 probe_16384_k): k=4 tb=8 runs 52.6 ms/iter; tb=16 crashes
# the remote Mosaic compile (HTTP 500) — cap 8.
_TIERS = ((1024, 128, 48 * MB), (2048, 64, 32 * MB), (4096, 64, 48 * MB),
          (8192, 32, 64 * MB), (16384, 8, 64 * MB))


def _tier(ny: int):
    for cap_ny, tb_cap, limit in _TIERS:
        if ny <= cap_ny:
            return tb_cap, limit
    return None


def _pick_tiles(nx: int, k: int, tb: int | None, ny: int = 1024):
    """Pick (tb, pad, vmem_limit): the per-iteration cone is 2 rows (red +
    black half-sweeps), so pad = 2k rounded up to the sublane tile (8);
    tb a multiple of pad dividing nx within the lane tier's cap. None if
    no fitting tiling exists (callers fall back to ``elastic_step``). An
    explicit ``tb`` is honored unchecked (expert override)."""
    pad = ((2 * k + 7) // 8) * 8
    tier = _tier(ny)
    tb_cap, limit = tier if tier is not None else (None, 64 * MB)
    if tb is not None and nx % tb == 0 and tb % pad == 0:
        return tb, pad, limit
    if tb_cap is None:
        return None
    for cand in range(min(tb_cap, nx), pad - 1, -pad):
        if nx % cand == 0 and cand % pad == 0:
            return cand, pad, limit
    return None


@functools.partial(
    jax.jit,
    static_argnames=("mu", "lam", "omega", "reference_stencil", "k", "tb",
                     "with_errors"),
)
def elastic_block_pallas(u, g, mu: float, lam: float, omega: float,
                         reference_stencil: bool = True, k: int = 4,
                         tb: int | None = None, with_errors: bool = True):
    """Run ``k`` elastic iterations in one fused HBM pass.

    ``g`` is ``diffusion_block.stack_derivs(grad_i, it)``. Returns
    ``(u_k, sums)`` with ``sums[t] = (sum |u_t - u_{t-1}|, sum |u_{t-1}|)``
    over the whole field (``None`` when ``with_errors=False``). Callers
    fall back to ``elastic_step`` when no valid tiling exists."""
    _, nx, ny = u.shape
    tiles = _pick_tiles(nx, k, tb, ny)
    if tiles is None:
        raise ValueError(f"no valid row tiling for nx={nx}, k={k}")
    tb, pad, vmem_limit = tiles
    nblocks = nx // tb
    r = tb // pad
    last = nx // pad - 1

    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec(
                (2, pad, ny), lambda i: (0, jnp.maximum(i * r - 1, 0), 0)
            ),
            pl.BlockSpec(
                (2, pad, ny), lambda i: (0, jnp.minimum((i + 1) * r, last), 0)
            ),
            pl.BlockSpec((3, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec(
                (3, pad, ny), lambda i: (0, jnp.maximum(i * r - 1, 0), 0)
            ),
            pl.BlockSpec(
                (3, pad, ny), lambda i: (0, jnp.minimum((i + 1) * r, last), 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((1, k, ny), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, k, ny), lambda i: (i, 0, 0)),
        ],
    )
    kernel = functools.partial(
        _block_kernel, mu=mu, lam=lam, omega=omega,
        reference_stencil=reference_stencil, k=k, tb=tb, pad=pad, nx=nx,
        with_errors=with_errors,
    )
    u_k, diff_p, prev_p = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=compiler_params(vmem_limit),
        out_shape=[
            jax.ShapeDtypeStruct((2, nx, ny), u.dtype),
            jax.ShapeDtypeStruct((nblocks, k, ny), u.dtype),
            jax.ShapeDtypeStruct((nblocks, k, ny), u.dtype),
        ],
    )(u, u, u, g, g, g)
    if not with_errors:
        return u_k, None
    return u_k, jnp.stack(
        [jnp.sum(diff_p, axis=(0, 2)), jnp.sum(prev_p, axis=(0, 2))], axis=-1
    )


def required_pad(k: int) -> int:
    """Halo rows each side for k elastic iterations (2 rows/iter cone,
    8-aligned)."""
    return ((2 * k + 7) // 8) * 8


@functools.partial(
    jax.jit,
    static_argnames=("mu", "lam", "omega", "reference_stencil", "k", "tb",
                     "with_errors"),
)
def elastic_block_strip(u_pad, g_pad, row0, nx_glob, mu: float, lam: float,
                        omega: float, reference_stencil: bool = True,
                        k: int = 4, tb: int | None = None,
                        with_errors: bool = True):
    """Strip-local blocked elastic for shard_map drivers (contract as in
    ``diffusion_block.diffusion_block_strip``: ``required_pad(k)``
    exchanged halo rows per side, traced ``row0``/``nx_glob`` scalars,
    returns this strip's interior + per-iteration error partials)."""
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        _pick_tb_strip,
    )

    pad = required_pad(k)
    nc, nxp, ny = u_pad.shape
    nxl = nxp - 2 * pad
    tiles = _pick_tb_strip(nxl, tb, ny, pad, with_errors)
    if tiles is None:
        raise ValueError(f"no valid strip tiling for nxl={nxl}")
    tb, vmem_limit = tiles
    nblocks = nxl // tb
    e = tb + 2 * pad

    scal = jnp.stack([jnp.asarray(row0, jnp.int32),
                      jnp.asarray(nx_glob, jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((2, tb, ny), lambda i, _s: (0, i, 0)),
            pl.BlockSpec((1, k, ny), lambda i, _s: (i, 0, 0)),
            pl.BlockSpec((1, k, ny), lambda i, _s: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, e, ny), u_pad.dtype),
            pltpu.VMEM((3, e, ny), g_pad.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _strip_kernel, mu=mu, lam=lam, omega=omega,
        reference_stencil=reference_stencil, k=k, tb=tb, pad=pad,
        with_errors=with_errors,
    )
    u_k, diff_p, prev_p = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=compiler_params(vmem_limit),
        out_shape=[
            jax.ShapeDtypeStruct((2, nxl, ny), u_pad.dtype),
            jax.ShapeDtypeStruct((nblocks, k, ny), u_pad.dtype),
            jax.ShapeDtypeStruct((nblocks, k, ny), u_pad.dtype),
        ],
    )(scal, u_pad, g_pad)
    if not with_errors:
        return u_k, None
    return u_k, jnp.stack(
        [jnp.sum(diff_p, axis=(0, 2)), jnp.sum(prev_p, axis=(0, 2))], axis=-1
    )
