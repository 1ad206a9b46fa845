"""Fused bounded-displacement bilinear warp/compose as Pallas TPU kernels.

The jnp roll-path (`ops.warp._gather_taps_rolls`) is algorithmically right
for TPU (no hardware gather), but XLA materializes every one of the
``(2h+2)^2`` shifted copies through HBM — at 1024^2/halo=2 that is ~36 x
8 MB = ~290 MB of traffic, matching the measured ~376 us. These kernels
perform the same masked-roll select chain entirely in VMEM on row tiles:
one streamed read of (data, u), one write of the output, all shifts as
on-chip vector ops. Measured on v5e @1024^2: 79 us (halo=2) / 182 us
(halo=4) vs 376 / 3162 us for the XLA path — and 43 ms for exact gather.

Semantics: identical to ``ops.warp.warp2d`` / ``ops.warp.compose`` for
displacement fields whose in-bounds floor offsets satisfy
``|dx - i| <= halo`` and ``|dy - j| <= halo`` (callers guard with a runtime
bound check, as the driver's lax.cond does).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflow2d_tpu.pallas_kernels import MB, compiler_params

_PAD = 8  # zero-padding rows above/below; covers tap offsets for halo <= 7

# Measured (tile cap, vmem limit) tiers for the gather kernels (TPU v5e,
# benchmarks/r4_results.jsonl `race_*`/`v100_*` rows; scoped-vmem policy in
# pallas_kernels.__init__): lane-extent tier -> (tb cap, limit | None).
# halo <= 2: tb=128 @1024 (72.1 us vs 85.5 at 64), tb=32 @2048 (272.7),
# tb=16 @4096 (2179.0 vs 2519.0 at the default-limit tb=8). halo >= 3
# triples the live temporaries: tb=32 is both the stable and the fastest
# tile @1024 (150.9 vs 185.9 at 64); wider extents need the raised limit
# (the @4096 halo-4 gather failed at 21.3M under the default budget).
# ny=8192 (r6l, arrays as args): halo 2 10152.4 us at tb=16 (11115.2 at
# 8); halo 5 22200.2 at tb=16 (24841.7 at 8). Without this tier the
# driver's outer warps lower to the XLA roll chain at 8192, whose
# compilation crashes the remote Mosaic helper (HTTP 500) — the gather
# tier is what makes 8192^2 end-to-end runs possible at all here.
# Round-4 hat-gather remeasure (r7_results.jsonl warp_gather_hat):
# 27.9 us @1024/halo2/tb128 (2.6x the select chain's 72.1), 313.4 @2048,
# 2134.7 @4096, 9328.7 @8192 — tiers unchanged.
# ny=16384 (r8 probe_16384_b): halo 2 runs 61-63 ms, halo 4 79-84 ms at
# tb 8/16 (tb=16 best both) vs 24.1 s for the exact gather — the tier
# that makes 16384^2 registrations possible (the exact gather cannot
# even share a program with a level driver there, see
# ops.warp._EXACT_FALLBACK_MAX_EXTENT).
# r8 retune (confirm sweep, iters 20/100): hat-gather @4096 runs ~9%
# faster at tb=64 (1925.1 us vs 2109.8 at the old tb=16 tier, stable
# across vmem limits); 2048 and the onepass tiers re-confirmed optimal
# (the 5/25-iteration sweep's outliers were tunnel jitter).
_TIERS_H2 = ((1024, 128, 32 * MB), (2048, 32, None), (4096, 64, 32 * MB),
             (8192, 16, 64 * MB), (16384, 16, 64 * MB))
_TIERS_WIDE = ((1024, 32, None), (2048, 32, 48 * MB), (4096, 16, 64 * MB),
               (8192, 16, 64 * MB), (16384, 16, 64 * MB))


def _tier(ny: int, halo: int):
    for cap_ny, tb_cap, limit in (_TIERS_H2 if halo <= 2 else _TIERS_WIDE):
        if ny <= cap_ny:
            return tb_cap, limit
    return None


def gather_feasible(ny: int, halo: int) -> bool:
    """True when the Pallas gather has a measured-stable (tile, vmem
    limit) configuration at this lane extent (tables cover ny <= 16384)
    AND the halo fits the kernel's fixed ``_PAD`` rows (halo <= 7; an
    8-halo request used to raise mid-trace from ``_run_gather`` — the
    auto-halo cap is 7 for the same reason). Callers
    (``ops.warp.warp2d``/``compose``) take the jnp path otherwise."""
    return halo + 1 <= _PAD and _tier(ny, halo) is not None


def _gather_kernel(row0_ref, data_pad_hbm, ux_ref, uy_ref, orig_ref, out_ref,
                   tile_sc, sem, *, halo: int, tb: int, nx: int, nc: int,
                   compose: bool):
    i = pl.program_id(0)

    # One aligned DMA: padded-data rows [i*tb, i*tb + tb + 2*PAD).
    dma = pltpu.make_async_copy(
        data_pad_hbm.at[:, pl.ds(i * tb, tb + 2 * _PAD), :], tile_sc, sem
    )
    dma.start()
    dma.wait()

    tile = tile_sc[:, :, :]            # [nc, tb + 2*PAD, ny]
    rows = tb + 2 * _PAD
    ny = tile.shape[-1]

    # row0: global row index of this array's first row (0 for whole-image
    # warps; the strip origin when called on shard_map local strips).
    gi = (lax.broadcasted_iota(jnp.int32, (tb, ny), 0) + i * tb + row0_ref[0])
    gj = lax.broadcasted_iota(jnp.int32, (tb, ny), 1)

    px = gi.astype(ux_ref.dtype) + ux_ref[:, :]
    py = gj.astype(uy_ref.dtype) + uy_ref[:, :]
    dx = jnp.floor(px)
    dy = jnp.floor(py)
    fx = px - dx
    fy = py - dy
    dxi = dx.astype(jnp.int32)
    dyi = dy.astype(jnp.int32)
    in_bounds = (dxi >= 0) & (dxi < nx) & (dyi >= 0) & (dyi < ny)
    rx = dxi - gi
    ry = dyi - gj

    # Output row r corresponds to padded-tile row r + PAD; tap offset a
    # reads padded rows r + a + PAD — a sublane roll by -(a+PAD) (no wrap
    # reaches r < tb) followed by the aligned [0:tb] slice. Lane offsets b
    # are lane rolls (wrap lands only where weights/bounds mask it).
    # Hat-accumulation gather (round 4, see demons_fused._bilinear_tile):
    # each integer offset (a, b) is weighted by the per-axis bilinear hat
    # weights and accumulated directly — (2h+2)^2 + (2h+2) rolls and one
    # fma per offset, vs the r4-r6 select chain's 4(2h+1)^2 rolls + 4
    # selects per offset and 4 live g-tile accumulators. Outputs are
    # bit-identical under the displacement contract: the weights are the
    # ORIGINAL w00/w10/w01/w11 float expressions placed over the offset
    # enumeration, nonzero terms land in the original g00,g10,g01,g11
    # accumulation order, and every other term is an exact +-0.
    def lane(b):
        return pltpu.roll(tile, (ny - b) % ny, 2)

    def rolled(src, a):
        shifted = pltpu.roll(src, (rows - (a + _PAD)) % rows, 1)
        return shifted[:, 0:tb, :]

    has_x1 = dxi < nx - 1
    has_y1 = dyi < ny - 1
    one_m_fx = 1.0 - fx
    one_m_fy = 1.0 - fy
    w00 = one_m_fx * one_m_fy
    w10 = jnp.where(has_x1, fx * one_m_fy, 0.0)
    w01 = jnp.where(has_y1, one_m_fx * fy, 0.0)
    w11 = jnp.where(has_x1 & has_y1, fx * fy, 0.0)
    weight = w00 + w10 + w01 + w11
    safe_w = jnp.where(weight != 0, weight, 1.0)

    def hat(r, frac, one_m_frac, has1, o):
        return jnp.where(
            r == o, one_m_frac,
            jnp.where((r == o - 1) & has1, frac, 0.0),
        )

    wx_list = [hat(rx, fx, one_m_fx, has_x1, a)
               for a in range(-halo, halo + 2)]
    value = None
    for b in range(-halo, halo + 2):
        lane_b = lane(b)
        wy_b = hat(ry, fy, one_m_fy, has_y1, b)
        for a in range(-halo, halo + 2):
            m = (wx_list[a + halo] * wy_b)[None]
            term = m * rolled(lane_b, a)
            value = term if value is None else value + term

    if compose:
        # u_inc + warped(u_total) in bounds (increment-only when weight==0);
        # old u_total out of bounds. orig_ref carries u_total's block; the
        # increment is (ux, uy) stacked.
        inc = jnp.stack([ux_ref[:, :], uy_ref[:, :]])
        inc_plus = inc + jnp.where(weight != 0, value / safe_w, 0.0)
        out_ref[:, :, :] = jnp.where(in_bounds, inc_plus, orig_ref[:, :, :])
    else:
        ok = in_bounds & (weight != 0)
        out_ref[:, :, :] = jnp.where(ok, value / safe_w, orig_ref[:, :, :])


def _run_gather(data, ux, uy, orig, halo: int, tb: int, compose: bool,
                row0=None, nx_glob=None, prepadded: bool = False):
    """``row0``/``nx_glob`` override the global row origin and global x
    extent for strip-local calls (inside shard_map); default whole-image.
    ``prepadded``: ``data`` already carries ``_PAD`` extra rows on each side
    (neighbour halos from a ppermute exchange) instead of the zero pad."""
    if prepadded:
        nc, nx, ny = data.shape
        nx -= 2 * _PAD
    else:
        nc, nx, ny = data.shape

    # Mosaic needs 8-aligned sublane DMA offsets, so tb must be a multiple
    # of 8; when nx has no 8-aligned divisor, append junk rows up to the
    # next multiple of 8 (below the bottom halo — tap masks never select
    # them for real rows) and slice the output back. Without this, an odd
    # tb (e.g. 15 for nx=120) stalls the Mosaic compiler for minutes.
    nx_out = nx
    extra = (-nx) % 8
    if extra:
        data = jnp.pad(data, ((0, 0), (0, extra), (0, 0)))
        ux = jnp.pad(ux, ((0, extra), (0, 0)))
        uy = jnp.pad(uy, ((0, extra), (0, 0)))
        orig = jnp.pad(orig, ((0, 0), (0, extra), (0, 0)))
        nx += extra
    # Row tile + vmem limit from the measured tier table above;
    # ``gather_feasible`` tells callers when no tier exists, so they can
    # take the jnp roll path instead.
    tier = _tier(ny, halo)
    tb_cap, vmem_limit = tier if tier is not None else (8, 64 * MB)
    if tb <= 0 or nx % tb != 0 or tb % 8 != 0:
        start = min(tb if 0 < tb and tb % 8 == 0 else tb_cap, nx)
        tb = 8
        for cand in range(start, 7, -8):
            if nx % cand == 0:
                tb = cand
                break
    if halo + 1 > _PAD:
        raise ValueError(f"halo {halo} too large for pad {_PAD}")
    nblocks = nx // tb

    data_pad = data if prepadded else jnp.pad(data, ((0, 0), (_PAD, _PAD), (0, 0)))
    if row0 is None:
        row0 = jnp.zeros((1,), jnp.int32)
    else:
        row0 = jnp.asarray(row0, jnp.int32).reshape(1)
    nx_bound = nx_out if nx_glob is None else nx_glob  # real extent, not pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded data, DMA'd manually
            pl.BlockSpec((tb, ny), lambda i, _s: (i, 0)),
            pl.BlockSpec((tb, ny), lambda i, _s: (i, 0)),
            pl.BlockSpec((nc, tb, ny), lambda i, _s: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((nc, tb, ny), lambda i, _s: (0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((nc, tb + 2 * _PAD, ny), data.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _gather_kernel, halo=halo, tb=tb, nx=nx_bound, nc=nc, compose=compose,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=compiler_params(vmem_limit),
        out_shape=jax.ShapeDtypeStruct((nc, nx, ny), data.dtype),
    )(row0, data_pad, ux, uy, orig)
    return out[:, :nx_out] if extra else out


@functools.partial(jax.jit, static_argnames=("halo", "tb"))
def warp2d_pallas(image, u, halo: int = 2, tb: int = 0):
    """Bounded-displacement backward warp (``ops.warp.warp2d`` semantics),
    Pallas-fused. ``image [nx, ny]``, ``u [2, nx, ny]``."""
    out = _run_gather(image[None], u[0], u[1], image[None], halo, tb, False)
    return out[0]


@functools.partial(jax.jit, static_argnames=("halo", "tb"))
def compose_pallas(u_total, u_inc, halo: int = 2, tb: int = 0):
    """Bounded-displacement motion composition (``ops.warp.compose``
    semantics), Pallas-fused. Both fields ``[2, nx, ny]``."""
    return _run_gather(u_total, u_inc[0], u_inc[1], u_total, halo, tb, True)


def warp2d_pallas_strip(image_pad, u, row0, nx_glob: int,
                        halo: int = 2, tb: int = 0):
    """Strip-local warp for shard_map x-strips. ``image_pad
    [nxl + 2*_PAD, ny]`` carries ``_PAD`` rows of neighbour halo on each
    side (ppermute-exchanged; zeros at the global boundary, matching the
    whole-image zero pad); ``u [2, nxl, ny]`` is the local displacement
    block; ``row0`` (traced scalar ok — scalar-prefetched) is the strip's
    global first-row index and ``nx_glob`` the static global x extent.
    Same semantics/contract as ``warp2d_pallas`` restricted to the strip."""
    orig = image_pad[None, _PAD:-_PAD]
    out = _run_gather(image_pad[None], u[0], u[1], orig, halo, tb, False,
                      row0=row0, nx_glob=nx_glob, prepadded=True)
    return out[0]


def compose_pallas_strip(u_total_pad, u_inc, row0, nx_glob: int,
                         halo: int = 2, tb: int = 0):
    """Strip-local composition: ``u_total_pad [2, nxl + 2*_PAD, ny]`` with
    neighbour halos in the pad rows, ``u_inc [2, nxl, ny]`` local."""
    orig = u_total_pad[:, _PAD:-_PAD]
    return _run_gather(u_total_pad, u_inc[0], u_inc[1], orig, halo, tb, True,
                       row0=row0, nx_glob=nx_glob, prepadded=True)
