"""Fused demons iteration as two Pallas TPU kernels.

The jnp demons step (``solvers.demons.make_demons_step``, reference
``src/regularization/Demons/DemonsThirions.cpp:18-42``) chains
warp -> gradient -> force -> Gaussian(fluid) -> compose -> Gaussian
(diffusion); even with the fused warp/compose kernels each link makes its
own HBM round trip (~6 per iteration). These kernels collapse the chain to
TWO passes that keep every intermediate in VMEM:

- ``demons_correspondence_pallas`` (kernel A): streamed read of
  (iaux, iref, u), one write of the sigma_fluid-smoothed correspondence.
  Inside one row-tile pass: masked-roll bilinear warp (the
  ``warp_fused`` select chain), one-sided-border gradient, the demons
  force with its 0/0 guard, and the boundary-renormalized separable
  Gaussian (denominators from global coordinates).
- ``compose_smooth_pallas`` (kernel B): streamed read of (u, c), one
  write of the sigma_diffusion-smoothed composition ``smooth(c + u(x+c))``.

Thirion = A ∘ B; diffeomorphic = A ∘ expmap ∘ B (the exp-map squarings
stay on the existing fused compose kernel). Bit-identical to the jnp
chain: every stage reproduces its jnp counterpart's float expression
order (tested in tests/test_pallas_kernels.py, interpret + TPU).

Tiling: all stages compute on the full DMA'd tile of ``tb + 2*_PAD``
rows (inputs are pre-padded by ``_PAD`` rows of zeros). The pad rows hold
garbage results; the final smooth's tap masks (global-row validity) zero
their contribution, exactly like the jnp path's zero padding. Computing on
the 8-aligned full tile wastes ``2*_PAD/tb`` of VPU work but keeps every
value slice at offset 0 / 8-aligned length — Mosaic stalls on odd sublane
extents (see warp_fused).

Constraint: ``halo + kernelwidth//2 + 2 <= _PAD`` (= 8); the caller falls
back to the jnp path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflow2d_tpu.pallas_kernels import MB, compiler_params
from opticalflow2d_tpu.pallas_kernels.warp_fused import _PAD


def _select_taps(tile, rx, ry, halo: int, rows: int, ny: int):
    """The masked-roll bilinear tap fetch on a full padded tile.

    ``tile [nc, rows, ny]`` (sublane row r = padded row r); ``rx, ry
    [rows, ny]`` are floor offsets relative to each PADDED row's own
    position. Returns (g00, g10, g01, g11) with tap (a, b) for output row
    r read from padded row r + a (sublane roll; wrapped rows are masked by
    the caller's weights/bounds) and lane offset b.

    oy-outer rolling pair: only lane(oy) and lane(oy+1) are live at any
    point — 2 lane-rolled tiles in VMEM instead of the 2*halo+2 an
    ox-outer nest keeps live (same total roll count). This admits ~3x
    larger tile footprints (kernel B compiles at tb=64 @1024^2 and tb=8
    @4096^2 where ox-outer blows Mosaic's 16M scoped vmem), and the
    within-harness r4 decision sweep measured it >= the ox-outer
    schedule everywhere both compile (deltas below the ~130 us/iter
    tunnel-jitter floor; benchmarks/RESULTS.md round 4). Outputs are
    bit-identical either way — the (ox, oy) masks are disjoint, so each
    element is written by at most one select.
    """
    def lane(b):
        return pltpu.roll(tile, (ny - b) % ny, 2)

    def rolled(src, a):
        return pltpu.roll(src, (rows - a) % rows, 1)

    nc = tile.shape[0]
    z = jnp.zeros((nc, rows, ny), tile.dtype)
    g00, g10, g01, g11 = z, z, z, z
    lane_hi = lane(-halo)
    for oy in range(-halo, halo + 1):
        lane_lo = lane_hi          # lane(oy)
        lane_hi = lane(oy + 1)
        my = ry == oy
        for ox in range(-halo, halo + 1):
            m = my & (rx == ox)
            g00 = jnp.where(m, rolled(lane_lo, ox), g00)
            g10 = jnp.where(m, rolled(lane_lo, ox + 1), g10)
            g01 = jnp.where(m, rolled(lane_hi, ox), g01)
            g11 = jnp.where(m, rolled(lane_hi, ox + 1), g11)
    return g00, g10, g01, g11


# Gather implementation switch: "hat" = per-offset weight accumulation
# (fewer rolls: (2h+2)^2 + (2h+2) total vs the select chain's 4(2h+1)^2 +
# (2h+2), and no 4 live g-tile accumulators); "select" = the r4-r6 tap
# select chain. Outputs are bit-identical under the displacement contract
# (weights use the exact same float expressions; taps accumulate in the
# original g00,g10,g01,g11 order with exact-zero terms in between), so
# this is a pure scheduling choice. Module-level so benchmarks can A/B it.
_GATHER_IMPL = "hat"


def _hat_weights(r, frac, one_m_frac, has1, halo: int):
    """Per-integer-offset bilinear weights along one axis: offset ``o``
    carries ``1-frac`` where ``o == r`` (the floor tap), ``frac`` where
    ``o == r+1`` (the +1 tap, masked by ``has1``), else exact 0. The float
    values are the ORIGINAL w00/w10-factor expressions — only their
    placement over the offset enumeration changes."""
    ws = []
    for o in range(-halo, halo + 2):
        ws.append(jnp.where(
            r == o, one_m_frac,
            jnp.where((r == o - 1) & has1, frac, 0.0),
        ))
    return ws


def _accumulate_hat(data_tile, wx, wy, halo: int, rows: int, ny: int):
    """``sum_{b,a} wy[b] * wx[a] * roll(tile, a, b)`` with b (y) outer and
    a (x) inner — the nonzero terms land in the original g00, g10, g01,
    g11 order, so left-to-right accumulation is bit-identical to the
    select-chain path's ``g00*w00 + g10*w10 + g01*w01 + g11*w11``."""
    value = None
    for b in range(-halo, halo + 2):
        lane_b = pltpu.roll(data_tile, (ny - b) % ny, 2)
        for a in range(-halo, halo + 2):
            m = (wx[a + halo] * wy[b + halo])[None]
            term = m * pltpu.roll(lane_b, (rows - a) % rows, 1)
            value = term if value is None else value + term
    return value


def _bilinear_tile(data_tile, ux, uy, gi, gj, halo: int, nx: int,
                   per_channel: bool = False):
    """Warp/compose core on a full padded tile: global coords, weights,
    edge renormalization, floor-cell bounds — ``ops.warp._bilinear_from_taps``
    expression-for-expression. ``gi, gj [rows, ny]`` are GLOBAL coords of
    each padded row; ``data_tile [nc, rows, ny]``.

    ``per_channel=True`` runs the tap chain one channel at a time so only
    one channel's roll cache is live at once (~half the VMEM peak for
    2-channel composes; same rolls in total, bit-identical output)."""
    nc, rows, ny = data_tile.shape
    px = gi.astype(ux.dtype) + ux
    py = gj.astype(uy.dtype) + uy
    dx = jnp.floor(px)
    dy = jnp.floor(py)
    fx = px - dx
    fy = py - dy
    dxi = dx.astype(jnp.int32)
    dyi = dy.astype(jnp.int32)
    in_bounds = (dxi >= 0) & (dxi < nx) & (dyi >= 0) & (dyi < ny)
    rx = dxi - gi
    ry = dyi - gj

    has_x1 = dxi < nx - 1
    has_y1 = dyi < ny - 1
    w00 = (1.0 - fx) * (1.0 - fy)
    w10 = jnp.where(has_x1, fx * (1.0 - fy), 0.0)
    w01 = jnp.where(has_y1, (1.0 - fx) * fy, 0.0)
    w11 = jnp.where(has_x1 & has_y1, fx * fy, 0.0)
    weight = w00 + w10 + w01 + w11

    if _GATHER_IMPL == "hat":
        wx = _hat_weights(rx, fx, 1.0 - fx, has_x1, halo)
        wy = _hat_weights(ry, fy, 1.0 - fy, has_y1, halo)
        if per_channel and nc > 1:
            value = jnp.concatenate([
                _accumulate_hat(data_tile[ch:ch + 1], wx, wy, halo, rows, ny)
                for ch in range(nc)
            ], axis=0)
        else:
            value = _accumulate_hat(data_tile, wx, wy, halo, rows, ny)
        return value, weight, in_bounds

    if per_channel and nc > 1:
        vals = []
        for ch in range(nc):
            g00, g10, g01, g11 = _select_taps(
                data_tile[ch:ch + 1], rx, ry, halo, rows, ny
            )
            vals.append(g00 * w00 + g10 * w10 + g01 * w01 + g11 * w11)
        value = jnp.concatenate(vals, axis=0)
    else:
        g00, g10, g01, g11 = _select_taps(data_tile, rx, ry, halo, rows, ny)
        value = g00 * w00 + g10 * w10 + g01 * w01 + g11 * w11
    return value, weight, in_bounds


def _smooth_tile(f, gi_col, gj_row, taps, c: int, rows: int, tb: int,
                 nx: int, ny: int, pad: int = _PAD):
    """Boundary-renormalized separable Gaussian on a padded tile:
    ``f [nc, rows, ny]`` -> ``[nc, tb, ny]`` (output row r = padded row
    r + ``pad``). Matches ``ops.conv.convolve2d_clip``: zero-contribution
    taps outside the global grid (masks instead of zero padding, same
    adds), then division by the separable in-bounds tap-weight product.
    ``gi_col [rows, 1]`` global row of each padded row; ``gj_row [1, ny]``.
    """
    k = len(taps)

    # x-pass: out row r (padded row r+pad) taps padded rows r+pad+t-c.
    # All contributions from outside the global [0, nx) rows are zeroed
    # (the jnp path's zero padding).
    num_x = None
    gi_center = gi_col[pad : pad + tb]  # [tb, 1] global rows of output
    for t in range(k):
        off = t - c
        shifted = pltpu.roll(f, (rows - (pad + off)) % rows, 1)[:, 0:tb, :]
        valid = (gi_center + off >= 0) & (gi_center + off <= nx - 1)
        term = jnp.where(valid[None], shifted * float(taps[t]), 0.0)
        num_x = term if num_x is None else num_x + term

    # y-pass on num_x [nc, tb, ny]: lane rolls with global-column masks.
    num = None
    for t in range(k):
        off = t - c
        shifted = pltpu.roll(num_x, (ny - off) % ny, 2)
        valid = (gj_row + off >= 0) & (gj_row + off <= ny - 1)
        term = jnp.where(valid[None], shifted * float(taps[t]), 0.0)
        num = term if num is None else num + term

    # Separable renormalization from global positions (same per-tap adds
    # as the jnp denominator convolution: g[t] or 0.0 in t order).
    fdt = f.dtype
    den_x = None
    den_y = None
    gi_f = gi_center.astype(fdt)
    gj_f = gj_row.astype(fdt)
    for t in range(k):
        off = t - c
        tx = jnp.where((gi_f + off >= 0) & (gi_f + off <= nx - 1),
                       jnp.full_like(gi_f, float(taps[t])), 0.0)
        ty = jnp.where((gj_f + off >= 0) & (gj_f + off <= ny - 1),
                       jnp.full_like(gj_f, float(taps[t])), 0.0)
        den_x = tx if den_x is None else den_x + tx
        den_y = ty if den_y is None else den_y + ty
    den = den_x * den_y  # [tb, 1] * [1, ny] -> [tb, ny]
    return num / den[None]


def _corr_kernel(row0_ref, iaux_hbm, iref_hbm, u_hbm, out_ref,
                 iaux_sc, iref_sc, u_sc, sem0, sem1, sem2, *,
                 halo: int, c: int, taps, tb: int, nx: int, ny: int,
                 sigma_i: float, sigma_x: float):
    i = pl.program_id(0)
    rows = tb + 2 * _PAD

    d0 = pltpu.make_async_copy(iaux_hbm.at[pl.ds(i * tb, rows), :], iaux_sc, sem0)
    d1 = pltpu.make_async_copy(iref_hbm.at[pl.ds(i * tb, rows), :], iref_sc, sem1)
    d2 = pltpu.make_async_copy(u_hbm.at[:, pl.ds(i * tb, rows), :], u_sc, sem2)
    d0.start(); d1.start(); d2.start()
    d0.wait(); d1.wait(); d2.wait()

    iaux = iaux_sc[:, :]
    iref = iref_sc[:, :]
    u = u_sc[:, :, :]

    row0 = row0_ref[0]
    gi = (lax.broadcasted_iota(jnp.int32, (rows, ny), 0)
          + i * tb - _PAD + row0)
    gj = lax.broadcasted_iota(jnp.int32, (rows, ny), 1)

    # 1. warp iaux by u on the full padded tile (warp2d semantics: OOB /
    #    zero-weight pixels keep the iaux value).
    value, weight, in_b = _bilinear_tile(iaux[None], u[0], u[1], gi, gj,
                                         halo, nx)
    ok = in_b & (weight != 0)
    safe_w = jnp.where(weight != 0, weight, 1.0)
    iwar = jnp.where(ok, value[0] / safe_w, iaux)

    # 2. gradient (ops.grid.spatial_gradient: central, one-sided at the
    #    global borders). Pad-row neighbours of real rows hold real data
    #    (the DMA window covers them); rolled-in garbage lands only on pad
    #    rows, which the smooth's masks zero.
    nxt_x = pltpu.roll(iwar, rows - 1, 0)   # row r+1
    prv_x = pltpu.roll(iwar, 1, 0)          # row r-1
    gx = jnp.where(gi == 0, nxt_x - iwar,
                   jnp.where(gi == nx - 1, iwar - prv_x,
                             (nxt_x - prv_x) * 0.5))
    nxt_y = pltpu.roll(iwar, ny - 1, 1)
    prv_y = pltpu.roll(iwar, 1, 1)
    gy = jnp.where(gj == 0, nxt_y - iwar,
                   jnp.where(gj == ny - 1, iwar - prv_y,
                             (nxt_y - prv_y) * 0.5))
    it = iwar - iref

    # 3. demons force (solvers.base.demons_force, incl. the 0/0 guard).
    den = gx ** 2 + gy ** 2 + it ** 2 * (sigma_i * sigma_i) / (sigma_x * sigma_x)
    pos = den > 0
    safe_den = jnp.where(pos, den, 1.0)
    cx = jnp.where(pos, (gx * it * -1.0) / safe_den, 0.0)
    cy = jnp.where(pos, (gy * it * -1.0) / safe_den, 0.0)
    corr = jnp.stack([cx, cy])

    # 4. sigma_fluid smoothing with boundary renormalization.
    out_ref[:, :, :] = _smooth_tile(
        corr, gi[:, 0:1], gj[0:1, :], taps, c, rows, tb, nx, ny
    )


def _compose_kernel(row0_ref, u_hbm, c_hbm, out_ref, u_sc, c_sc, sem0, sem1,
                    *, halo: int, c: int, taps, tb: int, nx: int, ny: int):
    i = pl.program_id(0)
    rows = tb + 2 * _PAD

    d0 = pltpu.make_async_copy(u_hbm.at[:, pl.ds(i * tb, rows), :], u_sc, sem0)
    d1 = pltpu.make_async_copy(c_hbm.at[:, pl.ds(i * tb, rows), :], c_sc, sem1)
    d0.start(); d1.start()
    d0.wait(); d1.wait()

    u = u_sc[:, :, :]
    cc = c_sc[:, :, :]

    row0 = row0_ref[0]
    gi = (lax.broadcasted_iota(jnp.int32, (rows, ny), 0)
          + i * tb - _PAD + row0)
    gj = lax.broadcasted_iota(jnp.int32, (rows, ny), 1)

    # compose(u, c) on the full padded tile (ops.warp.compose semantics).
    value, weight, in_b = _bilinear_tile(u, cc[0], cc[1], gi, gj, halo, nx)
    safe_w = jnp.where(weight != 0, weight, 1.0)
    inc_plus = cc + jnp.where(weight != 0, value / safe_w, 0.0)
    composed = jnp.where(in_b, inc_plus, u)

    out_ref[:, :, :] = _smooth_tile(
        composed, gi[:, 0:1], gj[0:1, :], taps, c, rows, tb, nx, ny
    )


# Measured (tile cap, vmem limit) tables, TPU v5e (benchmarks/
# r4_results.jsonl, the `race_*` within-run tier races; see
# pallas_kernels.__init__ for the scoped-vmem policy). Larger tiles need
# a raised Mosaic limit (measured stacks up to ~25M at halo 2, ~87M at
# halo 4/tb 64/ny 4096) but win big — the full fused step at 4096^2 runs
# 7.6 ms at (tb=64, 64M) vs 14.5 ms at the largest default-limit tile;
# kernel B @1024^2 runs 168.0 us at (256, 48M) vs 233.0 at (64, default).
# Keys: lane-extent tier -> (tile cap, vmem_limit_bytes | None).
_TIERS_H2 = ((1024, 256, 48 * MB), (2048, 128, 48 * MB),
             (4096, 64, 64 * MB))
# halo >= 3 triples the live temporaries (81 tap masks vs 25); tb=64
# @4096 needs ~87M — past the runtime-penalty-free limit range — so the
# cap drops a tile instead (validated: A/B (tb=32, 64M) @4096 compile).
_TIERS_WIDE = ((1024, 128, 48 * MB), (2048, 64, 64 * MB),
               (4096, 32, 64 * MB))


def _tier(ny: int, halo: int):
    for cap_ny, tb_cap, limit in (_TIERS_H2 if halo <= 2 else _TIERS_WIDE):
        if ny <= cap_ny:
            return tb_cap, limit
    return None


def fused_feasible(nx: int, ny: int, halo: int) -> bool:
    """True when the fused demons kernels have a measured-stable
    (tile, vmem-limit) configuration at this shape; callers fall back to
    the op-chain step (lighter pallas gathers) otherwise."""
    return _tier(ny, halo) is not None


def _pick_tb(nx: int, ny: int, nc_chain: int, halo: int,
             tb: int = 0) -> tuple[int, int | None]:
    """Row tile + Mosaic vmem limit for the fused gather kernels: the
    largest 8-aligned divisor of ``nx`` within the lane tier's cap, with
    the tier's measured limit. An explicit ``tb`` is honored when it
    divides nx and is 8-aligned; otherwise the same descending divisor
    search runs. (``nc_chain`` kept for call-site clarity; the r4
    decision sweep retired the cached ox-outer schedule it
    parameterized.)"""
    tier = _tier(ny, halo)
    tb_cap, limit = tier if tier is not None else (8, 64 * MB)
    # The 2-channel kernel (compose+smooth) carries double the gather
    # temporaries: at halo 4 / ny 4096 its tb=32 stack measured 72.35M
    # (past the runtime-neutral limit range), so it halves the tile.
    if halo >= 3 and ny > 2048 and nc_chain >= 2:
        tb_cap = min(tb_cap, 16)
    if tb <= 0 or nx % tb != 0 or tb % 8 != 0:
        start = min(tb if 0 < tb and tb % 8 == 0 else tb_cap, nx)
        tb = 8
        for cand in range(start, 7, -8):
            if nx % cand == 0:
                tb = cand
                break
    return tb, limit


def _pad_rows(a, extra: int):
    pad = [(0, 0)] * (a.ndim - 2) + [(_PAD, _PAD + extra), (0, 0)]
    return jnp.pad(a, pad)


def fused_supported(halo: int, kernelwidth: int) -> bool:
    """Tap reach of the in-tile chain must fit the _PAD window: the
    deepest dependency is gradient row (+-c+-1) -> warp taps (+-(h+1))."""
    return halo + kernelwidth // 2 + 2 <= _PAD


@functools.partial(jax.jit, static_argnames=(
    "sigma_i", "sigma_x", "sigma_fluid", "kernelwidth", "halo", "tb",
    "nx_glob", "prepadded"))
def demons_correspondence_pallas(iaux, iref, u, sigma_i: float,
                                 sigma_x: float, sigma_fluid: float,
                                 kernelwidth: int, halo: int = 2,
                                 tb: int = 0, row0=None, nx_glob=None,
                                 prepadded: bool = False):
    """Fused kernel A: ``gaussian_smooth(demons_force(derivatives(iref,
    warp2d(iaux, u))), sigma_fluid)`` in one VMEM-resident pass.
    ``iaux, iref [nx, ny]``, ``u [2, nx, ny]`` -> ``[2, nx, ny]``.
    Contract: in-bounds floor offsets of ``u`` within ``halo``.

    ``row0``/``nx_glob``/``prepadded``: strip-local mode — the inputs
    already carry ``_PAD`` rows of neighbour halo on each side (ppermute
    exchanged), ``row0`` (scalar-prefetched) is the strip's global first
    row and ``nx_glob`` the static global x extent."""
    from opticalflow2d_tpu.ops.conv import gaussian_kernel_1d

    if prepadded:
        nx = iaux.shape[0] - 2 * _PAD
        ny = iaux.shape[1]
    else:
        nx, ny = iaux.shape
    c = (kernelwidth - 1) // 2
    taps = tuple(float(v) for v in gaussian_kernel_1d(sigma_fluid, kernelwidth))

    nx_out = nx
    extra = (-nx) % 8
    if extra:
        iaux = jnp.pad(iaux, ((0, extra), (0, 0)))
        iref = jnp.pad(iref, ((0, extra), (0, 0)))
        u = jnp.pad(u, ((0, 0), (0, extra), (0, 0)))
        nx += extra
    tb, vmem_limit = _pick_tb(nx, ny, 1, halo, tb)
    nblocks = nx // tb
    nx_bound = nx_out if nx_glob is None else nx_glob

    if prepadded:
        iaux_p, iref_p, u_p = iaux, iref, u
    else:
        iaux_p = _pad_rows(iaux, 0)
        iref_p = _pad_rows(iref, 0)
        u_p = _pad_rows(u, 0)
    if row0 is None:
        row0 = jnp.zeros((1,), jnp.int32)
    else:
        row0 = jnp.asarray(row0, jnp.int32).reshape(1)

    rows = tb + 2 * _PAD
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((2, tb, ny), lambda i, _s: (0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((rows, ny), iaux.dtype),
            pltpu.VMEM((rows, ny), iref.dtype),
            pltpu.VMEM((2, rows, ny), u.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _corr_kernel, halo=halo, c=c, taps=taps, tb=tb, nx=nx_bound, ny=ny,
        sigma_i=sigma_i, sigma_x=sigma_x,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=compiler_params(vmem_limit),
        out_shape=jax.ShapeDtypeStruct((2, nx, ny), iaux.dtype),
    )(row0, iaux_p, iref_p, u_p)
    return out[:, :nx_out] if extra else out


@functools.partial(jax.jit, static_argnames=(
    "sigma_diffusion", "kernelwidth", "halo", "tb", "nx_glob", "prepadded"))
def compose_smooth_pallas(u_total, c_inc, sigma_diffusion: float,
                          kernelwidth: int, halo: int = 2, tb: int = 0,
                          row0=None, nx_glob=None, prepadded: bool = False):
    """Fused kernel B: ``gaussian_smooth(compose(u_total, c_inc),
    sigma_diffusion)`` in one VMEM-resident pass. Both fields
    ``[2, nx, ny]``. Contract: in-bounds floor offsets of ``c_inc`` within
    ``halo``. ``row0``/``nx_glob``/``prepadded``: strip-local mode (see
    ``demons_correspondence_pallas``)."""
    from opticalflow2d_tpu.ops.conv import gaussian_kernel_1d

    if prepadded:
        nx = u_total.shape[1] - 2 * _PAD
        ny = u_total.shape[2]
    else:
        _, nx, ny = u_total.shape
    c = (kernelwidth - 1) // 2
    taps = tuple(float(v) for v in
                 gaussian_kernel_1d(sigma_diffusion, kernelwidth))

    nx_out = nx
    extra = (-nx) % 8
    if extra:
        u_total = jnp.pad(u_total, ((0, 0), (0, extra), (0, 0)))
        c_inc = jnp.pad(c_inc, ((0, 0), (0, extra), (0, 0)))
        nx += extra
    tb, vmem_limit = _pick_tb(nx, ny, 2, halo, tb)
    nblocks = nx // tb
    nx_bound = nx_out if nx_glob is None else nx_glob

    if prepadded:
        u_p, c_p = u_total, c_inc
    else:
        u_p = _pad_rows(u_total, 0)
        c_p = _pad_rows(c_inc, 0)
    if row0 is None:
        row0 = jnp.zeros((1,), jnp.int32)
    else:
        row0 = jnp.asarray(row0, jnp.int32).reshape(1)

    rows = tb + 2 * _PAD
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((2, tb, ny), lambda i, _s: (0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, rows, ny), u_total.dtype),
            pltpu.VMEM((2, rows, ny), c_inc.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _compose_kernel, halo=halo, c=c, taps=taps, tb=tb, nx=nx_bound, ny=ny,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=compiler_params(vmem_limit),
        out_shape=jax.ShapeDtypeStruct((2, nx, ny), u_total.dtype),
    )(row0, u_p, c_p)
    return out[:, :nx_out] if extra else out
