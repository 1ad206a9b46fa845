"""Single-pass fused Thirion demons iteration: ONE Pallas TPU kernel.

The two-kernel fused path (``demons_fused``) still writes the smoothed
correspondence to HBM between kernel A and kernel B — two full HBM round
trips per iteration, with kernel B alone 2/3 of the measured step. For
the Thirion composition/addition paths the correspondence is consumed
immediately (reference ``src/regularization/Demons/DemonsThirions.cpp:
18-42`` — force, fluid smooth, accumulate, diffusion smooth back to
back), so the whole iteration fits in one VMEM-resident pass:

    warp -> gradient -> force -> Gaussian(sigma_fluid)
         -> compose/add -> Gaussian(sigma_diffusion) -> write u_new

Diffeomorphic demons stays on the two-kernel path: its exponential map
needs a *global* maxabs between the smooths, which no tile can know.

Every stage reproduces its ``demons_fused`` counterpart's float
expression order, so results are bit-identical to the two-kernel fused
path (and to the jnp chain) — pinned in tests/test_pallas_kernels.py.

Unlike the two-kernel path (which ``jnp.pad``s its inputs by ``_PAD``
rows every call — a full extra read+write of every input plane), the
dense entry point here loads its row halos through *clamped* BlockSpec
up/center/down blocks, elastic_block-style: zero padding copies, the
tile's halo rows stream straight from the neighbouring blocks. Rows the
clamp duplicates at the global edges carry garbage, which every stage
masks through global-row validity (the same masks that neutralize zero
padding on the jnp path). The strip-local entry point (``prepadded``)
keeps the manual-DMA form: SPMD callers have already exchanged real halo
rows into the padding.

Tile validity: output rows tap ``composed`` within +-cd (diffusion
smooth, cd = kernelwidth//2); ``composed`` at row r taps the smoothed
correspondence at r (pointwise) and ``u`` at r +- (halo+1); the smoothed
correspondence taps ``corr`` within +-cf; ``corr`` taps ``iwar`` within
+-1 (gradient); ``iwar`` taps ``iaux`` within +-(halo+1). Total reach
from an output row: ``2*(kw//2) + halo + 2`` rows — the required pad,
rounded up to the sublane tile (8).

Correspondence boundedness is STATIC for Thirion: the demons force
satisfies ``|c| <= sigma_x / (2*sigma_i)`` per component (AM-GM on the
denominator ``|grad|^2 + It^2 sigma_i^2/sigma_x^2``), and the
renormalized Gaussian is an average, so the compose stage needs no
runtime displacement check when ``sigma_x/(2*sigma_i) <= halo`` — only
the warp stage's check on ``u`` remains (the caller's ``lax.cond``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflow2d_tpu.pallas_kernels import MB, compiler_params
from opticalflow2d_tpu.pallas_kernels.demons_fused import (
    _bilinear_tile,
    _smooth_tile,
)


def required_pad(halo: int, kernelwidth: int) -> int:
    """Row reach of the in-tile chain (see module docstring), 8-aligned."""
    reach = 2 * (kernelwidth // 2) + halo + 2
    return ((reach + 7) // 8) * 8


def _smooth_tile_full(f, gi_col, gj_row, taps, c: int, rows: int,
                      nx: int, ny: int):
    """Boundary-renormalized separable Gaussian at EVERY padded-tile row:
    ``f [nc, rows, ny] -> [nc, rows, ny]``. Per-element float ops are
    identical to ``demons_fused._smooth_tile`` (same tap order, same
    masks), so rows both compute agree bitwise; rows whose taps fall
    entirely outside the global grid divide 0/0 -> NaN, which downstream
    consumers only touch through masked selects."""
    k = len(taps)

    num_x = None
    for t in range(k):
        off = t - c
        shifted = pltpu.roll(f, (rows - off) % rows, 1)
        valid = (gi_col + off >= 0) & (gi_col + off <= nx - 1)
        term = jnp.where(valid[None], shifted * float(taps[t]), 0.0)
        num_x = term if num_x is None else num_x + term

    num = None
    for t in range(k):
        off = t - c
        shifted = pltpu.roll(num_x, (ny - off) % ny, 2)
        valid = (gj_row + off >= 0) & (gj_row + off <= ny - 1)
        term = jnp.where(valid[None], shifted * float(taps[t]), 0.0)
        num = term if num is None else num + term

    fdt = f.dtype
    den_x = None
    den_y = None
    gi_f = gi_col.astype(fdt)
    gj_f = gj_row.astype(fdt)
    for t in range(k):
        off = t - c
        tx = jnp.where((gi_f + off >= 0) & (gi_f + off <= nx - 1),
                       jnp.full_like(gi_f, float(taps[t])), 0.0)
        ty = jnp.where((gj_f + off >= 0) & (gj_f + off <= ny - 1),
                       jnp.full_like(gj_f, float(taps[t])), 0.0)
        den_x = tx if den_x is None else den_x + tx
        den_y = ty if den_y is None else den_y + ty
    den = den_x * den_y  # [rows, 1] * [1, ny] -> [rows, ny]
    return num / den[None]


def _onepass_body(iaux, iref, u, gi0, out_ref, diff_ref=None, prev_ref=None,
                  *, halo: int, halo_c: int,
                  cf: int, taps_f, cd: int, taps_d, tb: int, pad: int, nx,
                  ny: int, sigma_i: float, sigma_x: float, addition: bool,
                  with_errors: bool = False):
    """The full Thirion chain on one extended tile. ``iaux, iref [rows,
    ny]``, ``u [2, rows, ny]`` with ``rows = tb + 2*pad``; ``gi0`` the
    global row index of tile row 0 (traced scalar ok); ``nx`` the global
    x extent (traced ok for strip callers). Writes the interior ``[2,
    tb, ny]`` to ``out_ref``; with ``with_errors``, also this block's
    Logger partial sums (sum |u_new - u| and sum |u| magnitudes over its
    rows, broadcast across 8 sublanes) — both fields are already in VMEM,
    so the driver's relative-step error costs no extra HBM pass."""
    rows = tb + 2 * pad

    gi = lax.broadcasted_iota(jnp.int32, (rows, ny), 0) + gi0
    gj = lax.broadcasted_iota(jnp.int32, (rows, ny), 1)
    gi_col = gi[:, 0:1]
    gj_row = gj[0:1, :]

    # 1. warp iaux by u on the full padded tile (demons_fused._corr_kernel
    #    stage 1, expression-for-expression).
    value, weight, in_b = _bilinear_tile(iaux[None], u[0], u[1], gi, gj,
                                         halo, nx)
    ok = in_b & (weight != 0)
    safe_w = jnp.where(weight != 0, weight, 1.0)
    iwar = jnp.where(ok, value[0] / safe_w, iaux)

    # 2. gradient (central, one-sided at the global borders).
    nxt_x = pltpu.roll(iwar, rows - 1, 0)
    prv_x = pltpu.roll(iwar, 1, 0)
    gx = jnp.where(gi == 0, nxt_x - iwar,
                   jnp.where(gi == nx - 1, iwar - prv_x,
                             (nxt_x - prv_x) * 0.5))
    nxt_y = pltpu.roll(iwar, ny - 1, 1)
    prv_y = pltpu.roll(iwar, 1, 1)
    gy = jnp.where(gj == 0, nxt_y - iwar,
                   jnp.where(gj == ny - 1, iwar - prv_y,
                             (nxt_y - prv_y) * 0.5))
    it = iwar - iref

    # 3. demons force with the 0/0 guard (solvers.base.demons_force).
    den = gx ** 2 + gy ** 2 + it ** 2 * (sigma_i * sigma_i) / (sigma_x * sigma_x)
    pos = den > 0
    safe_den = jnp.where(pos, den, 1.0)
    cx = jnp.where(pos, (gx * it * -1.0) / safe_den, 0.0)
    cy = jnp.where(pos, (gy * it * -1.0) / safe_den, 0.0)
    corr = jnp.stack([cx, cy])

    # 4. sigma_fluid smoothing at every tile row (tap reach covered by pad).
    c_sm = _smooth_tile_full(corr, gi_col, gj_row, taps_f, cf, rows, nx, ny)

    # 5. accumulate into the motion (DemonsThirions.cpp:33-38): composition
    #    via the per-channel tap chain (half the roll-cache VMEM), or plain
    #    addition.
    if addition:
        composed = u + c_sm
    else:
        # The smoothed correspondence is statically bounded by
        # sigma_x/(2*sigma_i) (module docstring), so its floor offsets fit
        # halo_c = ceil(bound) << halo: a (2*halo_c+2)^2 select chain
        # instead of the warp's (2*halo+2)^2 — the single largest compute
        # cut in the chain (the kernel is VPU-bound, not HBM-bound:
        # benchmarks/r6_results.jsonl). Extra never-firing mask terms are
        # the only difference vs the two-kernel path, so outputs stay
        # bit-identical.
        value, weight, in_b = _bilinear_tile(u, c_sm[0], c_sm[1], gi, gj,
                                             halo_c, nx, per_channel=True)
        safe_w = jnp.where(weight != 0, weight, 1.0)
        inc_plus = c_sm + jnp.where(weight != 0, value / safe_w, 0.0)
        composed = jnp.where(in_b, inc_plus, u)

    # 6. sigma_diffusion smoothing of the interior rows -> output.
    out_val = _smooth_tile(
        composed, gi_col, gj_row, taps_d, cd, rows, tb, nx, ny, pad=pad
    )
    out_ref[:, :, :] = out_val

    if with_errors:
        # Logger partials (src/Logger.cpp:30-60 semantics, same row-partial
        # scheme as the blocked kernels). Rows past the true extent (the
        # pad-to-tile alignment rows) hold NaN from the 0/0 renormalized
        # smooth — mask them to 0 by global-row validity.
        gi_center = gi_col[pad:pad + tb]
        valid = (gi_center >= 0) & (gi_center <= nx - 1)
        u_int = u[:, pad:pad + tb, :]
        diff = out_val - u_int
        dmag = jnp.where(valid, jnp.sqrt(diff[0] ** 2 + diff[1] ** 2), 0.0)
        pmag = jnp.where(valid, jnp.sqrt(u_int[0] ** 2 + u_int[1] ** 2), 0.0)
        diff_ref[0, :, :] = jnp.broadcast_to(
            jnp.sum(dmag, axis=0, keepdims=True), (8, ny))
        prev_ref[0, :, :] = jnp.broadcast_to(
            jnp.sum(pmag, axis=0, keepdims=True), (8, ny))


def _dense_kernel(ia_c, ia_up, ia_dn, ir_c, ir_up, ir_dn, u_c, u_up, u_dn,
                  out_ref, diff_ref=None, prev_ref=None, **kw):
    """Dense entry: halo rows arrive as clamped up/down BlockSpec blocks
    (no input padding copies); clamp-duplicated rows at the global edges
    are masked by the body's global-row validity tests."""
    i = pl.program_id(0)
    iaux = jnp.concatenate([ia_up[:, :], ia_c[:, :], ia_dn[:, :]], axis=0)
    iref = jnp.concatenate([ir_up[:, :], ir_c[:, :], ir_dn[:, :]], axis=0)
    u = jnp.concatenate([u_up[:, :, :], u_c[:, :, :], u_dn[:, :, :]], axis=1)
    _onepass_body(iaux, iref, u, i * kw["tb"] - kw["pad"], out_ref,
                  diff_ref, prev_ref, **kw)


def _strip_kernel(row0_ref, iaux_hbm, iref_hbm, u_hbm, out_ref,
                  iaux_sc, iref_sc, u_sc, sem0, sem1, sem2, **kw):
    """Strip-local entry: inputs pre-padded with exchanged halo rows;
    manual DMA of the extended tile (BlockSpec clamping would fabricate
    rows at strip edges where real neighbour data exists)."""
    i = pl.program_id(0)
    tb, pad = kw["tb"], kw["pad"]
    rows = tb + 2 * pad

    d0 = pltpu.make_async_copy(iaux_hbm.at[pl.ds(i * tb, rows), :], iaux_sc, sem0)
    d1 = pltpu.make_async_copy(iref_hbm.at[pl.ds(i * tb, rows), :], iref_sc, sem1)
    d2 = pltpu.make_async_copy(u_hbm.at[:, pl.ds(i * tb, rows), :], u_sc, sem2)
    d0.start(); d1.start(); d2.start()
    d0.wait(); d1.wait(); d2.wait()

    _onepass_body(iaux_sc[:, :], iref_sc[:, :], u_sc[:, :, :],
                  row0_ref[0] + i * tb - pad, out_ref, **kw)


# Measured (tile cap, vmem limit) tiers (TPU through the axon tunnel;
# round-4 hat-gather rows in benchmarks/r7_results.jsonl `onepass_race`,
# prior history r6_results.jsonl `onepass`). The kernel is VPU-bound (the
# gather chains), not HBM-bound; the round-4 hat-accumulation gather
# (demons_fused._bilinear_tile) cut the roll count ~2.5x: 141.1 us
# @1024/tb=64 (175.8 at 128; the r3 select chain ran 216.8) — 1.54x and
# now 7.4 Gpix/s; 825.7 @2048/tb=64 (857.0 select); 4081.2 @4096/tb=32
# (4049.3 select — par; the win shrinks as HBM share grows). Two-kernel
# chain for comparison: 209.9/889.5/5462.3 @1024/2048/4096.
# NOTE the 8192 tier initially looked relay-impossible (HTTP 413): the
# cause was benchmark CLOSURES capturing 256 MB device arrays, which jit
# embeds as compile-request constants — with arrays passed as arguments
# (as the production driver does) every kernel compiles at 8192.
# ny=16384 (r8 probe_16384_o): tb=8 runs 140.5 ms/iter (1.9 Gpix/s —
# the 8-row tile is lane-inefficient but the only one that compiles;
# tb=16 HTTP-500s the remote Mosaic compile at 64M and 100M). Past 8192
# the solver step is also CALLED cond-free (solvers.demons trust mode;
# an exact-gather fallback branch cannot compile in a 16384 program).
_TIERS_H2 = ((1024, 64, 48 * MB), (2048, 64, 64 * MB), (4096, 32, 64 * MB),
             (8192, 32, 64 * MB), (16384, 8, 64 * MB))
# halo >= 3 triples the warp/compose tap masks; start one tile down
# (unmeasured — wide halos route through warp_halo_auto's clamp first).
_TIERS_WIDE = ((1024, 64, 48 * MB), (2048, 32, 64 * MB), (4096, 8, 64 * MB))


def _tier(ny: int, halo: int):
    for cap_ny, tb_cap, limit in (_TIERS_H2 if halo <= 2 else _TIERS_WIDE):
        if ny <= cap_ny:
            return tb_cap, limit
    return None


def onepass_supported(halo: int, kernelwidth: int, sigma_i: float,
                      sigma_x: float) -> bool:
    """Static preconditions: the chain's row reach must fit a pad we are
    willing to DMA (<= 16), and the analytic force bound
    ``sigma_x/(2*sigma_i)`` must fit the halo so the compose stage needs
    no runtime displacement check."""
    if halo < 1 or sigma_i <= 0:
        return False
    if sigma_x / (2.0 * sigma_i) > halo:
        return False
    return required_pad(halo, kernelwidth) <= 16


def onepass_feasible(nx: int, ny: int, halo: int, kernelwidth: int) -> bool:
    """True when a measured-stable (tile, vmem-limit) tier exists at this
    shape; callers fall back to the two-kernel fused path otherwise."""
    return _tier(ny, halo) is not None


def _pick_tb(nx: int, ny: int, halo: int, pad: int, tb: int = 0):
    """Row tile: multiple of ``pad`` (the up/down halo blocks index in
    pad-row units) dividing ``nx``, within the lane tier's cap."""
    tier = _tier(ny, halo)
    tb_cap, limit = tier if tier is not None else (pad, 64 * MB)
    if tb <= 0 or nx % tb != 0 or tb % pad != 0:
        start = min(tb if 0 < tb and tb % pad == 0 else tb_cap, nx)
        tb = pad
        for cand in range(start, pad - 1, -pad):
            if nx % cand == 0:
                tb = cand
                break
    return tb, limit


@functools.partial(jax.jit, static_argnames=(
    "sigma_i", "sigma_x", "sigma_fluid", "sigma_diffusion", "kernelwidth",
    "halo", "addition", "tb", "nx_glob", "prepadded", "with_errors"))
def thirion_onepass_pallas(iaux, iref, u, sigma_i: float, sigma_x: float,
                           sigma_fluid: float, sigma_diffusion: float,
                           kernelwidth: int, halo: int = 2,
                           addition: bool = False, tb: int = 0,
                           row0=None, nx_glob=None, prepadded: bool = False,
                           with_errors: bool = False):
    """One full Thirion demons iteration in a single VMEM-resident pass:
    ``smooth_d(accumulate(u, smooth_f(force(derivs(iref, warp(iaux, u))))))``.
    ``iaux, iref [nx, ny]``, ``u [2, nx, ny]`` -> new motion ``[2, nx, ny]``.

    Contract: in-bounds floor offsets of ``u`` within ``halo`` (callers
    guard with the usual runtime check); the correspondence bound is
    static (``onepass_supported``). ``row0``/``nx_glob``/``prepadded``:
    strip-local mode — inputs pre-padded with ``required_pad`` exchanged
    halo rows per side, ``row0`` the strip's global first row.

    ``with_errors`` (dense path only): also return the Logger partial
    sums ``[sum |u_new - u|, sum |u|]`` so the driver's relative-step
    error needs no extra pass over the fields.

    Reference: ``src/regularization/Demons/DemonsThirions.cpp:18-42``.
    """
    from opticalflow2d_tpu.ops.conv import gaussian_kernel_1d

    pad = required_pad(halo, kernelwidth)
    if prepadded:
        nx = iaux.shape[0] - 2 * pad
        ny = iaux.shape[1]
    else:
        nx, ny = iaux.shape
    cf = cd = (kernelwidth - 1) // 2
    taps_f = tuple(float(v) for v in gaussian_kernel_1d(sigma_fluid, kernelwidth))
    taps_d = tuple(float(v) for v in
                   gaussian_kernel_1d(sigma_diffusion, kernelwidth))

    nx_out = nx
    extra = 0 if prepadded else (-nx) % pad
    if extra:
        iaux = jnp.pad(iaux, ((0, extra), (0, 0)))
        iref = jnp.pad(iref, ((0, extra), (0, 0)))
        u = jnp.pad(u, ((0, 0), (0, extra), (0, 0)))
        nx += extra
    tb, vmem_limit = _pick_tb(nx, ny, halo, pad, tb)
    nblocks = nx // tb
    nx_bound = nx_out if nx_glob is None else nx_glob

    import math
    halo_c = min(halo, max(1, math.ceil(sigma_x / (2.0 * sigma_i))))
    body_kw = dict(
        halo=halo, halo_c=halo_c, cf=cf, taps_f=taps_f, cd=cd, taps_d=taps_d,
        tb=tb, pad=pad, nx=nx_bound, ny=ny,
        sigma_i=sigma_i, sigma_x=sigma_x, addition=addition,
    )

    if prepadded:
        if with_errors:
            raise ValueError("with_errors is dense-path only (strip "
                             "drivers reduce their own Logger sums)")
        if row0 is None:
            row0 = jnp.zeros((1,), jnp.int32)
        else:
            row0 = jnp.asarray(row0, jnp.int32).reshape(1)
        rows = tb + 2 * pad
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
        out = pl.pallas_call(
            functools.partial(_strip_kernel, **body_kw),
            grid_spec=grid_spec,
            compiler_params=compiler_params(vmem_limit),
            out_shape=jax.ShapeDtypeStruct((2, nx, ny), iaux.dtype),
        )(row0, iaux, iref, u)
        return out

    # Dense path: clamped up/center/down halo blocks, zero padding copies.
    r = tb // pad
    last = nx // pad - 1
    up = lambda i: jnp.maximum(i * r - 1, 0)
    dn = lambda i: jnp.minimum((i + 1) * r, last)
    out_specs = pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0))
    out_shape = jax.ShapeDtypeStruct((2, nx, ny), iaux.dtype)
    if with_errors:
        part_spec = pl.BlockSpec((1, 8, ny), lambda i: (i, 0, 0))
        part_shape = jax.ShapeDtypeStruct((nblocks, 8, ny), iaux.dtype)
        out_specs = [out_specs, part_spec, part_spec]
        out_shape = [out_shape, part_shape, part_shape]
    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((tb, ny), lambda i: (i, 0)),
            pl.BlockSpec((pad, ny), lambda i: (up(i), 0)),
            pl.BlockSpec((pad, ny), lambda i: (dn(i), 0)),
            pl.BlockSpec((tb, ny), lambda i: (i, 0)),
            pl.BlockSpec((pad, ny), lambda i: (up(i), 0)),
            pl.BlockSpec((pad, ny), lambda i: (dn(i), 0)),
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, up(i), 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, dn(i), 0)),
        ],
        out_specs=out_specs,
    )
    res = pl.pallas_call(
        functools.partial(_dense_kernel, with_errors=with_errors, **body_kw),
        grid_spec=grid_spec,
        compiler_params=compiler_params(vmem_limit),
        out_shape=out_shape,
    )(iaux, iaux, iaux, iref, iref, iref, u, u, u)
    if with_errors:
        out, diff_p, prev_p = res
        sums = jnp.stack([jnp.sum(diff_p[:, 0, :]), jnp.sum(prev_p[:, 0, :])])
        return (out[:, :nx_out] if extra else out), sums
    return res[:, :nx_out] if extra else res
