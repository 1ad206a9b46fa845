"""Temporal-blocked Horn-Schunck diffusion: k Jacobi iterations per HBM pass.

The single-step kernel (``diffusion_fused.py``) already sits at the HBM
roofline (~28 B touched per pixel-iteration), so the only way to go faster
is to touch HBM *less*: this kernel streams a row block plus a ``pad``-row
halo into VMEM, runs ``k`` full update iterations on-chip (the dependence
cone of a radius-1 stencil grows one row per iteration, so ``pad >= k``
keeps the interior exact), and writes the interior back once.  HBM traffic
drops from ``28 B`` to roughly ``(5*E/tb + 2) * 4 / k`` bytes per
pixel-iteration (E = tb + 2*pad), i.e. ~7-14x less for k = 8-16.

The math per iteration is the same op-for-op sequence as
``diffusion_fused._diffusion_kernel`` (reference semantics:
``src/regularization/OpticalFlow/OpticalFlowDiffusion.cpp:43-84`` with the
zero-border quasi-laplacian of ``src/gradients.h:72-80``), so the interior
result is bit-identical to ``k`` calls of ``diffusion_step_pallas``.

Convergence accounting: the reference Logger gates on the *mean per-pixel
magnitude* of the step (``src/Motion.cpp:42-49`` via ``Logger.cpp:30-60``).
With ``with_errors=True`` the kernel also emits, per iteration, the block's
partial sums of ``|u_t - u_{t-1}|`` and ``|u_{t-1}|`` magnitudes over its
interior rows, so the caller can reconstruct every per-iteration relative
error exactly (up to partial-sum association order) while still paying for
only one HBM pass per k iterations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflow2d_tpu.pallas_kernels import MB, compiler_params


def stack_derivs(grad_i: jnp.ndarray, it_img: jnp.ndarray) -> jnp.ndarray:
    """Pack (gx, gy, It) into one ``[3, nx, ny]`` array so the kernel loads
    force terms (and their halos) through a single blocked pipeline. Build
    this once per refinement — it is loop-invariant."""
    return jnp.concatenate([grad_i, it_img[None]], axis=0)


def _block_body(c, g, gi0, out_ref, diff_ref, prev_ref, *, alpha: float,
                k: int, tb: int, pad: int, nx: int, with_errors: bool,
                err_mode: str = "sqrt"):
    """k diffusion iterations on one extended tile ``c [2, e, ny]`` with
    force terms ``g [3, e, ny]``; ``gi0`` is the global row index of tile
    row 0 (traced scalar ok). Writes the interior to ``out_ref`` and, with
    errors on, per-iteration row-reduced partials to diff/prev refs."""
    e = tb + 2 * pad
    ny = c.shape[-1]
    gx, gy, it_img = g[0], g[1], g[2]
    den = alpha * alpha + gx * gx + gy * gy

    # Global-border mask over the extended tile. Rows with global index
    # < 0 or >= nx only exist for the clamped edge blocks; they are never
    # read into a valid row (the q of global rows 0 / nx-1 is zeroed, which
    # cuts the dependence chain at the image border).
    ri = lax.broadcasted_iota(jnp.int32, (e, ny), 0)
    gi = ri + gi0
    gj = lax.broadcasted_iota(jnp.int32, (e, ny), 1)
    border = (gi == 0) | (gi == nx - 1) | (gj == 0) | (gj == ny - 1)

    # Per-iteration error partials accumulate as LANE VECTORS (rows reduced
    # in-kernel, lanes reduced by the caller): scalar SMEM stores inside the
    # iteration loop serialize Mosaic's schedule (measured 59.8 vs 5.9
    # us/iter at k=8), vector accumulation is ~free.
    if with_errors:
        acc_rows = lax.broadcasted_iota(jnp.int32, (k, ny), 0)
        acc_diff = jnp.zeros((k, ny), c.dtype)
        acc_prev = jnp.zeros((k, ny), c.dtype)

    for t in range(k):
        # Same op order as diffusion_fused (bit-identical interiors): the
        # row/lane roll wrap garbage lands either in the trapezoid rows
        # already invalid at iteration t or in masked global borders.
        x_up = pltpu.roll(c, 1, 1)
        x_dn = pltpu.roll(c, e - 1, 1)
        y_sum = pltpu.roll(c, 1, 2) + pltpu.roll(c, ny - 1, 2)
        q = (x_up + x_dn + y_sum) * 0.25
        q = jnp.where(border[None], 0.0, q)
        inner = it_img + q[0] * gx + q[1] * gy
        scale = inner / den
        new0 = q[0] - gx * scale
        new1 = q[1] - gy * scale
        c_new = jnp.concatenate([new0[None], new1[None]], axis=0)
        if with_errors:
            prev_i = c[:, pad:pad + tb, :]
            new_i = c_new[:, pad:pad + tb, :]
            diff = new_i - prev_i
            # err_mode decomposes the Logger tax for the r9 roofline
            # study (benchmarks/r9_logger_tax.py): "sqrt" is the exact
            # Logger magnitude (production), "rsqrt" the same value via
            # x*rsqrt(x) (candidate cheaper lowering), "nosqrt" a
            # diagnostic-only sum of squares that bounds the sqrt share.
            if err_mode == "nosqrt":
                mag = lambda a, b: a * a + b * b
            elif err_mode == "rsqrt":
                def mag(a, b):
                    sq = a * a + b * b
                    return jnp.where(sq > 0, sq * lax.rsqrt(sq), 0.0)
            else:
                mag = lambda a, b: jnp.sqrt(a * a + b * b)
            dsum = jnp.sum(mag(diff[0], diff[1]), axis=0, keepdims=True)
            psum = jnp.sum(mag(prev_i[0], prev_i[1]), axis=0, keepdims=True)
            acc_diff = jnp.where(acc_rows == t, dsum, acc_diff)
            acc_prev = jnp.where(acc_rows == t, psum, acc_prev)
        c = c_new

    out_ref[:, :, :] = c[:, pad:pad + tb, :]
    if with_errors:
        diff_ref[0, :, :] = acc_diff
        prev_ref[0, :, :] = acc_prev


def _block_kernel(u_c_ref, u_up_ref, u_dn_ref, g_c_ref, g_up_ref, g_dn_ref,
                  out_ref, diff_ref, prev_ref, *, alpha: float, k: int,
                  tb: int, pad: int, nx: int, with_errors: bool,
                  err_mode: str = "sqrt"):
    i = pl.program_id(0)
    # Extended tile: pad halo rows above + center + pad halo rows below.
    # (Sublane-dim concat; Mosaic only rejects lane-dim concat.)
    c = jnp.concatenate(
        [u_up_ref[:, :, :], u_c_ref[:, :, :], u_dn_ref[:, :, :]], axis=1
    )  # [2, e, ny]
    g = jnp.concatenate(
        [g_up_ref[:, :, :], g_c_ref[:, :, :], g_dn_ref[:, :, :]], axis=1
    )  # [3, e, ny]
    _block_body(c, g, i * tb - pad, out_ref, diff_ref, prev_ref,
                alpha=alpha, k=k, tb=tb, pad=pad, nx=nx,
                with_errors=with_errors, err_mode=err_mode)


def _strip_kernel(scal_ref, u_pad_hbm, g_pad_hbm, out_ref, diff_ref,
                  prev_ref, u_sc, g_sc, sem_u, sem_g, *, alpha: float,
                  k: int, tb: int, pad: int, with_errors: bool):
    """Strip-local variant (shard_map): the caller pre-pads the local strip
    with ``pad`` exchanged halo rows per side, so the extended tile is one
    aligned manual DMA (offset i*tb, 8-aligned) instead of three clamped
    halo blocks; ``row0_ref`` scalar-prefetches the strip's global origin
    for the border masks (same pattern as ``warp_fused``); the global x
    extent rides along as the second prefetched scalar."""
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
                prev_ref, alpha=alpha, k=k, tb=tb, pad=pad,
                nx=scal_ref[1], with_errors=with_errors)


# Measured (tile cap, vmem limit) tiers (TPU v5e, the `race_*` within-run
# tier races in benchmarks/r4_results.jsonl; scoped-vmem policy in
# pallas_kernels.__init__). Mosaic's default 16M budget was compile-FLAKY
# for this kernel at ny >= 2048 (identical programs measured 16.77-17.54M
# on retry after compiling fine); the raised limits carry ~2x margin and
# are runtime-neutral. With the limits, errors-on blocking at (128, 48M)
# @2048 measures 76.5 (k8) / 83.5 (k16) us/iter vs 119-123 for the
# single-step fallback, and (64, 64M) @4096 measures 421.1 vs 1387.2.
# Keys: lane tier -> (tb cap, vmem_limit | None), split by error sums
# (they add per-iteration reduction scratch).
# ny=8192 (r6j, arrays as args — closure constants were what made 8192
# look impossible): k=8 errors-off measured 1161.2 us/iter at tb=32 vs
# 1188.3 at 64; errors-on unmeasured at 8192, same cap with margin.
# ny=16384 (r8 probe_16384_h, errors-on, state-threaded): k=16 tb=16
# 9828.5 us/iter, k=8 tb=16 8561.5 (31.4 Gpix/s), k=8 tb=8 9257.0 —
# the fast path of the 16384^2 phased registrations (register_phased).
_TIERS_ERR = ((1024, 128, None), (2048, 128, 48 * MB), (4096, 64, 64 * MB),
              (8192, 32, 64 * MB), (16384, 16, 64 * MB))
_TIERS_NOERR = ((1024, 128, None), (2048, 64, 32 * MB), (4096, 64, 64 * MB),
                (8192, 32, 64 * MB), (16384, 16, 64 * MB))


def _tier(ny: int, with_errors: bool):
    for cap_ny, tb_cap, limit in (_TIERS_ERR if with_errors
                                  else _TIERS_NOERR):
        if ny <= cap_ny:
            return tb_cap, limit
    return None


def _pick_tiles(nx: int, k: int, tb: int | None, ny: int = 1024,
                with_errors: bool = False):
    """Pick (tb, pad, vmem_limit): pad = k rounded up to the sublane tile
    (8), tb a multiple of pad dividing nx within the lane tier's cap.
    Returns None when no tiling exists — callers fall back to the
    single-step kernel. An explicit ``tb`` is honored unchecked (expert
    override; it gets the tier's limit, or 64M past the table)."""
    pad = ((k + 7) // 8) * 8
    tier = _tier(ny, with_errors)
    tb_cap, limit = tier if tier is not None else (None, 64 * MB)
    if tb is not None and nx % tb == 0 and tb % pad == 0:
        return tb, pad, limit
    if tb_cap is None:
        return None
    # k=16 at 4096^2 without sums prefers the smaller tile (205.7 us/iter
    # at tb=32/32M vs 294.0 at tb=64 — the 24-row pad makes the bigger
    # tile's extended block overflow a cache level).
    if not with_errors and ny >= 4096 and pad >= 16:
        tb_cap = min(tb_cap, 32)
    for cand in range(min(tb_cap, nx), pad - 1, -pad):
        if nx % cand == 0 and cand % pad == 0:
            return cand, pad, limit
    return None


@functools.partial(
    jax.jit, static_argnames=("alpha", "k", "tb", "with_errors", "err_mode")
)
def diffusion_block_pallas(u, g, alpha: float, k: int = 8,
                           tb: int | None = None, with_errors: bool = True,
                           err_mode: str = "sqrt"):
    """Run ``k`` diffusion iterations in one fused HBM pass.

    ``g`` is ``stack_derivs(grad_i, it)``. Returns ``(u_k, sums)`` where
    ``sums`` is ``[k, 2]``: per-iteration image-wide sums of step magnitude
    and previous-field magnitude (``None`` if ``with_errors=False``).
    Relative error of iteration t is ``sums[t, 0] / sums[t, 1]`` (the
    per-pixel means' ratio; the 1/N factors cancel).

    Requires a valid tiling (see ``_pick_tiles``); callers should fall back
    to the single-step kernel when this raises."""
    _, nx, ny = u.shape
    tiles = _pick_tiles(nx, k, tb, ny, with_errors)
    if tiles is None:
        raise ValueError(f"no valid row tiling for nx={nx}, k={k}")
    tb, pad, vmem_limit = tiles
    nblocks = nx // tb
    r = tb // pad          # halo index stride, in pad-row blocks
    last = nx // pad - 1   # last pad-block index

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
            # Per-iteration error partials as [k, ny] lane vectors per
            # block; the lane reduction happens outside the kernel.
            pl.BlockSpec((1, k, ny), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, k, ny), lambda i: (i, 0, 0)),
        ],
    )
    kernel = functools.partial(
        _block_kernel, alpha=alpha, k=k, tb=tb, pad=pad, nx=nx,
        with_errors=with_errors, err_mode=err_mode,
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
    """Halo rows each side for k diffusion iterations (8-aligned)."""
    return ((k + 7) // 8) * 8


def _pick_tb_strip(nxl: int, tb: int | None, ny: int = 1024, pad: int = 8,
                   with_errors: bool = True):
    """Strip tiling only needs 8 | tb | nxl (manual DMA has no pad-multiple
    constraint). Returns (tb, vmem_limit) from the same measured tier
    table as the whole-image kernel (the strip scratch streams the same
    planes), or None when no 8-aligned divisor fits the tier cap."""
    tier = _tier(ny, with_errors)
    tb_cap, limit = tier if tier is not None else (None, 64 * MB)
    if tb is not None and nxl % tb == 0 and tb % 8 == 0:
        return tb, limit
    if tb_cap is None:
        return None
    for cand in range(min(tb_cap, nxl), 7, -8):
        if nxl % cand == 0:
            return cand, limit
    return None


@functools.partial(
    jax.jit, static_argnames=("alpha", "k", "tb", "with_errors")
)
def diffusion_block_strip(u_pad, g_pad, row0, nx_glob, alpha: float,
                          k: int, tb: int | None = None,
                          with_errors: bool = True):
    """Strip-local blocked diffusion for shard_map drivers.

    ``u_pad [2, nxl + 2*required_pad(k), ny]`` / ``g_pad [3, ...]`` carry
    ``required_pad(k)`` exchanged halo rows per side (``parallel.spatial.
    _halo_pad``); ``row0`` is the strip's global first-row index (traced
    scalar). Returns ``(u_k [2, nxl, ny], sums [k, 2])`` — the interior is
    bit-identical to ``k`` strip steps, sums are this strip's partials
    (psum across strips to get the Logger errors)."""
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
        _strip_kernel, alpha=alpha, k=k, tb=tb, pad=pad,
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
