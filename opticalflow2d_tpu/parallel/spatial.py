"""Spatial (grid) sharding — the sequence-parallel analog for large images
(SURVEY.md §2.2, §5 "long-context").

Two complementary paths:

1. ``register_sharded``: the full registration pipeline jitted with the
   images sharded in strips along x (``P('x', None)``). XLA's SPMD
   partitioner inserts the halo exchanges (collective-permutes) for every
   shift/pad stencil and handles the DCT matmuls as sharded matmuls — the
   "annotate shardings, let XLA insert collectives" recipe. Numerically
   identical to the single-device trace.

2. ``diffusion_sweeps_sharded``: an explicit ``shard_map`` + ``ppermute``
   halo-exchange implementation of the Horn-Schunck inner loop (the #1 hot
   stencil, SURVEY.md §3.4) — the hand-scheduled variant used to validate
   and benchmark against path 1, and the template for Pallas ring kernels.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from opticalflow2d_tpu.config import RegConfig
from opticalflow2d_tpu.engine.registration import _register_impl, RegistrationResult


# ---------------------------------------------------------------------------
# Path 1: whole-pipeline SPMD via sharding annotations
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _jitted_register_sharded(cfg: RegConfig, mesh: Mesh):
    img_sharding = NamedSharding(mesh, P("x", None))
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        lambda r, m: _register_impl(r, m, cfg),
        in_shardings=(img_sharding, img_sharding),
        out_shardings=replicated,
    )


def register_sharded(iref, imov, cfg: RegConfig, mesh: Mesh) -> RegistrationResult:
    """Run the full registration with the image grid sharded in x-strips
    across the mesh's ``"x"`` axis. Semantics identical to ``register``."""
    iref = jnp.asarray(iref)
    imov = jnp.asarray(imov)
    return _jitted_register_sharded(cfg, mesh)(iref, imov)


# ---------------------------------------------------------------------------
# Path 2: explicit halo exchange with shard_map + ppermute
# ---------------------------------------------------------------------------

def _qlaplacian_halo(f: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Quasi-laplacian (4-neighbour average, zero at global borders) on a
    local x-strip with halo exchange. ``f`` is ``[..., nxl, ny]``."""
    nxl, ny = f.shape[-2], f.shape[-1]
    idx = lax.axis_index(axis_name)
    n = lax.psum(1, axis_name)

    top, bot = _halo_exchange_k(f, 1, axis_name)
    fp = jnp.concatenate([top, f, bot], axis=-2)  # [..., nxl+2, ny]

    x_sum = fp[..., 2:, :] + fp[..., :-2, :]
    y_pad = jnp.pad(f, [(0, 0)] * (f.ndim - 1) + [(1, 1)])
    y_sum = y_pad[..., :, 2:] + y_pad[..., :, :-2]
    q = (x_sum + y_sum) * 0.25

    # Zero the global borders (gradients.h:72-80): global first/last row and
    # first/last column.
    gi = lax.broadcasted_iota(jnp.int32, (nxl, ny), 0) + idx * nxl
    gj = lax.broadcasted_iota(jnp.int32, (nxl, ny), 1)
    nx_glob = n * nxl
    border = (gi == 0) | (gi == nx_glob - 1) | (gj == 0) | (gj == ny - 1)
    return jnp.where(border, 0.0, q)


def _halo_exchange_k(f: jnp.ndarray, k: int, axis_name: str):
    """Exchange k-row halos along the sharded x axis. Returns (top, bot)
    blocks of shape ``[..., k, ny]`` (zeros at the global boundary).

    Supports ``k > nxl`` (halo wider than a strip, e.g. warp halos at coarse
    pyramid levels) via multi-hop ppermutes: whole neighbour strips are
    pulled hop by hop and the halo sliced from their concatenation.
    """
    nxl = f.shape[-2]
    n = lax.psum(1, axis_name)
    if k <= nxl:
        send_down = [(i, i + 1) for i in range(n - 1)]
        send_up = [(i + 1, i) for i in range(n - 1)]
        top = lax.ppermute(f[..., -k:, :], axis_name, send_down)
        bot = lax.ppermute(f[..., :k, :], axis_name, send_up)
        return top, bot

    hops = -(-k // nxl)  # ceil
    top_parts = []
    bot_parts = []
    for h in range(hops, 0, -1):
        top_parts.append(
            lax.ppermute(f, axis_name, [(i, i + h) for i in range(n - h)])
        )
    for h in range(1, hops + 1):
        bot_parts.append(
            lax.ppermute(f, axis_name, [(i + h, i) for i in range(n - h)])
        )
    top = jnp.concatenate(top_parts, axis=-2)[..., -k:, :]
    bot = jnp.concatenate(bot_parts, axis=-2)[..., :k, :]
    return top, bot


def make_sor_sweeps_sharded(
    mesh: Mesh,
    mu: float,
    lam: float,
    omega: float,
    niter: int,
    reference_stencil: bool = True,
):
    """Red-black Navier-Lame SOR sweeps with explicit 1-row ICI halo
    exchange per half-sweep. Signature: ``(x [2,nx,ny], b [2,nx,ny]) -> x``
    with both sharded ``P(None, 'x', None)``.

    Matches the unsharded ``solvers.elastic.sor_sweep`` exactly: the
    red/black masks use global row indices, borders stay untouched, and the
    stencil (including the reference's asymmetric y-term) is identical —
    only the neighbour fetch differs (ppermute halos instead of pad).
    """
    from opticalflow2d_tpu.solvers.elastic import _gs_candidate

    spec_u = P(None, "x", None)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec_u, spec_u), out_specs=spec_u,
        check_vma=False,
    )
    def sweeps(x, b):
        nxl, ny = x.shape[-2], x.shape[-1]
        idx = lax.axis_index("x")
        n = lax.psum(1, "x")
        nx_glob = n * nxl
        gi = lax.broadcasted_iota(jnp.int32, (nxl, ny), 0) + idx * nxl
        gj = lax.broadcasted_iota(jnp.int32, (nxl, ny), 1)
        interior = (gi >= 1) & (gi <= nx_glob - 2) & (gj >= 1) & (gj <= ny - 2)
        red = ((gi + gj) % 2 == 0) & interior
        black = ((gi + gj) % 2 == 1) & interior

        def half_sweep(x, mask, b_pad):
            # Pad local block with exchanged halos so _gs_candidate's
            # pad-based shifts see the neighbour rows.
            top, bot = _halo_exchange_k(x, 1, "x")
            xp = jnp.concatenate([top, x, bot], axis=-2)
            cand = _gs_candidate(xp, b_pad, mu, lam, omega, reference_stencil)
            cand = cand[:, 1:-1, :]
            return jnp.where(mask, cand, x)

        # b is only read at interior points of the candidate; pad to match.
        zrow = jnp.zeros((2, 1, ny), x.dtype)
        b_pad = jnp.concatenate([zrow, b, zrow], axis=-2)

        def body(_, x):
            x = half_sweep(x, red, b_pad)
            x = half_sweep(x, black, b_pad)
            return x

        return lax.fori_loop(0, niter, body, x)

    return jax.jit(sweeps)


def _gaussian_local(f, sigma: float, width: int, axis_name: str = "x"):
    """Module-level body of the sharded renormalized Gaussian smoothing
    (shared by make_gaussian_smooth_sharded and the sharded demons step)."""
    from opticalflow2d_tpu.ops.conv import gaussian_kernel_1d, _sepconv_axis

    c = (width - 1) // 2
    g = gaussian_kernel_1d(sigma, width)

    def smooth_local(f, axis_name=axis_name):
        # x-direction conv needs c halo rows; renormalization denominator
        # needs the global row position.
        top, bot = _halo_exchange_k(f, c, axis_name)
        fp = jnp.concatenate([top, f, bot], axis=-2)
        num = _sepconv_axis(fp, g, fp.ndim - 2)
        num = num[..., c:-c, :]
        num = _sepconv_axis(num, g, num.ndim - 1)

        nxl, ny = f.shape[-2], f.shape[-1]
        idx = lax.axis_index(axis_name)
        n = lax.psum(1, axis_name)
        nx_glob = n * nxl
        gi = (lax.broadcasted_iota(jnp.int32, (nxl, 1), 0) + idx * nxl).astype(f.dtype)
        gj = lax.broadcasted_iota(jnp.int32, (1, ny), 1).astype(f.dtype)
        # denominator: sum of in-bounds taps = separable 1D sums of clipped
        # windows, computed from global positions.
        taps = jnp.asarray(g, f.dtype)

        def den_1d(pos, nglob):
            # pos [..., 1] broadcastable; den(pos) = sum_t g[t] * [0 <= pos+t-c < n]
            total = jnp.zeros_like(pos)
            for t in range(width):
                off = t - c
                total = total + taps[t] * (
                    (pos + off >= 0) & (pos + off <= nglob - 1)
                ).astype(f.dtype)
            return total

        den = den_1d(gi, nx_glob) * den_1d(gj, ny)
        return num / den

    return smooth_local(f)


def make_gaussian_smooth_sharded(mesh: Mesh, sigma: float, width: int):
    """Boundary-renormalized separable Gaussian smoothing with k/2-row ICI
    halo exchange; matches ``ops.conv.convolve2d_clip`` exactly.
    Signature: ``f [..., nx, ny] -> f`` sharded ``P(..., 'x', None)``."""

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(None, "x", None),),
        out_specs=P(None, "x", None), check_vma=False,
    )
    def smooth(f):
        return _gaussian_local(f, sigma, width)

    return jax.jit(smooth)


def _bilinear_local(data_loc, px, py, halo: int, axis_name: str):
    """Local-strip bilinear tap fetch via halo exchange + masked rolls.

    ``data_loc [..., nxl, ny]``; ``px, py [nxl, ny]`` are GLOBAL sample
    coordinates. Valid within the displacement contract ``|floor offset| <=
    halo``. Returns (value, weight, in_bounds) with the reference's edge
    renormalization and floor-cell bounds semantics.
    """
    nxl, ny = data_loc.shape[-2], data_loc.shape[-1]
    idx = lax.axis_index(axis_name)
    n = lax.psum(1, axis_name)
    nx_glob = n * nxl
    h1 = halo + 1

    gi = lax.broadcasted_iota(jnp.int32, (nxl, ny), 0) + idx * nxl
    gj = lax.broadcasted_iota(jnp.int32, (nxl, ny), 1)

    dx = jnp.floor(px)
    dy = jnp.floor(py)
    fx = px - dx
    fy = py - dy
    dxi = dx.astype(jnp.int32)
    dyi = dy.astype(jnp.int32)
    in_bounds = (dxi >= 0) & (dxi < nx_glob) & (dyi >= 0) & (dyi < ny)
    rx = dxi - gi
    ry = dyi - gj

    top, bot = _halo_exchange_k(data_loc, h1, axis_name)
    pad = jnp.concatenate([top, data_loc, bot], axis=-2)

    lane_rolls = {b: jnp.roll(pad, -b, axis=-1) for b in range(-halo, halo + 2)}
    rolls = {}

    def rolled(a, b):
        if (a, b) not in rolls:
            rolls[(a, b)] = jnp.roll(lane_rolls[b], -a, axis=-2)[
                ..., h1 : h1 + nxl, :
            ]
        return rolls[(a, b)]

    z = jnp.zeros_like(data_loc)
    g00, g10, g01, g11 = z, z, z, z
    for ox in range(-halo, halo + 1):
        mx = rx == ox
        for oy in range(-halo, halo + 1):
            m = mx & (ry == oy)
            g00 = jnp.where(m, rolled(ox, oy), g00)
            g10 = jnp.where(m, rolled(ox + 1, oy), g10)
            g01 = jnp.where(m, rolled(ox, oy + 1), g01)
            g11 = jnp.where(m, rolled(ox + 1, oy + 1), g11)

    has_x1 = dxi < nx_glob - 1
    has_y1 = dyi < ny - 1
    w00 = (1.0 - fx) * (1.0 - fy)
    w10 = jnp.where(has_x1, fx * (1.0 - fy), 0.0)
    w01 = jnp.where(has_y1, (1.0 - fx) * fy, 0.0)
    w11 = jnp.where(has_x1 & has_y1, fx * fy, 0.0)
    value = g00 * w00 + g10 * w10 + g01 * w01 + g11 * w11
    weight = w00 + w10 + w01 + w11
    return value, weight, in_bounds


def _global_coords(u_loc, axis_name: str):
    nxl, ny = u_loc.shape[-2], u_loc.shape[-1]
    idx = lax.axis_index(axis_name)
    gi = lax.broadcasted_iota(u_loc.dtype, (nxl, ny), 0) + (idx * nxl).astype(
        u_loc.dtype
    )
    gj = lax.broadcasted_iota(u_loc.dtype, (nxl, ny), 1)
    return gi + u_loc[0], gj + u_loc[1]


def _warp_local(img_loc, u_loc, halo: int, axis_name: str):
    px, py = _global_coords(u_loc, axis_name)
    value, weight, in_b = _bilinear_local(img_loc, px, py, halo, axis_name)
    ok = in_b & (weight != 0)
    return jnp.where(ok, value / jnp.where(weight != 0, weight, 1.0), img_loc)


def _compose_local(u_tot_loc, u_inc_loc, halo: int, axis_name: str):
    px, py = _global_coords(u_inc_loc, axis_name)
    value, weight, in_b = _bilinear_local(u_tot_loc, px, py, halo, axis_name)
    warped = value / jnp.where(weight != 0, weight, 1.0)
    inc_plus = u_inc_loc + jnp.where(weight != 0, warped, 0.0)
    return jnp.where(in_b, inc_plus, u_tot_loc)


def _warp_local_pallas(img_loc, u_loc, halo: int, axis_name: str, tb: int = 0):
    """Pallas-fused variant of ``_warp_local``: exchange ``_PAD`` neighbour
    rows once, then run the VMEM-resident masked-roll gather on the local
    strip (kernel reads global coordinates via the scalar-prefetched strip
    origin). Same contract: in-bounds floor offsets within ``halo``."""
    from opticalflow2d_tpu.pallas_kernels.warp_fused import _PAD, warp2d_pallas_strip

    nxl = img_loc.shape[-2]
    idx = lax.axis_index(axis_name)
    n = lax.psum(1, axis_name)
    top, bot = _halo_exchange_k(img_loc, _PAD, axis_name)
    img_pad = jnp.concatenate([top, img_loc, bot], axis=-2)
    return warp2d_pallas_strip(img_pad, u_loc, idx * nxl, n * nxl, halo, tb)


def _compose_local_pallas(u_tot_loc, u_inc_loc, halo: int, axis_name: str,
                          tb: int = 0):
    """Pallas-fused variant of ``_compose_local`` (see above)."""
    from opticalflow2d_tpu.pallas_kernels.warp_fused import _PAD, compose_pallas_strip

    nxl = u_tot_loc.shape[-2]
    idx = lax.axis_index(axis_name)
    n = lax.psum(1, axis_name)
    top, bot = _halo_exchange_k(u_tot_loc, _PAD, axis_name)
    ut_pad = jnp.concatenate([top, u_tot_loc, bot], axis=-2)
    return compose_pallas_strip(ut_pad, u_inc_loc, idx * nxl, n * nxl, halo, tb)


def _gradient_local(img_loc, axis_name: str):
    """Central-difference gradient with 1-row halo exchange; one-sided at
    the global borders (matches ops.grid.spatial_gradient)."""
    nxl, ny = img_loc.shape
    idx = lax.axis_index(axis_name)
    n = lax.psum(1, axis_name)
    nx_glob = n * nxl
    top, bot = _halo_exchange_k(img_loc, 1, axis_name)
    fp = jnp.concatenate([top, img_loc, bot], axis=-2)  # [nxl+2, ny]

    gx = (fp[2:, :] - fp[:-2, :]) * 0.5
    gi = lax.broadcasted_iota(jnp.int32, (nxl, ny), 0) + idx * nxl
    first = fp[2:, :] - fp[1:-1, :]   # forward diff (valid on global row 0)
    last = fp[1:-1, :] - fp[:-2, :]   # backward diff (global row nx-1)
    gx = jnp.where(gi == 0, first, jnp.where(gi == nx_glob - 1, last, gx))

    from opticalflow2d_tpu.ops.grid import partial_y

    gy = partial_y(img_loc)  # y is unsharded
    return jnp.stack([gx, gy], axis=0)


def make_demons_step_sharded(
    mesh: Mesh,
    sigma_i: float,
    sigma_x: float,
    sigma_diffusion: float,
    sigma_fluid: float,
    kernelwidth: int,
    halo: int = 2,
    diffeomorphic: bool = False,
    use_pallas: bool = False,
):
    """One Thirion/diffeomorphic demons iteration with every op expressed as
    explicit shard_map collectives: halo-exchanged warp, gradient, Gaussian
    smoothing, and composition; pmax for the exp-map scaling. The fully
    hand-scheduled SP pipeline (contrast with the auto-SPMD
    ``register_sharded`` path).

    Signature: ``(u [2,nx,ny], iref [nx,ny], imov [nx,ny]) -> u`` with u
    sharded ``P(None,'x',None)`` and images ``P('x',None)``. Displacement
    contract: all warp/compose offsets within ``halo``.

    ``use_pallas=True`` routes warp/compose (including the exp-map
    squarings) through the fused strip-local Pallas kernels.
    """
    _wl = _warp_local_pallas if use_pallas else _warp_local
    _cl = _compose_local_pallas if use_pallas else _compose_local

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "x", None), P("x", None), P("x", None)),
        out_specs=P(None, "x", None),
        check_vma=False,
    )
    def step(u, iref, imov):
        iwar = _wl(imov, u, halo, "x")
        grad = _gradient_local(iwar, "x")
        it = iwar - iref
        den = grad[0] ** 2 + grad[1] ** 2 + it**2 * (sigma_i**2) / (sigma_x**2)
        num = grad * it[None] * -1.0
        c = jnp.where(den[None] > 0, num / jnp.where(den[None] > 0, den[None], 1.0), 0.0)
        c = _gaussian_local(c, sigma_fluid, kernelwidth)
        if diffeomorphic:
            # scaling-and-squaring with a globally reduced maxabs
            normsq = c[0] ** 2 + c[1] ** 2
            m = jnp.sqrt(lax.pmax(jnp.max(normsq), "x"))
            nsq_f = jnp.ceil(1.0 + jnp.log2(jnp.maximum(m, jnp.finfo(c.dtype).tiny)))
            nsq = jnp.where(m > 0, jnp.maximum(nsq_f, 0.0), 0.0).astype(jnp.int32)
            v = c * jnp.exp2(-nsq.astype(c.dtype))
            v = lax.fori_loop(0, nsq, lambda _, w: _compose_local(w, w, halo, "x"), v)
            c = v
        u = _compose_local(u, c, halo, "x")
        u = _gaussian_local(u, sigma_diffusion, kernelwidth)
        return u

    return jax.jit(step)


def make_warp2d_sharded(mesh: Mesh, halo: int, use_pallas: bool = False,
                        tb: int = 0):
    """Blockwise backward warp with bounded-displacement halo exchange
    (SURVEY.md §5: the SP-equivalent of the reference's warp window logic,
    ``Image.cpp:144-151``). Each x-strip exchanges ``halo+1`` rows with its
    neighbours over ICI and gathers via the masked-roll select chain — no
    global collectives, O(halo) communication per device. Requires every
    in-bounds sample's floor offset within ``halo`` (the serial ``warp2d``
    with its runtime fallback is the safe general path).

    Signature: ``(image [nx, ny], u [2, nx, ny]) -> warped [nx, ny]`` with
    image sharded ``P('x', None)`` and u ``P(None, 'x', None)``.

    ``use_pallas=True`` swaps the per-strip gather for the Pallas fused
    kernel (``pallas_kernels.warp_fused``): one ppermute halo exchange,
    then the select chain runs entirely in VMEM on each strip.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("x", None), P(None, "x", None)),
        out_specs=P("x", None),
        check_vma=False,
    )
    def warp(img_loc, u_loc):
        if use_pallas:
            return _warp_local_pallas(img_loc, u_loc, halo, "x", tb)
        return _warp_local(img_loc, u_loc, halo, "x")

    return jax.jit(warp)


def make_demons_level_sharded(
    mesh: Mesh,
    sigma_i: float,
    sigma_x: float,
    sigma_diffusion: float,
    sigma_fluid: float,
    kernelwidth: int,
    niter: int,
    halo: int = 2,
    diffeomorphic: bool = False,
    convergence_tol: float = 0.001,
):
    """A full demons LEVEL solve as one explicit shard_map program:
    per-iteration step (halo-exchanged warp/gradient/smooth/compose) inside
    a lax.while_loop whose convergence gate is the reference Logger's
    relative step norm computed with psum reductions over the mesh.

    Signature: ``(u [2,nx,ny], iref, imov) -> (u, iterations)``;
    reproduces ``engine.registration._solve_level_demons`` for one
    refinement within the displacement contract.
    """

    def _norm_global(v, axis_name):
        mag = jnp.sqrt(v[0] ** 2 + v[1] ** 2)
        total = lax.psum(jnp.sum(mag), axis_name)
        count = lax.psum(jnp.float32(mag.size), axis_name)
        return total / count

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "x", None), P("x", None), P("x", None)),
        out_specs=(P(None, "x", None), P()),
        check_vma=False,
    )
    def solve(u, iref, imov):
        iaux = _warp_local(imov, u, halo, "x")

        def one_step(u_est):
            iwar = _warp_local(iaux, u_est, halo, "x")
            grad = _gradient_local(iwar, "x")
            it_img = iwar - iref
            den = grad[0] ** 2 + grad[1] ** 2 + it_img**2 * (sigma_i**2) / (sigma_x**2)
            num = grad * it_img[None] * -1.0
            c = jnp.where(
                den[None] > 0, num / jnp.where(den[None] > 0, den[None], 1.0), 0.0
            )
            c = _gaussian_local(c, sigma_fluid, kernelwidth)
            if diffeomorphic:
                normsq = c[0] ** 2 + c[1] ** 2
                m = jnp.sqrt(lax.pmax(jnp.max(normsq), "x"))
                nsq_f = jnp.ceil(
                    1.0 + jnp.log2(jnp.maximum(m, jnp.finfo(c.dtype).tiny))
                )
                nsq = jnp.where(m > 0, jnp.maximum(nsq_f, 0.0), 0.0).astype(jnp.int32)
                v = c * jnp.exp2(-nsq.astype(c.dtype))
                v = lax.fori_loop(
                    0, nsq, lambda _, w: _compose_local(w, w, halo, "x"), v
                )
                c = v
            u_new = _compose_local(u_est, c, halo, "x")
            return _gaussian_local(u_new, sigma_diffusion, kernelwidth)

        def cond(carry):
            _, _, it, conv = carry
            return (it < niter) & ~conv

        def body(carry):
            u_est, prev, it, conv = carry
            u_new = one_step(u_est)
            prev_norm = _norm_global(prev, "x")
            diff_norm = _norm_global(u_new - prev, "x")
            err = jnp.where(prev_norm == 0, 0.0,
                            diff_norm / jnp.where(prev_norm == 0, 1.0, prev_norm))
            conv = (err < convergence_tol) & (it > 1)
            return (u_new, u_new, it + 1, conv)

        u0 = jnp.zeros_like(u)
        u_est, _, it, _ = lax.while_loop(
            cond, body, (u0, u0, jnp.int32(0), jnp.bool_(False))
        )
        u = _compose_local(u, u_est, halo, "x")
        return u, it

    return jax.jit(solve)


def _downsample2_local(f, axis_name: str):
    """Factor-2 box downsample of ``[..., nxl, ny]`` strips — purely local
    when nxl is even (each strip's patches stay inside it), matching
    ``ops.resample.downsample_image`` for pyramid dims."""
    nxl, ny = f.shape[-2], f.shape[-1]
    shaped = f.reshape(*f.shape[:-2], nxl // 2, 2, ny // 2, 2)
    return shaped.mean(axis=(-3, -1))


def _upsample2_local(f, axis_name: str):
    """Factor-2 origin-aligned bilinear upsample of ``[..., nxl, ny]``
    strips with a 1-row halo (output rows 2i need in-rows i, i ok; rows
    2i+1 need i and i+1 — the +1 may live on the next strip). Matches
    ``ops.resample.upsample_image`` for even global dims."""
    nxl, ny = f.shape[-2], f.shape[-1]
    idx = lax.axis_index(axis_name)
    n = lax.psum(1, axis_name)
    nx_glob = n * nxl

    # x-direction: out[2i] = in[i]; out[2i+1] = (in[i] + in[i+1]) / 2,
    # renormalized at the global last row (only in[i] contributes).
    _top, bot = _halo_exchange_k(f, 1, axis_name)
    nxt = jnp.concatenate([f[..., 1:, :], bot], axis=-2)  # in[i+1]
    gi = lax.broadcasted_iota(jnp.int32, (nxl, 1), 0) + idx * nxl
    last = (gi == nx_glob - 1)
    odd = jnp.where(last, f, (f + nxt) * 0.5)
    up_x = jnp.stack([f, odd], axis=-2).reshape(*f.shape[:-2], 2 * nxl, ny)

    # y-direction (unsharded): same pattern locally.
    nxt_y = jnp.concatenate(
        [up_x[..., :, 1:], jnp.zeros_like(up_x[..., :, :1])], axis=-1
    )
    gj = lax.broadcasted_iota(jnp.int32, (1, ny), 1)
    last_y = (gj == ny - 1)
    odd_y = jnp.where(last_y, up_x, (up_x + nxt_y) * 0.5)
    return jnp.stack([up_x, odd_y], axis=-1).reshape(
        *up_x.shape[:-1], 2 * ny
    )


def _norm_psum(v, axis_name: str):
    mag = jnp.sqrt(v[0] ** 2 + v[1] ** 2)
    return lax.psum(jnp.sum(mag), axis_name) / lax.psum(
        jnp.float32(mag.size), axis_name
    )


def _level_local(family: str, u, iref_l, imov_l, level_niter: int, halo: int,
                 p: dict, convergence_tol: float):
    """One level solve on local strips (inside shard_map): family-dispatched
    per-iteration step + the Logger convergence gate via psum norms +
    final composition. Families: thirions, diffeo, diffusion, elastic,
    fluid."""
    iaux = _warp_local(imov_l, u, halo, "x")

    if family in ("thirions", "diffeo"):
        def one_step(state):
            u_est, _aux = state
            iwar = _warp_local(iaux, u_est, halo, "x")
            grad = _gradient_local(iwar, "x")
            it_img = iwar - iref_l
            den = (grad[0] ** 2 + grad[1] ** 2
                   + it_img**2 * (p["sigma_i"]**2) / (p["sigma_x"]**2))
            num = grad * it_img[None] * -1.0
            c = jnp.where(den[None] > 0,
                          num / jnp.where(den[None] > 0, den[None], 1.0), 0.0)
            c = _gaussian_local(c, p["sigma_fluid"], p["kernelwidth"])
            if family == "diffeo":
                normsq = c[0] ** 2 + c[1] ** 2
                m = jnp.sqrt(lax.pmax(jnp.max(normsq), "x"))
                nsq_f = jnp.ceil(
                    1.0 + jnp.log2(jnp.maximum(m, jnp.finfo(c.dtype).tiny))
                )
                nsq = jnp.where(m > 0, jnp.maximum(nsq_f, 0.0), 0.0).astype(
                    jnp.int32
                )
                v = c * jnp.exp2(-nsq.astype(c.dtype))
                v = lax.fori_loop(
                    0, nsq, lambda _, w: _compose_local(w, w, halo, "x"), v
                )
                c = v
            u_new = _compose_local(u_est, c, halo, "x")
            return _gaussian_local(u_new, p["sigma_diffusion"], p["kernelwidth"]), _aux
        aux0 = ()
    elif family in ("diffusion", "elastic"):
        grad_i = _gradient_local(iaux, "x")
        it_img = iaux - iref_l
        nxl, ny = iref_l.shape
        idx = lax.axis_index("x")
        n = lax.psum(1, "x")
        nx_glob = n * nxl
        gi = lax.broadcasted_iota(jnp.int32, (nxl, ny), 0) + idx * nxl
        gj = lax.broadcasted_iota(jnp.int32, (nxl, ny), 1)
        if family == "diffusion":
            den = p["alpha"] ** 2 + grad_i[0] ** 2 + grad_i[1] ** 2

            def one_step(state):
                u_est, _aux = state
                q = _qlaplacian_halo(u_est, "x")
                inner = it_img + q[0] * grad_i[0] + q[1] * grad_i[1]
                f = grad_i * inner[None]
                return q - f / den[None], _aux
        else:
            from opticalflow2d_tpu.solvers.elastic import _gs_candidate

            interior = ((gi >= 1) & (gi <= nx_glob - 2)
                        & (gj >= 1) & (gj <= ny - 2))
            red = ((gi + gj) % 2 == 0) & interior
            black = ((gi + gj) % 2 == 1) & interior

            def one_step(state):
                u_est, _aux = state
                inner = it_img + u_est[0] * grad_i[0] + u_est[1] * grad_i[1]
                b = grad_i * inner[None]
                zrow = jnp.zeros((2, 1, ny), u_est.dtype)
                b_pad = jnp.concatenate([zrow, b, zrow], axis=-2)

                def half(x, mask):
                    top, bot = _halo_exchange_k(x, 1, "x")
                    xp = jnp.concatenate([top, x, bot], axis=-2)
                    cand = _gs_candidate(
                        xp, b_pad, p["mu"], p["lam"], p.get("omega", 0.66),
                        p.get("reference_stencil", True),
                    )
                    return jnp.where(mask, cand[:, 1:-1, :], x)

                return half(half(u_est, red), black), _aux
        aux0 = ()
    elif family == "curvature":
        from opticalflow2d_tpu.ops.dct import (
            _dct2_matrix, _dct3_matrix, curvature_eigenvalues,
        )

        grad_i = _gradient_local(iaux, "x")
        it_img = iaux - iref_l
        nxl, ny = iref_l.shape
        n_sz = lax.psum(1, "x")
        nx_g = n_sz * nxl
        nyl = ny // n_sz
        if ny % n_sz:
            raise ValueError("curvature SP needs ny divisible by the mesh")
        c2x = jnp.asarray(_dct2_matrix(nx_g), u.dtype)
        c3x = jnp.asarray(_dct3_matrix(nx_g), u.dtype)
        c2y = jnp.asarray(_dct2_matrix(ny), u.dtype)
        c3y = jnp.asarray(_dct3_matrix(ny), u.dtype)
        eig = curvature_eigenvalues(nx_g, ny, p["alpha"], p.get("tau", 1.0),
                                    u.dtype)
        scale = 1.0 / (4.0 * nx_g * ny)
        tau = p.get("tau", 1.0)

        def one_step(state):
            u_est, _aux = state
            inner = it_img + u_est[0] * grad_i[0] + u_est[1] * grad_i[1]
            f = grad_i * inner[None]
            rhs = u_est - tau * f
            t = jnp.matmul(rhs, c2y.T, precision=lax.Precision.HIGHEST)
            t = lax.all_to_all(t, "x", split_axis=2, concat_axis=1, tiled=True)
            eig_slice = lax.dynamic_slice(
                eig, (0, lax.axis_index("x") * nyl), (nx_g, nyl)
            )
            t = jnp.einsum("kx,cxy->cky", c2x, t,
                           precision=lax.Precision.HIGHEST) * eig_slice[None]
            t = jnp.einsum("kx,cxy->cky", c3x, t,
                           precision=lax.Precision.HIGHEST)
            t = lax.all_to_all(t, "x", split_axis=1, concat_axis=2, tiled=True)
            t = jnp.matmul(t, c3y.T, precision=lax.Precision.HIGHEST)
            return t * scale, _aux

        aux0 = ()
    elif family == "fluid":
        # Fluid needs its own loop shape (regridding mutates u/derivatives);
        # handled below instead of the generic while-loop.
        pass
    else:  # pragma: no cover
        raise ValueError(family)

    if family == "fluid":
        from opticalflow2d_tpu.solvers.elastic import _gs_candidate

        nxl, ny = iref_l.shape
        mu, lam = p["mu"], p["lam"]
        omega = p.get("omega", 0.66)
        dumax = p.get("dumax", 0.65)
        ts_skip = p.get("timestep_skip", 65.0)
        rg_thr = p.get("regrid_threshold", 0.5)
        idx = lax.axis_index("x")
        n = lax.psum(1, "x")
        nx_glob = n * nxl
        gi = lax.broadcasted_iota(jnp.int32, (nxl, ny), 0) + idx * nxl
        gj = lax.broadcasted_iota(jnp.int32, (nxl, ny), 1)
        interior = (gi >= 1) & (gi <= nx_glob - 2) & (gj >= 1) & (gj <= ny - 2)
        red = ((gi + gj) % 2 == 0) & interior
        black = ((gi + gj) % 2 == 1) & interior

        def sor(x, b):
            zrow = jnp.zeros((2, 1, ny), x.dtype)
            b_pad = jnp.concatenate([zrow, b, zrow], axis=-2)

            def half(x, mask):
                top, bot = _halo_exchange_k(x, 1, "x")
                xp = jnp.concatenate([top, x, bot], axis=-2)
                cand = _gs_candidate(
                    xp, b_pad, mu, lam, omega,
                    p.get("reference_stencil", True),
                )
                return jnp.where(mask, cand[:, 1:-1, :], x)

            return half(half(x, red), black)

        def partials(f):
            top, bot = _halo_exchange_k(f, 1, "x")
            fp = jnp.concatenate([top, f, bot], axis=-2)
            gx = (fp[..., 2:, :] - fp[..., :-2, :]) * 0.5
            first = fp[..., 2:, :] - fp[..., 1:-1, :]
            last = fp[..., 1:-1, :] - fp[..., :-2, :]
            gx = jnp.where(gi == 0, first,
                           jnp.where(gi == nx_glob - 1, last, gx))
            from opticalflow2d_tpu.ops.grid import partial_y

            return gx, partial_y(f)

        def derive(u_tot):
            ia = _warp_local(imov_l, u_tot, halo, "x")
            g = _gradient_local(ia, "x")
            return g, ia - iref_l

        grad_i0, it_img0 = _gradient_local(iaux, "x"), iaux - iref_l

        def fcond(carry):
            it, conv = carry[-3], carry[-2]
            return (it < level_niter) & ~conv

        def fbody(carry):
            u_tot, u_est, prev, vel, grad_i, it_img, it, conv, nregrid = carry
            inner = it_img + u_est[0] * grad_i[0] + u_est[1] * grad_i[1]
            f = grad_i * inner[None]
            vel = sor(vel, f)
            dudx, dudy = partials(u_est)
            r = vel - dudx * vel[0:1] - dudy * vel[1:2]
            m = jnp.sqrt(lax.pmax(jnp.max(r[0] ** 2 + r[1] ** 2), "x"))
            dt = dumax / m
            do_step = dt < ts_skip
            u_new = jnp.where(do_step, u_est + r * jnp.where(do_step, dt, 0.0),
                              u_est)
            pn = _norm_psum(prev, "x")
            dn = _norm_psum(u_new - prev, "x")
            err = jnp.where(pn == 0, 0.0, dn / jnp.where(pn == 0, 1.0, pn))
            conv = (err < convergence_tol) & (it > 1)
            dudx2, dudy2 = partials(u_new)
            jac = (1.0 + dudx2[0]) * (1.0 + dudy2[1]) - dudx2[1] * dudy2[0]
            do_regrid = ~conv & (lax.pmin(jnp.min(jac), "x") < rg_thr)
            logged = u_new

            def regrid(args):
                u_tot, u_new, grad_i, it_img = args
                u_tot2 = _compose_local(u_tot, u_new, halo, "x")
                g2, t2 = derive(u_tot2)
                return u_tot2, jnp.zeros_like(u_new), g2, t2

            u_tot, u_new, grad_i, it_img = lax.cond(
                do_regrid, regrid, lambda a: a, (u_tot, u_new, grad_i, it_img)
            )
            return (u_tot, u_new, logged, vel, grad_i, it_img, it + 1, conv,
                    nregrid + do_regrid.astype(jnp.int32))

        u0 = jnp.zeros_like(u)
        carry = (u, u0, u0, u0, grad_i0, it_img0, jnp.int32(0),
                 jnp.bool_(False), jnp.int32(0))
        u_tot, u_est, _, _, _, _, it, _, _ = lax.while_loop(
            fcond, fbody, carry
        )
        return _compose_local(u_tot, u_est, halo, "x"), it

    def cond(carry):
        _, _, _, it, conv = carry
        return (it < level_niter) & ~conv

    def body(carry):
        u_est, aux, prev, it, conv = carry
        u_new, aux = one_step((u_est, aux))
        pn = _norm_psum(prev, "x")
        dn = _norm_psum(u_new - prev, "x")
        err = jnp.where(pn == 0, 0.0, dn / jnp.where(pn == 0, 1.0, pn))
        conv = (err < convergence_tol) & (it > 1)
        return (u_new, aux, u_new, it + 1, conv)

    u0 = jnp.zeros_like(u)
    u_est, _, _, it, _ = lax.while_loop(
        cond, body, (u0, aux0, u0, jnp.int32(0), jnp.bool_(False))
    )
    return _compose_local(u, u_est, halo, "x"), it


def make_register_sp(
    mesh: Mesh,
    family: str,
    niter,
    nscales: int = 1,
    halo: int = 2,
    convergence_tol: float = 0.001,
    **params,
):
    """A COMPLETE multi-resolution registration as one explicit shard_map
    program for any of {"thirions", "diffeo", "diffusion", "elastic",
    "curvature", "fluid"}:
    sharded image pyramid, per-level solves with explicit collectives, and
    sharded factor-2 resampling with motion rescale between levels.

    Constraints as in ``make_register_demons_sp`` (dims divisible by
    ``2^nscales * mesh_x``; displacement contract within ``halo``). The
    pyramid motion transport reproduces the reference's full-resolution
    round trip, so it matches the registration driver at any depth.
    Signature: ``(iref, imov) -> (u [2,nx,ny], iterations [nscales+1])``.
    """
    niter = tuple(int(v) for v in niter)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("x", None), P("x", None)),
        out_specs=(P(None, "x", None), P()),
        check_vma=False,
    )
    def solve(iref, imov):
        irefs = [iref]
        imovs = [imov]
        for _ in range(nscales):
            irefs.append(_downsample2_local(irefs[-1], "x"))
            imovs.append(_downsample2_local(imovs[-1], "x"))

        iters = []
        u_full = jnp.zeros((2,) + iref.shape, iref.dtype)
        for sc in range(nscales, -1, -1):
            if sc == nscales and sc > 0:
                # Coarsest level starts from zero (the reference skips the
                # motion downsample at s == nscales).
                u = jnp.zeros((2,) + irefs[sc].shape, iref.dtype)
            elif 0 < sc < nscales:
                # The reference's quirk: intermediate levels re-derive their
                # motion by downsampling the running FULL-RES field (which
                # was itself upsampled from the coarser solve) — reproduce
                # the round trip exactly (ImageRegistration.cpp:137-151).
                u = u_full
                for _ in range(sc):
                    u = _downsample2_local(u, "x") * 0.5
            else:  # sc == 0
                u = u_full
            u, it = _level_local(
                family, u, irefs[sc], imovs[sc], niter[sc], halo, params,
                convergence_tol,
            )
            iters.append(it)
            if sc > 0:
                for _ in range(sc):
                    u = _upsample2_local(u, "x") * 2.0
                u_full = u
            else:
                u_full = u
        return u_full, jnp.stack(iters)

    return jax.jit(solve)


def make_register_demons_sp(
    mesh: Mesh,
    sigma_i: float,
    sigma_x: float,
    sigma_diffusion: float,
    sigma_fluid: float,
    kernelwidth: int,
    niter,
    nscales: int = 1,
    halo: int = 2,
    convergence_tol: float = 0.001,
):
    """Back-compat wrapper: the complete explicit-SP Thirion demons
    registration (see ``make_register_sp``)."""
    return make_register_sp(
        mesh, "thirions", niter, nscales=nscales, halo=halo,
        convergence_tol=convergence_tol,
        sigma_i=sigma_i, sigma_x=sigma_x, sigma_diffusion=sigma_diffusion,
        sigma_fluid=sigma_fluid, kernelwidth=kernelwidth,
    )


def make_variational_level_sharded(
    mesh: Mesh,
    method: str,
    niter: int,
    halo: int = 2,
    alpha: float = 1.0,
    tau: float = 1.0,
    mu: float = 1.0,
    lam: float = 0.0,
    omega: float = 0.66,
    convergence_tol: float = 0.001,
    reference_stencil: bool = True,
    grid_shape=None,
):
    """A full variational LEVEL solve (``method`` in {"diffusion",
    "elastic", "curvature"}) as one explicit shard_map program: derivatives
    once (halo-exchanged warp + gradient), then while_loop iterations of the
    solver stencil with ppermute halos (curvature: distributed DCT via
    all_to_all), the Logger convergence gate via psum norms, and the final
    composition — the reference's ImageRegistrationOpticalFlow level loop
    with every collective explicit.

    Curvature extra kwargs: ``tau`` (uses ``alpha`` as the regularisation
    weight); requires nx and ny divisible by the mesh x-axis size.

    Signature: ``(u [2,nx,ny], iref, imov) -> (u, iterations)``.
    """
    from opticalflow2d_tpu.solvers.elastic import _gs_candidate

    def _norm_global(v, axis_name):
        mag = jnp.sqrt(v[0] ** 2 + v[1] ** 2)
        total = lax.psum(jnp.sum(mag), axis_name)
        count = lax.psum(jnp.float32(mag.size), axis_name)
        return total / count

    n_static = mesh.shape["x"]
    if method == "curvature":
        if grid_shape is None:
            raise ValueError("curvature needs grid_shape=(nx, ny)")
        if grid_shape[0] % n_static or grid_shape[1] % n_static:
            raise ValueError("curvature grid dims must divide the mesh x size")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "x", None), P("x", None), P("x", None)),
        out_specs=(P(None, "x", None), P()),
        check_vma=False,
    )
    def solve(u, iref, imov):
        iaux = _warp_local(imov, u, halo, "x")
        grad_i = _gradient_local(iaux, "x")
        it_img = iaux - iref

        nxl, ny = iref.shape
        idx = lax.axis_index("x")
        n = lax.psum(1, "x")
        nx_glob = n * nxl
        gi = lax.broadcasted_iota(jnp.int32, (nxl, ny), 0) + idx * nxl
        gj = lax.broadcasted_iota(jnp.int32, (nxl, ny), 1)

        if method == "diffusion":
            den = alpha * alpha + grad_i[0] ** 2 + grad_i[1] ** 2

            def step(u_est):
                q = _qlaplacian_halo(u_est, "x")
                inner = it_img + q[0] * grad_i[0] + q[1] * grad_i[1]
                f = grad_i * inner[None]
                return q - f / den[None]

        elif method == "elastic":
            interior = (gi >= 1) & (gi <= nx_glob - 2) & (gj >= 1) & (gj <= ny - 2)
            red = ((gi + gj) % 2 == 0) & interior
            black = ((gi + gj) % 2 == 1) & interior

            def step(u_est):
                inner = it_img + u_est[0] * grad_i[0] + u_est[1] * grad_i[1]
                b = grad_i * inner[None]
                zrow = jnp.zeros((2, 1, ny), u_est.dtype)
                b_pad = jnp.concatenate([zrow, b, zrow], axis=-2)

                def half(x, mask):
                    top, bot = _halo_exchange_k(x, 1, "x")
                    xp = jnp.concatenate([top, x, bot], axis=-2)
                    cand = _gs_candidate(xp, b_pad, mu, lam, omega,
                                         reference_stencil)
                    return jnp.where(mask, cand[:, 1:-1, :], x)

                return half(half(u_est, red), black)

        elif method == "curvature":
            from opticalflow2d_tpu.ops.dct import (
                _dct2_matrix, _dct3_matrix, curvature_eigenvalues,
            )

            nx_g, ny_g = grid_shape
            nyl = ny_g // n_static
            c2x = jnp.asarray(_dct2_matrix(nx_g), u.dtype)
            c3x = jnp.asarray(_dct3_matrix(nx_g), u.dtype)
            c2y = jnp.asarray(_dct2_matrix(ny_g), u.dtype)
            c3y = jnp.asarray(_dct3_matrix(ny_g), u.dtype)
            eig = curvature_eigenvalues(nx_g, ny_g, alpha, tau, u.dtype)
            scale = 1.0 / (4.0 * nx_g * ny_g)

            def step(u_est):
                inner = it_img + u_est[0] * grad_i[0] + u_est[1] * grad_i[1]
                f = grad_i * inner[None]
                rhs = u_est - tau * f
                t = jnp.matmul(rhs, c2y.T, precision=lax.Precision.HIGHEST)
                t = lax.all_to_all(t, "x", split_axis=2, concat_axis=1, tiled=True)
                eig_slice = lax.dynamic_slice(
                    eig, (0, lax.axis_index("x") * nyl), (nx_g, nyl)
                )
                t = jnp.einsum("kx,cxy->cky", c2x, t,
                               precision=lax.Precision.HIGHEST) * eig_slice[None]
                t = jnp.einsum("kx,cxy->cky", c3x, t,
                               precision=lax.Precision.HIGHEST)
                t = lax.all_to_all(t, "x", split_axis=1, concat_axis=2, tiled=True)
                t = jnp.matmul(t, c3y.T, precision=lax.Precision.HIGHEST)
                return t * scale

        else:  # pragma: no cover
            raise ValueError(method)

        def cond(carry):
            _, _, it, conv = carry
            return (it < niter) & ~conv

        def body(carry):
            u_est, prev, it, conv = carry
            u_new = step(u_est)
            prev_norm = _norm_global(prev, "x")
            diff_norm = _norm_global(u_new - prev, "x")
            err = jnp.where(prev_norm == 0, 0.0,
                            diff_norm / jnp.where(prev_norm == 0, 1.0, prev_norm))
            conv = (err < convergence_tol) & (it > 1)
            return (u_new, u_new, it + 1, conv)

        u0 = jnp.zeros_like(u)
        u_est, _, it, _ = lax.while_loop(
            cond, body, (u0, u0, jnp.int32(0), jnp.bool_(False))
        )
        u = _compose_local(u, u_est, halo, "x")
        return u, it

    return jax.jit(solve)


def make_fluid_level_sharded(
    mesh: Mesh,
    mu: float,
    lam: float,
    omega: float,
    niter: int,
    halo: int = 2,
    dumax: float = 0.65,
    timestep_skip: float = 65.0,
    regrid_threshold: float = 0.5,
    convergence_tol: float = 0.001,
    reference_stencil: bool = True,
):
    """A full viscous-fluid LEVEL solve as one explicit shard_map program:
    per-iteration red-black SOR with ppermute halos, material-derivative
    increment (halo-exchanged gradients), adaptive timestep via pmax,
    Jacobian-triggered regridding via psum-min, and the Logger convergence
    gate via psum norms — the reference's ImageRegistrationFluid level loop
    (``ImageRegistrationFluid.cpp:67-142``) with every collective explicit.

    Signature: ``(u [2,nx,ny], iref, imov) -> (u, iterations, regrids)``.
    """
    from opticalflow2d_tpu.solvers.elastic import _gs_candidate

    def _norm_global(v, axis_name):
        mag = jnp.sqrt(v[0] ** 2 + v[1] ** 2)
        total = lax.psum(jnp.sum(mag), axis_name)
        count = lax.psum(jnp.float32(mag.size), axis_name)
        return total / count

    def _sor_sweep_local(x, b):
        nxl, ny = x.shape[-2], x.shape[-1]
        idx = lax.axis_index("x")
        n = lax.psum(1, "x")
        nx_glob = n * nxl
        gi = lax.broadcasted_iota(jnp.int32, (nxl, ny), 0) + idx * nxl
        gj = lax.broadcasted_iota(jnp.int32, (nxl, ny), 1)
        interior = (gi >= 1) & (gi <= nx_glob - 2) & (gj >= 1) & (gj <= ny - 2)
        red = ((gi + gj) % 2 == 0) & interior
        black = ((gi + gj) % 2 == 1) & interior
        zrow = jnp.zeros((2, 1, ny), x.dtype)
        b_pad = jnp.concatenate([zrow, b, zrow], axis=-2)

        def half(x, mask):
            top, bot = _halo_exchange_k(x, 1, "x")
            xp = jnp.concatenate([top, x, bot], axis=-2)
            cand = _gs_candidate(xp, b_pad, mu, lam, omega, reference_stencil)
            return jnp.where(mask, cand[:, 1:-1, :], x)

        return half(half(x, red), black)

    def _partials_local(f):
        """(d/dx, d/dy) of each channel of ``f [..., nxl, ny]`` with halo
        exchange in x and one-sided global borders."""
        nxl, ny = f.shape[-2], f.shape[-1]
        idx = lax.axis_index("x")
        n = lax.psum(1, "x")
        nx_glob = n * nxl
        top, bot = _halo_exchange_k(f, 1, "x")
        fp = jnp.concatenate([top, f, bot], axis=-2)
        gx = (fp[..., 2:, :] - fp[..., :-2, :]) * 0.5
        gi = lax.broadcasted_iota(jnp.int32, (nxl, ny), 0) + idx * nxl
        first = fp[..., 2:, :] - fp[..., 1:-1, :]
        last = fp[..., 1:-1, :] - fp[..., :-2, :]
        gx = jnp.where(gi == 0, first, jnp.where(gi == nx_glob - 1, last, gx))

        from opticalflow2d_tpu.ops.grid import partial_y

        gy = partial_y(f)
        return gx, gy

    def _jacobian_min_global(u):
        dudx, _ = _partials_local(u)
        _, dudy = _partials_local(u)
        jac = (1.0 + dudx[0]) * (1.0 + dudy[1]) - dudx[1] * dudy[0]
        return lax.pmin(jnp.min(jac), "x")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "x", None), P("x", None), P("x", None)),
        out_specs=(P(None, "x", None), P(), P()),
        check_vma=False,
    )
    def solve(u, iref, imov):
        def derive(u_tot):
            iaux = _warp_local(imov, u_tot, halo, "x")
            grad = _gradient_local(iaux, "x")
            return grad, iaux - iref

        grad_i, it_img = derive(u)

        def body(carry):
            u_tot, u_est, prev, vel, grad_i, it_img, it, conv, nregrid = carry
            # force at current motion estimate
            inner = it_img + u_est[0] * grad_i[0] + u_est[1] * grad_i[1]
            f = grad_i * inner[None]
            vel = _sor_sweep_local(vel, f)
            dudx, dudy = _partials_local(u_est)
            r = vel - dudx * vel[0:1] - dudy * vel[1:2]
            m = jnp.sqrt(lax.pmax(jnp.max(r[0] ** 2 + r[1] ** 2), "x"))
            dt = dumax / m
            do_step = dt < timestep_skip
            u_new = jnp.where(do_step, u_est + r * jnp.where(do_step, dt, 0.0), u_est)

            prev_norm = _norm_global(prev, "x")
            diff_norm = _norm_global(u_new - prev, "x")
            err = jnp.where(prev_norm == 0, 0.0,
                            diff_norm / jnp.where(prev_norm == 0, 1.0, prev_norm))
            conv = (err < convergence_tol) & (it > 1)

            jac_min = _jacobian_min_global(u_new)
            do_regrid = ~conv & (jac_min < regrid_threshold)

            # The Logger's prev is the PRE-regrid logged estimate (it lives
            # outside the regrid block in the reference).
            logged = u_new

            def regrid(args):
                u_tot, u_new, grad_i, it_img = args
                u_tot2 = _compose_local(u_tot, u_new, halo, "x")
                g2, t2 = derive(u_tot2)
                return u_tot2, jnp.zeros_like(u_new), g2, t2

            u_tot, u_new, grad_i, it_img = lax.cond(
                do_regrid, regrid, lambda a: a, (u_tot, u_new, grad_i, it_img)
            )
            return (u_tot, u_new, logged, vel, grad_i, it_img,
                    it + 1, conv, nregrid + do_regrid.astype(jnp.int32))

        def cond(carry):
            it, conv = carry[-3], carry[-2]
            return (it < niter) & ~conv

        u0 = jnp.zeros_like(u)
        carry = (u, u0, u0, u0, grad_i, it_img, jnp.int32(0), jnp.bool_(False),
                 jnp.int32(0))
        u, u_est, _, _, _, _, it, _, nregrid = lax.while_loop(cond, body, carry)
        u = _compose_local(u, u_est, halo, "x")
        return u, it, nregrid

    return jax.jit(solve)


def make_diffusion_sweeps_sharded(mesh: Mesh, alpha: float, niter: int):
    """Build a jitted function running ``niter`` Horn-Schunck sweeps with
    explicit ICI halo exchange; inputs/outputs sharded in x-strips.

    Signature: ``(u [2, nx, ny], grad_i [2, nx, ny], it [nx, ny]) -> u``.
    The image x-size must be divisible by the mesh's "x" axis.
    """
    spec_u = P(None, "x", None)
    spec_im = P("x", None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_u, spec_u, spec_im),
        out_specs=spec_u,
        check_vma=False,
    )
    def sweeps(u, grad_i, it_img):
        den = alpha * alpha + grad_i[0] ** 2 + grad_i[1] ** 2

        def body(_, u):
            q = _qlaplacian_halo(u, "x")
            inner = it_img + q[0] * grad_i[0] + q[1] * grad_i[1]
            f = grad_i * inner[None]
            return q - f / den[None]

        return lax.fori_loop(0, niter, body, u)

    return jax.jit(sweeps)
