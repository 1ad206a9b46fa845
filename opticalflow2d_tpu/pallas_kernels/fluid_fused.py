"""Fused viscous-fluid iteration: force + SOR sweep + material derivative
in ONE Pallas TPU pass.

The jnp fluid step (``solvers.fluid.make_fluid_step``, reference
``src/regularization/OpticalFlow/OpticalFlowFluid.cpp:123-140``) chains
L-SSD force -> red/black SOR sweep on the velocity -> material-derivative
increment -> global maxabs -> adaptive Euler step: ~5 HBM round trips per
iteration, which made fluid the slowest family end-to-end (85.5 ms
@1024^2 vs 30-46 for the others, benchmarks/RESULTS.md r2). This kernel
collapses everything except the *global* pieces into one VMEM pass:

    read (u, vel, g) -> force(u) -> red half-sweep -> black half-sweep
        -> material derivative R -> write (vel', R, per-block max|R|^2)

The timestep is inherently global (``dt = dumax / maxabs(R)``), so the
scalar max-reduce over the per-block partials, the ``dt`` computation and
the conditional Euler update ``u += R*dt`` stay outside (one cheap
XLA-fused elementwise pass) — exactly like the blocked kernels' Logger
partials. ``max`` is associative and exact, so ``dt`` is exactly
``dumax / maxabs(R)`` for the kernel's own R; R itself agrees with the
jnp chain to ~1 ulp (identical expressions, but roll-based and
pad/slice-based XLA graphs may make different FMA/fusion choices). The
trajectory STRUCTURE — iteration counts, skip decisions, regrid events —
matches the jnp path exactly (pinned in tests/test_fluid_fused.py).

Tiling: the black half-sweep taps red-updated values one row away, which
tap old values one row further (cone = 2 rows/iteration, same as
elastic_block with k=1); the material derivative adds one row of reach on
``u`` only, which is an exact input everywhere in the tile. pad = 8 (the
sublane tile). Halos stream through clamped up/center/down BlockSpec
blocks — no input padding copies; clamp-duplicated rows at the global
edges are masked by global-row validity, as everywhere else.

Per-iteration float math is op-for-op ``lssd_force`` +
``elastic.sor_sweep(ordering="redblack")`` + ``fluid.make_fluid_step``'s
material derivative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflow2d_tpu.pallas_kernels import MB, compiler_params
from opticalflow2d_tpu.pallas_kernels.elastic_block import sor_candidate_tile

_PAD = 8  # cone reach is 2 rows (red + black half-sweeps), 8-aligned


def _fluid_body(u, vel, g, gi0, nx, vel_ref, r_ref, max_ref, *, mu: float,
                lam: float, omega: float, reference_stencil: bool,
                maxabs_bug: bool, tb: int, pad: int):
    """One fluid iteration's fusable part on one extended tile.
    ``u, vel [2, e, ny]``, ``g [3, e, ny]`` (gx, gy, It); ``gi0`` the
    global row of tile row 0 (traced ok), ``nx`` the global x extent
    (traced ok). Writes the interior velocity and increment plus this
    block's max-|R|^2 partial (broadcast over 8 sublanes)."""
    e = tb + 2 * pad
    ny = u.shape[-1]
    gx, gy, it_img = g[0], g[1], g[2]

    gi = lax.broadcasted_iota(jnp.int32, (e, ny), 0) + gi0
    gj = lax.broadcasted_iota(jnp.int32, (e, ny), 1)
    interior = (gi >= 1) & (gi <= nx - 2) & (gj >= 1) & (gj <= ny - 2)
    red = (((gi + gj) % 2) == 0) & interior
    black = (((gi + gj) % 2) == 1) & interior

    # 1. L-SSD force at the *motion* u (OpticalFlow.cpp:15-39; rhs of the
    #    Navier-Lame solve for the velocity).
    inner = it_img + u[0] * gx + u[1] * gy
    b = g[:2] * inner[None]

    # 2. One red-black SOR sweep on the velocity (warm-started across
    #    iterations by the caller's carry), borders untouched.
    cand = sor_candidate_tile(vel, b, mu, lam, omega, reference_stencil)
    v_half = jnp.where(red[None], cand, vel)
    cand = sor_candidate_tile(v_half, b, mu, lam, omega, reference_stencil)
    v_new = jnp.where(black[None], cand, v_half)

    # 3. Material derivative R = v - (du/dx) v_x - (du/dy) v_y
    #    (OpticalFlowFluid.cpp:60-90). One-sided d/du at the global
    #    borders, ops.grid.partial_x/y expression-for-expression.
    nxt = pltpu.roll(u, e - 1, 1)
    prv = pltpu.roll(u, 1, 1)
    dudx = jnp.where(gi[None] == 0, nxt - u,
                     jnp.where(gi[None] == nx - 1, u - prv,
                               (nxt - prv) * 0.5))
    nyt = pltpu.roll(u, ny - 1, 2)
    pvy = pltpu.roll(u, 1, 2)
    dudy = jnp.where(gj[None] == 0, nyt - u,
                     jnp.where(gj[None] == ny - 1, u - pvy,
                               (nyt - pvy) * 0.5))
    r = v_new - dudx * v_new[0:1] - dudy * v_new[1:2]

    vel_ref[:, :, :] = v_new[:, pad:pad + tb, :]
    if r_ref is not None:
        r_ref[:, :, :] = r[:, pad:pad + tb, :]

    # 4. Per-block max |R|^2 partial (Motion.cpp:51-58 semantics; bug mode
    #    doubles the y component). max is exact under any association, so
    #    the caller's sqrt(max(partials)) equals motion_maxabs bitwise.
    ri = r[:, pad:pad + tb, :]
    if maxabs_bug:
        normsq = ri[1] ** 2 + ri[1] ** 2
    else:
        normsq = ri[0] ** 2 + ri[1] ** 2
    m = jnp.max(normsq, axis=0, keepdims=True)  # [1, ny]
    max_ref[0, :, :] = jnp.broadcast_to(m, (8, ny))


def _dense_kernel(u_c, u_up, u_dn, v_c, v_up, v_dn, g_c, g_up, g_dn,
                  vel_ref, r_ref, max_ref, *, nx, **kw):
    i = pl.program_id(0)
    u = jnp.concatenate([u_up[:, :, :], u_c[:, :, :], u_dn[:, :, :]], axis=1)
    vel = jnp.concatenate([v_up[:, :, :], v_c[:, :, :], v_dn[:, :, :]], axis=1)
    g = jnp.concatenate([g_up[:, :, :], g_c[:, :, :], g_dn[:, :, :]], axis=1)
    _fluid_body(u, vel, g, i * kw["tb"] - kw["pad"], nx, vel_ref, r_ref,
                max_ref, **kw)


def _strip_kernel(scal_ref, u_hbm, vel_hbm, g_hbm, vel_ref, r_ref, max_ref,
                  u_sc, vel_sc, g_sc, sem_u, sem_v, sem_g, **kw):
    """Strip-local entry: inputs pre-padded with ``_PAD`` exchanged halo
    rows; manual DMA of the extended tile; ``scal_ref`` prefetches
    (strip global row origin, global x extent)."""
    i = pl.program_id(0)
    tb, pad = kw["tb"], kw["pad"]
    e = tb + 2 * pad
    d0 = pltpu.make_async_copy(u_hbm.at[:, pl.ds(i * tb, e), :], u_sc, sem_u)
    d1 = pltpu.make_async_copy(vel_hbm.at[:, pl.ds(i * tb, e), :], vel_sc,
                               sem_v)
    d2 = pltpu.make_async_copy(g_hbm.at[:, pl.ds(i * tb, e), :], g_sc, sem_g)
    d0.start(); d1.start(); d2.start()
    d0.wait(); d1.wait(); d2.wait()
    _fluid_body(u_sc[:, :, :], vel_sc[:, :, :], g_sc[:, :, :],
                scal_ref[0] + i * tb - pad, scal_ref[1],
                vel_ref, r_ref, max_ref, **kw)


# Measured (tile cap, vmem limit) tiers (TPU through the axon tunnel,
# benchmarks/r6_results.jsonl `fluid fused` rows — the full step
# incl. the dt/Euler tail, vs the jnp chain):
#   1024: 96.8 us @tb=256 (jnp 109.8, 1.13x — XLA still fuses well here)
#   2048: 413.8 us @tb=64 (jnp 1889.3, 4.6x — XLA spills past L2)
#   4096: 2374.0 us @tb=64 (jnp 11937.5, 5.0x)
#   8192: 9753.0 us @tb=32 (11270.8 at 16, 14405.5 at 8)
#   16384: tb=8 — the only row tile the remote Mosaic compile accepts at
#   16384 lanes for the gather-class kernels (demons_onepass r8 probe_o:
#   tb=16 HTTP-500s); same clamped-BlockSpec structure here. This tier is
#   what makes fluid 16384^2 possible at all: the jnp chain's SOR/material
#   -derivative temporaries OOM a 16 GB chip (r9_results.jsonl).
_TIERS = ((1024, 256, 48 * MB), (2048, 64, 48 * MB), (4096, 64, 64 * MB),
          (8192, 32, 64 * MB), (16384, 8, 64 * MB))


def _tier(ny: int):
    for cap_ny, tb_cap, limit in _TIERS:
        if ny <= cap_ny:
            return tb_cap, limit
    return None


def fluid_feasible(nx: int, ny: int) -> bool:
    """True when a (tile, vmem-limit) tier exists and the shape admits the
    clamped-halo tiling (nx a multiple of the 8-row pad; callers fall back
    to the jnp step otherwise — pyramid levels are frequently odd)."""
    return _tier(ny) is not None and nx % _PAD == 0 and nx >= 2 * _PAD


def _pick_tb(nx: int, ny: int, tb: int | None):
    tier = _tier(ny)
    tb_cap, limit = tier if tier is not None else (_PAD, 64 * MB)
    if tb and nx % tb == 0 and tb % _PAD == 0:
        return tb, limit
    for cand in range(min(tb_cap, nx), _PAD - 1, -_PAD):
        if nx % cand == 0:
            return cand, limit
    return _PAD, limit


@functools.partial(jax.jit, static_argnames=(
    "mu", "lam", "omega", "reference_stencil", "maxabs_bug", "tb"))
def fluid_iter_pallas(u, vel, g, mu: float, lam: float, omega: float,
                      reference_stencil: bool = True,
                      maxabs_bug: bool = False, tb: int | None = None):
    """The fusable part of one fluid iteration in a single VMEM pass.

    ``u, vel [2, nx, ny]``, ``g = stack_derivs(grad_i, it) [3, nx, ny]``.
    Returns ``(vel_new, r, maxsq)`` where ``maxsq`` is the global max of
    |R|^2 (per ``maxabs_bug``); the caller computes ``dt = dumax /
    sqrt(maxsq)`` and the conditional Euler update — see
    ``solvers.fluid.make_fluid_step``.

    Reference: ``src/regularization/OpticalFlow/OpticalFlowFluid.cpp:
    123-140`` (force + SOR + material derivative + maxabs).
    """
    _, nx, ny = u.shape
    pad = _PAD
    tb, vmem_limit = _pick_tb(nx, ny, tb)
    nblocks = nx // tb
    r_blk = tb // pad
    last = nx // pad - 1
    up = lambda i: jnp.maximum(i * r_blk - 1, 0)
    dn = lambda i: jnp.minimum((i + 1) * r_blk, last)

    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, up(i), 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, dn(i), 0)),
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, up(i), 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, dn(i), 0)),
            pl.BlockSpec((3, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((3, pad, ny), lambda i: (0, up(i), 0)),
            pl.BlockSpec((3, pad, ny), lambda i: (0, dn(i), 0)),
        ],
        out_specs=[
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((1, 8, ny), lambda i: (i, 0, 0)),
        ],
    )
    kernel = functools.partial(
        _dense_kernel, mu=mu, lam=lam, omega=omega,
        reference_stencil=reference_stencil, maxabs_bug=maxabs_bug,
        tb=tb, pad=pad, nx=nx,
    )
    vel_new, r, maxp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=compiler_params(vmem_limit),
        out_shape=[
            jax.ShapeDtypeStruct((2, nx, ny), u.dtype),
            jax.ShapeDtypeStruct((2, nx, ny), u.dtype),
            jax.ShapeDtypeStruct((nblocks, 8, ny), u.dtype),
        ],
    )(u, u, u, vel, vel, vel, g, g, g)
    return vel_new, r, jnp.max(maxp)


@functools.partial(jax.jit, static_argnames=(
    "mu", "lam", "omega", "reference_stencil", "maxabs_bug", "tb"))
def fluid_iter_strip(u_pad, vel_pad, g_pad, row0, nx_glob, mu: float,
                     lam: float, omega: float,
                     reference_stencil: bool = True,
                     maxabs_bug: bool = False, tb: int | None = None):
    """Strip-local fused fluid iteration for shard_map drivers: inputs
    pre-padded with ``_PAD`` exchanged halo rows per side (``u_pad,
    vel_pad [2, nxl+2*_PAD, ny]``, ``g_pad [3, ...]``); ``row0`` the
    strip's global first row, ``nx_glob`` the global x extent (traced
    scalars). Returns ``(vel_new, r, maxsq_local)`` for this strip; the
    caller pmax-reduces maxsq across strips for the global timestep."""
    pad = _PAD
    _, nxp, ny = u_pad.shape
    nxl = nxp - 2 * pad
    tb, vmem_limit = _pick_tb(nxl, ny, tb)
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
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((2, tb, ny), lambda i, _s: (0, i, 0)),
            pl.BlockSpec((2, tb, ny), lambda i, _s: (0, i, 0)),
            pl.BlockSpec((1, 8, ny), lambda i, _s: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, e, ny), u_pad.dtype),
            pltpu.VMEM((2, e, ny), vel_pad.dtype),
            pltpu.VMEM((3, e, ny), g_pad.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _strip_kernel, mu=mu, lam=lam, omega=omega,
        reference_stencil=reference_stencil, maxabs_bug=maxabs_bug,
        tb=tb, pad=pad,
    )
    vel_new, r, maxp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=compiler_params(vmem_limit),
        out_shape=[
            jax.ShapeDtypeStruct((2, nxl, ny), u_pad.dtype),
            jax.ShapeDtypeStruct((2, nxl, ny), u_pad.dtype),
            jax.ShapeDtypeStruct((nblocks, 8, ny), u_pad.dtype),
        ],
    )(scal, u_pad, vel_pad, g_pad)
    return vel_new, r, jnp.max(maxp)


# ---------------------------------------------------------------------------
# Huge-grid stepped-fluid kernels (round 5)
# ---------------------------------------------------------------------------
#
# At 16384^2 the three 2 GB tensors of one fluid_iter_pallas call
# (vel_new + R + the Euler tail's temporaries) cannot coexist with the
# level's persistent state on a 16 GB chip, and buffer donation is
# dropped by the remote backend (r9_results.jsonl OOM series). The
# host-stepped driver therefore runs each iteration as two Mosaic passes
# that never materialize R in HBM:
#   A. fluid_sweep_max_pallas: force + SOR sweep + material derivative,
#      emitting vel_new and ONLY the max-|R|^2 partials (R stays in
#      registers);
#   B. fluid_euler_pallas: recompute R from (u, vel_new) — bit-equal,
#      same expressions on the same stored values — then the conditional
#      Euler update;
#   C. logger_norms.fluid_metrics_pallas: Logger norm pair + jacobian
#      minimum (a combined Euler+metrics kernel exceeded the remote
#      Mosaic compiler's complexity budget at 16384 lanes — HTTP 500,
#      r9 probe — so B and C stay separate).
# The timestep gate rides into pass B as an [8, 128] f32 broadcast tile
# (Mosaic's scalar prefetch is integer-typed).


def _dense_kernel_sweep_max(u_c, u_up, u_dn, v_c, v_up, v_dn, g_c, g_up,
                            g_dn, vel_ref, max_ref, *, nx, **kw):
    i = pl.program_id(0)
    u = jnp.concatenate([u_up[:, :, :], u_c[:, :, :], u_dn[:, :, :]], axis=1)
    vel = jnp.concatenate([v_up[:, :, :], v_c[:, :, :], v_dn[:, :, :]], axis=1)
    g = jnp.concatenate([g_up[:, :, :], g_c[:, :, :], g_dn[:, :, :]], axis=1)
    _fluid_body(u, vel, g, i * kw["tb"] - kw["pad"], nx, vel_ref, None,
                max_ref, **kw)


@functools.partial(jax.jit, static_argnames=(
    "mu", "lam", "omega", "reference_stencil", "maxabs_bug", "tb"))
def fluid_sweep_max_pallas(u, vel, g, mu: float, lam: float, omega: float,
                           reference_stencil: bool = True,
                           maxabs_bug: bool = False, tb: int | None = None):
    """Pass A of the stepped fluid iteration: ``(u, vel, g) -> (vel_new,
    maxabs)`` with R never written to HBM (see the section comment).
    ``maxabs`` is ``sqrt(max |R|^2)`` — bitwise ``motion_maxabs`` of the
    R that pass B recomputes."""
    _, nx, ny = u.shape
    pad = _PAD
    tb, vmem_limit = _pick_tb(nx, ny, tb)
    nblocks = nx // tb
    r_blk = tb // pad
    last = nx // pad - 1
    up = lambda i: jnp.maximum(i * r_blk - 1, 0)
    dn = lambda i: jnp.minimum((i + 1) * r_blk, last)
    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, up(i), 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, dn(i), 0)),
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, up(i), 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, dn(i), 0)),
            pl.BlockSpec((3, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((3, pad, ny), lambda i: (0, up(i), 0)),
            pl.BlockSpec((3, pad, ny), lambda i: (0, dn(i), 0)),
        ],
        out_specs=[
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((1, 8, ny), lambda i: (i, 0, 0)),
        ],
    )
    kernel = functools.partial(
        _dense_kernel_sweep_max, mu=mu, lam=lam, omega=omega,
        reference_stencil=reference_stencil, maxabs_bug=maxabs_bug,
        tb=tb, pad=pad, nx=nx,
    )
    vel_new, maxp = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        compiler_params=compiler_params(vmem_limit),
        out_shape=[
            jax.ShapeDtypeStruct((2, nx, ny), u.dtype),
            jax.ShapeDtypeStruct((nblocks, 8, ny), u.dtype),
        ],
    )(u, u, u, vel, vel, vel, g, g, g)
    return vel_new, jnp.sqrt(jnp.max(maxp))


def _euler_kernel(gate_ref, u_c, u_up, u_dn, v_c, v_up, v_dn, out_ref,
                  *, nx, tb, pad):
    """Euler-only pass: recompute R from (u, vel_new) and apply the gated
    update. Exists because the combined Euler+metrics kernel exceeds the
    remote Mosaic compiler's complexity budget at 16384 lanes (HTTP 500,
    r9 probe) — the Logger sums + jacobian min run as the separate
    ``logger_norms.fluid_metrics_pallas`` pass instead."""
    i = pl.program_id(0)
    u = jnp.concatenate([u_up[:, :, :], u_c[:, :, :], u_dn[:, :, :]], axis=1)
    vel = jnp.concatenate([v_up[:, :, :], v_c[:, :, :], v_dn[:, :, :]], axis=1)
    e = tb + 2 * pad
    ny = u.shape[-1]
    gi = lax.broadcasted_iota(jnp.int32, (e, ny), 0) + i * tb - pad
    gj = lax.broadcasted_iota(jnp.int32, (e, ny), 1)

    nxt = pltpu.roll(u, e - 1, 1)
    prv = pltpu.roll(u, 1, 1)
    dudx = jnp.where(gi[None] == 0, nxt - u,
                     jnp.where(gi[None] == nx - 1, u - prv,
                               (nxt - prv) * 0.5))
    nyt = pltpu.roll(u, ny - 1, 2)
    pvy = pltpu.roll(u, 1, 2)
    dudy = jnp.where(gj[None] == 0, nyt - u,
                     jnp.where(gj[None] == ny - 1, u - pvy,
                               (nyt - pvy) * 0.5))
    r = vel - dudx * vel[0:1] - dudy * vel[1:2]

    gate = gate_ref[0:1, 0:1]
    do_step = gate > 0.0
    u_new = jnp.where(do_step[None], u + r * gate[None], u)
    out_ref[:, :, :] = u_new[:, pad:pad + tb, :]


@functools.partial(jax.jit, static_argnames=("tb",))
def fluid_euler_pallas(u, vel_new, gate, tb: int | None = None):
    """``(u, vel_new, gate) -> u_new``: the stepped fluid iteration's
    Euler pass with R recomputed in registers (bit-equal to pass A's R —
    same expressions on the same stored values). ``gate`` is
    ``where(dt < timestep_skip, dt, 0)``."""
    _, nx, ny = u.shape
    pad = _PAD
    tb, vmem_limit = _pick_tb(nx, ny, tb)
    nblocks = nx // tb
    r_blk = tb // pad
    last = nx // pad - 1
    up = lambda i: jnp.maximum(i * r_blk - 1, 0)
    dn = lambda i: jnp.minimum((i + 1) * r_blk, last)
    # Full-lane gate tile: a narrower (8, 128) side input alongside
    # 16384-lane blocks crashed the remote Mosaic compile (r9 probe);
    # matching the lane extent compiles.
    gate_tile = jnp.full((8, ny), gate, jnp.float32)
    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((8, ny), lambda i: (0, 0)),
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, up(i), 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, dn(i), 0)),
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, up(i), 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, dn(i), 0)),
        ],
        out_specs=pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
    )
    kernel = functools.partial(_euler_kernel, nx=nx, tb=tb, pad=pad)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        compiler_params=compiler_params(vmem_limit),
        out_shape=jax.ShapeDtypeStruct((2, nx, ny), u.dtype),
    )(gate_tile, u, u, u, vel_new, vel_new, vel_new)
