"""Logger norm pair as a Pallas kernel.

``logger_norms_pallas(u_new, u_prev) -> [2]`` computes
``[sum |u_new - u_prev|, sum |u_prev|]`` (per-pixel magnitudes, the
reference Logger's quantities — ``src/Logger.cpp:30-60`` tracks their
ratio) with the per-pixel sqrt INSIDE Mosaic and only a sqrt-free lane
reduction left to XLA.

Exists for huge grids: at 16384^2 any XLA program that evaluates a
per-pixel-sqrt norm reduction inside a while_loop crashes the remote
TPU compile helper (r8 probe_16384_i/j — fenced or not; sum-of-squares
compiles, so it is specifically the sqrt+reduce fusion). Mosaic handles
the same sqrt fine — the temporal-blocked kernels have computed these
exact sums in-kernel since round 3. This standalone kernel gives the
NON-blocked solver families (curvature; fluid's Logger term) the same
escape hatch: ``engine.registration._rel_step_error`` dispatches here
past 8192 lanes when the config runs Pallas.

Accumulation order differs from ``ops.reduce.motion_norm``'s XLA
reduction tree (row-block partials, then one XLA sum), so values can
differ by float-associativity ulps — the dispatch is extent-gated
(> 8192) where no parity oracle exists; at or below 8192 the jnp norm
is used unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from opticalflow2d_tpu.pallas_kernels import MB, compiler_params


def _norm_kernel(new_ref, prev_ref, diff_ref, prev_out_ref):
    # Outputs are [1, 8, ny] blocks (Mosaic requires the last two block
    # dims divisible by (8, 128) or full-extent); the row sums land in
    # sublane 0, zeros elsewhere, and the caller just sums everything.
    un = new_ref[...]
    up = prev_ref[...]
    d = un - up
    row = jax.lax.broadcasted_iota(jnp.int32, (8, un.shape[2]), 0)
    dsum = jnp.sum(jnp.sqrt(d[0] ** 2 + d[1] ** 2), axis=0, keepdims=True)
    psum = jnp.sum(jnp.sqrt(up[0] ** 2 + up[1] ** 2), axis=0, keepdims=True)
    diff_ref[0, :, :] = jnp.where(row == 0, dsum, 0.0)
    prev_out_ref[0, :, :] = jnp.where(row == 0, psum, 0.0)


def logger_norms_feasible(nx: int, ny: int) -> bool:
    """The kernel tiles rows in multiples of 8 (Mosaic sublane alignment)
    and covers nx exactly — a non-multiple-of-8 nx has no valid tiling, so
    callers must use the jnp norm there (silently dropping the trailing
    rows would corrupt the convergence gate)."""
    return nx % 8 == 0 and nx >= 8


def _pick_tb(nx: int, ny: int) -> int:
    """Largest multiple-of-8 row tile dividing nx with the four resident
    [2, tb, ny] operand tiles within a comfortable VMEM budget
    (tb * ny <= 512k lanes ~= 8 MB per two-channel pair). Requires
    ``logger_norms_feasible(nx, ny)``."""
    if not logger_norms_feasible(nx, ny):
        raise ValueError(
            f"logger_norms_pallas needs nx % 8 == 0, got nx={nx}; gate on "
            "logger_norms_feasible and use ops.reduce.motion_norm instead"
        )
    cap = max(8, (512 * 1024 // max(ny, 1)) // 8 * 8)
    for cand in range(min(cap, nx) // 8 * 8, 7, -8):
        if nx % cand == 0:
            return cand
    return 8


def _metrics_kernel(new_c, new_up, new_dn, prev_ref, diff_ref, prev_out_ref,
                    jac_ref, *, tb: int, nx: int, ny: int):
    """Logger norm pair over the center tile + Jacobian-determinant row
    minima over the extended tile's interior. The jac stencil reproduces
    ops.grid.partial_x/partial_y + jacobian_det expression-for-expression
    (central differences, one-sided at the global borders), evaluated on
    rolls with global-row masks; the minimum matches the jnp chain to ~1
    ulp (FMA contraction of the det — see fluid_metrics_pallas)."""
    i = pl.program_id(0)
    un = jnp.concatenate([new_up[:, :, :], new_c[:, :, :], new_dn[:, :, :]],
                         axis=1)  # [2, tb+16, ny]
    rows = tb + 16
    gi = jax.lax.broadcasted_iota(jnp.int32, (rows, ny), 0) + i * tb - 8
    gj = jax.lax.broadcasted_iota(jnp.int32, (rows, ny), 1)

    from jax.experimental.pallas import tpu as pltpu

    def ddx(f):
        nxt = pltpu.roll(f, rows - 1, 0)
        prv = pltpu.roll(f, 1, 0)
        return jnp.where(gi == 0, nxt - f,
                         jnp.where(gi == nx - 1, f - prv,
                                   (nxt - prv) * 0.5))

    def ddy(f):
        nxt = pltpu.roll(f, ny - 1, 1)
        prv = pltpu.roll(f, 1, 1)
        return jnp.where(gj == 0, nxt - f,
                         jnp.where(gj == ny - 1, f - prv,
                                   (nxt - prv) * 0.5))

    jac = ((1.0 + ddx(un[0])) * (1.0 + ddy(un[1]))
           - ddx(un[1]) * ddy(un[0]))
    jac_int = jac[8:8 + tb, :]
    # Clamp-duplicated rows past the global extent would pollute the min:
    # mask them to +inf before reducing.
    gi_int = gi[8:8 + tb, 0:1]
    valid = (gi_int >= 0) & (gi_int <= nx - 1)
    jac_int = jnp.where(valid, jac_int, jnp.inf)
    jmin = jnp.min(jac_int, axis=0, keepdims=True)

    row = jax.lax.broadcasted_iota(jnp.int32, (8, ny), 0)
    un_i = un[:, 8:8 + tb, :]
    up = prev_ref[...]
    d = un_i - up
    dsum = jnp.sum(jnp.sqrt(d[0] ** 2 + d[1] ** 2), axis=0, keepdims=True)
    psum = jnp.sum(jnp.sqrt(up[0] ** 2 + up[1] ** 2), axis=0, keepdims=True)
    diff_ref[0, :, :] = jnp.where(row == 0, dsum, 0.0)
    prev_out_ref[0, :, :] = jnp.where(row == 0, psum, 0.0)
    jac_ref[0, :, :] = jnp.broadcast_to(jmin, (8, ny))


@functools.partial(jax.jit, static_argnames=())
def fluid_metrics_pallas(u_new: jnp.ndarray, u_prev: jnp.ndarray):
    """``(u_new, u_prev) [2, nx, ny] -> (sums [2], jac_min scalar)``: the
    Logger norm pair AND ``min(jacobian_det(u_new))`` in one Mosaic pass.

    Exists for the huge-grid host-stepped fluid driver: the jnp
    ``jacobian_det`` materializes four full gradient planes (~5 GB at
    16384^2) on top of the level's persistent state — the difference
    between fitting a 16 GB chip and OOM (r9_results.jsonl). Values match
    the jnp chain: the sums bit-equal ``logger_norms_pallas`` (same
    row-partial scheme) and the jac minimum equals
    ``jnp.min(jacobian_det(u_new))`` to ~1 ulp (identical stencil
    expressions and an association-exact min, but the det's a*b - c*d
    FMA-contracts differently between programs — test-pinned at 2e-6
    rel, far below the 0.5 regrid threshold's sensitivity). Requires
    ``logger_norms_feasible``."""
    _, nx, ny = u_new.shape
    tb = _pick_tb(nx, ny)
    nblocks = nx // tb
    r = tb // 8
    last = nx // 8 - 1
    up = lambda i: jnp.maximum(i * r - 1, 0)
    dn = lambda i: jnp.minimum((i + 1) * r, last)
    kernel = functools.partial(_metrics_kernel, tb=tb, nx=nx, ny=ny)
    diff_p, prev_p, jac_p = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((2, 8, ny), lambda i: (0, up(i), 0)),
            pl.BlockSpec((2, 8, ny), lambda i: (0, dn(i), 0)),
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, ny), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, ny), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, ny), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, 8, ny), u_new.dtype),
            jax.ShapeDtypeStruct((nblocks, 8, ny), u_new.dtype),
            jax.ShapeDtypeStruct((nblocks, 8, ny), u_new.dtype),
        ],
        compiler_params=compiler_params(64 * MB),
    )(u_new, u_new, u_new, u_prev)
    sums = jnp.stack([jnp.sum(diff_p), jnp.sum(prev_p)])
    return sums, jnp.min(jac_p)


@functools.partial(jax.jit, static_argnames=())
def logger_norms_pallas(u_new: jnp.ndarray, u_prev: jnp.ndarray) -> jnp.ndarray:
    """``u_new, u_prev [2, nx, ny] -> [2]`` Logger sums (see module doc)."""
    _, nx, ny = u_new.shape
    tb = _pick_tb(nx, ny)
    nblocks = nx // tb
    diff_p, prev_p = pl.pallas_call(
        _norm_kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, ny), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, ny), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, 8, ny), u_new.dtype),
            jax.ShapeDtypeStruct((nblocks, 8, ny), u_new.dtype),
        ],
        compiler_params=compiler_params(64 * MB),
    )(u_new, u_prev)
    return jnp.stack([jnp.sum(diff_p), jnp.sum(prev_p)])
