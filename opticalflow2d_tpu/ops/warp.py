"""Backward bilinear warping, motion composition, and the exponential map.

Matches the reference semantics precisely, including the edge-weight
renormalization and the out-of-bounds passthrough:
- ``warp2d``: reference ``src/Image.cpp:119-182``
- ``compose`` (= ``Motion::accumulate``): reference ``src/Motion.cpp:113-178``
- ``expmap`` (scaling-and-squaring): reference ``src/Motion.cpp:253-277``
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opticalflow2d_tpu.ops.reduce import motion_maxabs


def _gather_taps_exact(data, dx, dy):
    """The four bilinear taps via flat-index XLA take (exact for any
    displacement). TPU has no hardware gather; 1D flat takes measure ~30%
    faster than 2D advanced indexing there."""
    nx, ny = data.shape[-2], data.shape[-1]
    dxc = jnp.clip(dx, 0, nx - 1)
    dyc = jnp.clip(dy, 0, ny - 1)
    dxc1 = jnp.clip(dx + 1, 0, nx - 1)
    dyc1 = jnp.clip(dy + 1, 0, ny - 1)
    flat = data.reshape(*data.shape[:-2], nx * ny)
    out_shape = dx.shape  # may differ from data's grid (e.g. upsampling)

    def take(ix, iy):
        out = jnp.take(flat, (ix * ny + iy).reshape(-1), axis=-1, mode="clip")
        return out.reshape(*data.shape[:-2], *out_shape)

    return (
        take(dxc, dyc),
        take(dxc1, dyc),
        take(dxc, dyc1),
        take(dxc1, dyc1),
    )


def _gather_taps_rolls(data, dx, dy, halo: int):
    """The four bilinear taps via masked circular shifts — the TPU-native
    gather for displacement-bounded warps (pure VPU shift-and-select, no
    gather op). Valid when ``floor(px) - i`` lies in ``[-halo, halo]`` for
    every pixel; callers guard with a runtime bound check (``lax.cond``).

    Taps whose weights are masked to zero (edge/out-of-bounds handling in
    the caller) may read wrapped garbage harmlessly.
    """
    nx, ny = data.shape[-2], data.shape[-1]
    gi = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 1)
    rx = dx - gi
    ry = dy - gj

    # Share the (expensive) lane-dim rolls across all sublane offsets:
    # (2H+2) lane rolls + (2H+2)^2 cheap sublane rolls instead of
    # (2H+2)^2 full 2D rolls.
    lane_rolls = {
        b: jnp.roll(data, -b, axis=-1) for b in range(-halo, halo + 2)
    }
    rolls = {}

    def rolled(a, b):
        if (a, b) not in rolls:
            rolls[(a, b)] = jnp.roll(lane_rolls[b], -a, axis=-2)
        return rolls[(a, b)]

    g00 = jnp.zeros_like(data)
    g10 = jnp.zeros_like(data)
    g01 = jnp.zeros_like(data)
    g11 = jnp.zeros_like(data)
    for ox in range(-halo, halo + 1):
        mx = rx == ox
        for oy in range(-halo, halo + 1):
            m = mx & (ry == oy)  # broadcasts over any leading component axes
            g00 = jnp.where(m, rolled(ox, oy), g00)
            g10 = jnp.where(m, rolled(ox + 1, oy), g10)
            g01 = jnp.where(m, rolled(ox, oy + 1), g01)
            g11 = jnp.where(m, rolled(ox + 1, oy + 1), g11)
    return g00, g10, g01, g11


def _bilinear_from_taps(data, px, py, taps_fn):
    """Shared core of warp2d/compose: weights, edge renormalization, and the
    out-of-bounds floor-cell check, with the tap fetch pluggable.

    Tap inclusion mirrors the reference: the (dx+1, *) taps are only added
    when ``dx < nx-1``, etc., and the result is renormalized by the summed
    weight of included taps (reference ``src/Image.cpp:155-173``).
    """
    nx, ny = data.shape[-2], data.shape[-1]

    dxf = jnp.floor(px)
    dyf = jnp.floor(py)
    fx = px - dxf
    fy = py - dyf
    dx = dxf.astype(jnp.int32)
    dy = dyf.astype(jnp.int32)

    in_bounds = (dx >= 0) & (dx < nx) & (dy >= 0) & (dy < ny)

    has_x1 = dx < nx - 1
    has_y1 = dy < ny - 1

    w00 = (1.0 - fx) * (1.0 - fy)
    w10 = jnp.where(has_x1, fx * (1.0 - fy), 0.0)
    w01 = jnp.where(has_y1, (1.0 - fx) * fy, 0.0)
    w11 = jnp.where(has_x1 & has_y1, fx * fy, 0.0)

    g00, g10, g01, g11 = taps_fn(data, dx, dy)
    value = g00 * w00 + g10 * w10 + g01 * w01 + g11 * w11
    weight = w00 + w10 + w01 + w11
    return value, weight, in_bounds


def _displacement_bounded(data, px, py, halo: int):
    """Runtime predicate: every in-bounds sample's floor offset within
    ``halo`` (out-of-bounds pixels take the passthrough path and are
    ignored)."""
    nx, ny = data.shape[-2], data.shape[-1]
    gi = jax.lax.broadcasted_iota(px.dtype, (nx, ny), 0)
    gj = jax.lax.broadcasted_iota(px.dtype, (nx, ny), 1)
    dx = jnp.floor(px)
    dy = jnp.floor(py)
    in_b = (dx >= 0) & (dx < nx) & (dy >= 0) & (dy < ny)
    off_pix = jnp.maximum(jnp.abs(dx - gi), jnp.abs(dy - gj))
    return jnp.max(jnp.where(in_b, off_pix, 0.0)) <= halo


# Largest extent at which the jnp roll fast path is allowed to trace: at
# 8192 lanes the (2h+2)^2-copy roll chain's COMPILATION crashes the remote
# TPU Mosaic helper (HTTP 500; CLAUDE.md, r6/r7 probes), while 4096
# compiles and runs. Past this, halo>0 silently takes the exact gather —
# identical results; callers wanting speed there use the Pallas tier
# (use_pallas=True), which covers 8192.
_ROLL_PATH_MAX_EXTENT = 4096

# Past this extent the EXACT gather cannot live in the same program as a
# level driver: the remote compile helper dies (HTTP 500) on any
# 16384-lane program combining the gather lowering with a while_loop
# (r8 probe_16384_b — every per-level e2e crashed at halo 0 AND halo 4,
# while each component compiles alone). When a Pallas gather tier is
# feasible, warps past this extent therefore take the fast path
# UNCONDITIONALLY — no lax.cond, no exact-gather branch in the program.
# The drivers still compute the bound predicate into
# ``LevelTrace.fallbacks``, so a halo violation stays visible in the
# trace (the violating pixels degrade instead of falling back — the same
# contract the explicit-SP strip drivers always had).
_EXACT_FALLBACK_MAX_EXTENT = 8192


def _bilinear_gather(data, px, py, halo: int = 0):
    """Dispatch: exact gather (``halo=0``) or roll-based fast path guarded
    by a runtime displacement bound (``lax.cond`` falls back to the exact
    gather when any pixel's floor offset exceeds ``halo``)."""
    if halo > 0 and max(data.shape[-2], data.shape[-1]) > _ROLL_PATH_MAX_EXTENT:
        halo = 0  # roll chain untraceable at this extent (see above)
    if halo <= 0:
        return _bilinear_from_taps(data, px, py, _gather_taps_exact)

    def fast(_):
        return _bilinear_from_taps(
            data, px, py, lambda d, a, b: _gather_taps_rolls(d, a, b, halo)
        )

    def exact(_):
        return _bilinear_from_taps(data, px, py, _gather_taps_exact)

    return jax.lax.cond(
        _displacement_bounded(data, px, py, halo), fast, exact, None
    )


def _sample_coords(u: jnp.ndarray):
    nx, ny = u.shape[-2], u.shape[-1]
    gi = jax.lax.broadcasted_iota(u.dtype, (nx, ny), 0)
    gj = jax.lax.broadcasted_iota(u.dtype, (nx, ny), 1)
    px = gi + u[..., 0, :, :]
    py = gj + u[..., 1, :, :]
    return px, py


def warp2d(image: jnp.ndarray, u: jnp.ndarray, halo: int = 0,
           use_pallas: bool = False) -> jnp.ndarray:
    """Backward-warp ``image [nx, ny]`` by motion ``u [2, nx, ny]``:
    out(x) = I(x + u(x)) with bilinear interpolation.

    Out-of-bounds samples (floor corner outside the grid) keep the original
    image value; edge samples are renormalized by the summed in-bounds tap
    weight (reference ``src/Image.cpp:137-175``).

    ``halo > 0`` enables the TPU-native roll-based fast path for
    displacement-bounded fields (identical results; a runtime bound check
    falls back to the exact gather when ``max |floor offset| > halo``).
    ``use_pallas`` routes the fast path through the fused Pallas kernel
    (4-17x faster again on TPU; requires Mosaic — interpret mode on CPU).
    """
    px, py = _sample_coords(u)
    if halo > 0 and use_pallas:
        from opticalflow2d_tpu.pallas_kernels.warp_fused import (
            warp2d_pallas, gather_feasible)

        if gather_feasible(image.shape[1], halo):
            if max(image.shape) > _EXACT_FALLBACK_MAX_EXTENT:
                return warp2d_pallas(image, u, halo=halo)

            def fast(_):
                return warp2d_pallas(image, u, halo=halo)

            def exact(_):
                value, weight, in_bounds = _bilinear_from_taps(
                    image[None], px, py, _gather_taps_exact
                )
                ok = in_bounds & (weight != 0)
                safe_w = jnp.where(weight != 0, weight, 1.0)
                return jnp.where(ok, value[0] / safe_w, image)

            return jax.lax.cond(
                _displacement_bounded(image[None], px, py, halo), fast, exact,
                None
            )
        # No stable Pallas tile at this (lane extent, halo) — fall through
        # to the XLA roll path below (identical semantics).
    value, weight, in_bounds = _bilinear_gather(image[None], px, py, halo)
    value = value[0]
    ok = in_bounds & (weight != 0)
    safe_w = jnp.where(weight != 0, weight, 1.0)
    return jnp.where(ok, value / safe_w, image)


def compose(u_total: jnp.ndarray, u_inc: jnp.ndarray, halo: int = 0,
            use_pallas: bool = False) -> jnp.ndarray:
    """Motion composition ``u <- u_inc + u_total(x + u_inc)``.

    This is the reference's ``Motion::accumulate`` (``src/Motion.cpp:113-178``):
    the *accumulated* field is backward-warped by the increment and the
    increment is added. Out-of-bounds pixels keep the old accumulated value;
    pixels whose bilinear weight vanishes keep only the increment.
    ``halo``/``use_pallas``: see ``warp2d``.
    """
    px, py = _sample_coords(u_inc)
    if halo > 0 and use_pallas:
        from opticalflow2d_tpu.pallas_kernels.warp_fused import (
            compose_pallas, gather_feasible)

        if gather_feasible(u_total.shape[2], halo):
            if max(u_total.shape[1:]) > _EXACT_FALLBACK_MAX_EXTENT:
                return compose_pallas(u_total, u_inc, halo=halo)

            def fast(_):
                return compose_pallas(u_total, u_inc, halo=halo)

            def exact(_):
                value, weight, in_bounds = _bilinear_from_taps(
                    u_total, px, py, _gather_taps_exact
                )
                safe_w = jnp.where(weight != 0, weight, 1.0)
                warped = value / safe_w
                inc_plus = u_inc + jnp.where(weight != 0, warped, 0.0)
                return jnp.where(in_bounds[None], inc_plus, u_total)

            return jax.lax.cond(
                _displacement_bounded(u_total, px, py, halo), fast, exact,
                None
            )
        # No stable Pallas tile here — XLA roll path below.
    value, weight, in_bounds = _bilinear_gather(u_total, px, py, halo)
    safe_w = jnp.where(weight != 0, weight, 1.0)
    warped = value / safe_w
    # In bounds & weight != 0: u_inc + warped(u_total)
    # In bounds & weight == 0: u_inc alone (reference sets field=moin then
    #                          skips the += when weight == 0)
    # Out of bounds:           old u_total untouched
    inc_plus = u_inc + jnp.where(weight != 0, warped, 0.0)
    return jnp.where(in_bounds[None], inc_plus, u_total)


def static_expmap_nsq(maxabs_bound: float) -> int:
    """Squaring count for ``expmap(..., static_nsq=...)`` from a STATIC
    bound on ``maxabs(u)`` — the same formula the dynamic path evaluates
    at runtime, applied to the bound. For ``maxabs_bound <= 0.5`` this is
    0, and because the dynamic count is monotone in maxabs, the dynamic
    path would also pick 0 for every field within the bound — the static
    exp map is then BIT-IDENTICAL to the dynamic one (both are the
    identity, matching the reference's early return for nsquares == 0,
    ``src/Motion.cpp:257-260``). For larger bounds the static count is an
    upper bound on the dynamic one: the scaled field is smaller and the
    composition count fixed, so the result is a (slightly more accurate)
    approximation of the same flow exponential rather than a bit match.
    """
    import math

    if maxabs_bound <= 0:
        return 0
    return max(0, math.ceil(1.0 + math.log2(maxabs_bound)))


def expmap(u: jnp.ndarray, maxabs_bug: bool = False, halo: int = 0,
           use_pallas: bool = False,
           static_nsq: int | None = None) -> jnp.ndarray:
    """Exponential map of a velocity field by scaling and squaring
    (reference ``src/Motion.cpp:253-277``).

    ``nsq = max(0, ceil(1 + log2(maxabs(u))))``; u is scaled by ``2^-nsq``
    and self-composed ``nsq`` times. ``maxabs_bug=True`` reproduces the
    reference's ``Motion::maxabs`` defect (``src/Motion.cpp:54``, uses the y
    component twice), which changes the number of squarings.

    ``static_nsq``: fixed squaring count computed from a static bound on
    the field (``static_expmap_nsq``) instead of the runtime maxabs.
    Exists for >8192-lane programs, where the dynamic path's global
    reduce feeding a data-dependent ``fori_loop`` trip count inside the
    iteration loop is one of the remote-toolchain compile walls
    (RESULTS.md "16384^2 on one chip"). With ``static_nsq == 0`` the map
    is the identity, exactly as the dynamic path for any field with
    maxabs <= 0.5; ``maxabs_bug`` is irrelevant in that regime (both
    component maxima are under the threshold). The composes unroll as a
    Python loop — no fori_loop, no maxabs reduce in the program.
    """
    if static_nsq is not None:
        if static_nsq == 0:
            return u
        v = u * jnp.asarray(2.0 ** -static_nsq, u.dtype)
        for _ in range(static_nsq):
            v = compose(v, v, halo, use_pallas)
        return v
    m = motion_maxabs(u, bug=maxabs_bug)
    # log2(0) = -inf -> nsq clamps to 0 -> identity (matches the reference's
    # early return for nsquares == 0).
    nsq_f = jnp.ceil(1.0 + jnp.log2(jnp.maximum(m, jnp.finfo(u.dtype).tiny)))
    nsq = jnp.maximum(nsq_f, 0.0).astype(jnp.int32)
    nsq = jnp.where(m > 0, nsq, 0)

    scaled = u * jnp.exp2(-nsq.astype(u.dtype))

    def body(_, v):
        # The scaled field has maxabs < 1, and each squaring at most doubles
        # it back toward the original magnitude; a small halo covers every
        # squaring step except the last few of large fields, which the
        # runtime bound check in compose() routes to the exact path.
        return compose(v, v, halo, use_pallas)

    return jax.lax.fori_loop(0, nsq, body, scaled)
