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


def _bilinear_gather(data: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """Shared core of warp2d/compose.

    ``data`` is ``[C, nx, ny]`` (C components sampled at the same locations);
    ``px, py`` are absolute sample coordinates ``[nx, ny]``.

    Returns ``(value, weight, in_bounds)`` where ``value`` is the weighted sum
    of the in-bounds bilinear taps, ``weight`` the sum of their weights, and
    ``in_bounds`` the reference's floor-cell check ``0 <= dx < nx`` (a sample
    is "in bounds" iff the floor corner is inside the grid).

    Tap inclusion mirrors the reference: the (dx+1, *) taps are only added
    when ``dx < nx-1``, etc., and the result is renormalized by the summed
    weight of included taps (reference ``src/Image.cpp:155-173``).
    """
    nx, ny = data.shape[-2], data.shape[-1]

    dx = jnp.floor(px)
    dy = jnp.floor(py)
    fx = px - dx
    fy = py - dy
    dx = dx.astype(jnp.int32)
    dy = dy.astype(jnp.int32)

    in_bounds = (dx >= 0) & (dx < nx) & (dy >= 0) & (dy < ny)

    # Clip for safe gathering; masked taps contribute nothing.
    dxc = jnp.clip(dx, 0, nx - 1)
    dyc = jnp.clip(dy, 0, ny - 1)
    dxc1 = jnp.clip(dx + 1, 0, nx - 1)
    dyc1 = jnp.clip(dy + 1, 0, ny - 1)

    has_x1 = dx < nx - 1
    has_y1 = dy < ny - 1

    w00 = (1.0 - fx) * (1.0 - fy)
    w10 = jnp.where(has_x1, fx * (1.0 - fy), 0.0)
    w01 = jnp.where(has_y1, (1.0 - fx) * fy, 0.0)
    w11 = jnp.where(has_x1 & has_y1, fx * fy, 0.0)

    def gather(ix, iy):
        # data[..., ix, iy] with ix, iy int arrays of shape [nx, ny]
        return data[..., ix, iy]

    value = (
        gather(dxc, dyc) * w00
        + gather(dxc1, dyc) * w10
        + gather(dxc, dyc1) * w01
        + gather(dxc1, dyc1) * w11
    )
    weight = w00 + w10 + w01 + w11
    return value, weight, in_bounds


def _sample_coords(u: jnp.ndarray):
    nx, ny = u.shape[-2], u.shape[-1]
    gi = jax.lax.broadcasted_iota(u.dtype, (nx, ny), 0)
    gj = jax.lax.broadcasted_iota(u.dtype, (nx, ny), 1)
    px = gi + u[..., 0, :, :]
    py = gj + u[..., 1, :, :]
    return px, py


def warp2d(image: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``image [nx, ny]`` by motion ``u [2, nx, ny]``:
    out(x) = I(x + u(x)) with bilinear interpolation.

    Out-of-bounds samples (floor corner outside the grid) keep the original
    image value; edge samples are renormalized by the summed in-bounds tap
    weight (reference ``src/Image.cpp:137-175``).
    """
    px, py = _sample_coords(u)
    value, weight, in_bounds = _bilinear_gather(image[None], px, py)
    value = value[0]
    ok = in_bounds & (weight != 0)
    safe_w = jnp.where(weight != 0, weight, 1.0)
    return jnp.where(ok, value / safe_w, image)


def compose(u_total: jnp.ndarray, u_inc: jnp.ndarray) -> jnp.ndarray:
    """Motion composition ``u <- u_inc + u_total(x + u_inc)``.

    This is the reference's ``Motion::accumulate`` (``src/Motion.cpp:113-178``):
    the *accumulated* field is backward-warped by the increment and the
    increment is added. Out-of-bounds pixels keep the old accumulated value;
    pixels whose bilinear weight vanishes keep only the increment.
    """
    px, py = _sample_coords(u_inc)
    value, weight, in_bounds = _bilinear_gather(u_total, px, py)
    safe_w = jnp.where(weight != 0, weight, 1.0)
    warped = value / safe_w
    # In bounds & weight != 0: u_inc + warped(u_total)
    # In bounds & weight == 0: u_inc alone (reference sets field=moin then
    #                          skips the += when weight == 0)
    # Out of bounds:           old u_total untouched
    inc_plus = u_inc + jnp.where(weight != 0, warped, 0.0)
    return jnp.where(in_bounds[None], inc_plus, u_total)


def expmap(u: jnp.ndarray, maxabs_bug: bool = False) -> jnp.ndarray:
    """Exponential map of a velocity field by scaling and squaring
    (reference ``src/Motion.cpp:253-277``).

    ``nsq = max(0, ceil(1 + log2(maxabs(u))))``; u is scaled by ``2^-nsq``
    and self-composed ``nsq`` times. ``maxabs_bug=True`` reproduces the
    reference's ``Motion::maxabs`` defect (``src/Motion.cpp:54``, uses the y
    component twice), which changes the number of squarings.
    """
    m = motion_maxabs(u, bug=maxabs_bug)
    # log2(0) = -inf -> nsq clamps to 0 -> identity (matches the reference's
    # early return for nsquares == 0).
    nsq_f = jnp.ceil(1.0 + jnp.log2(jnp.maximum(m, jnp.finfo(u.dtype).tiny)))
    nsq = jnp.maximum(nsq_f, 0.0).astype(jnp.int32)
    nsq = jnp.where(m > 0, nsq, 0)

    scaled = u * jnp.exp2(-nsq.astype(u.dtype))

    def body(_, v):
        return compose(v, v)

    return jax.lax.fori_loop(0, nsq, body, scaled)
