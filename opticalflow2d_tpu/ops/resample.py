"""Pyramid resampling: box-filter downsample, bilinear upsample, and the
motion-vector rescaling that accompanies them.

- Downsample: mean over ``factor x factor`` patches anchored at
  ``(i*factor_x, j*factor_y)`` with ``factor = dim_in // dim_out``
  (reference ``src/Field.tpp:76-143``; all patches are full for the pyramid
  dims the reference constructs, so this is an exact match).
- Upsample: origin-aligned bilinear interpolation with edge-weight
  renormalization (reference ``src/Field.tpp:146-206``).
- Motion variants scale each displacement component by the dimension ratio
  target/source (reference ``src/Motion.cpp:61-111``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from opticalflow2d_tpu.ops.warp import _bilinear_gather


def pyramid_dims(dim0: Tuple[int, int], nscales: int):
    """Per-scale dims ``dim0 / 2^s`` (float division then truncation), exactly
    as the reference constructs them (``src/ImageRegistration.cpp:54-61``)."""
    nx, ny = dim0
    return [(int(nx / (2.0 ** s)), int(ny / (2.0 ** s))) for s in range(nscales + 1)]


def downsample_image(image: jnp.ndarray, dimout: Tuple[int, int]) -> jnp.ndarray:
    """Box-filter downsample ``[..., nx, ny] -> [..., nx_out, ny_out]``."""
    nx_in, ny_in = image.shape[-2], image.shape[-1]
    nx_out, ny_out = dimout
    if nx_out > nx_in or ny_out > ny_in:
        raise ValueError("downsample target must not exceed source dims")
    fx = nx_in // nx_out
    fy = ny_in // ny_out
    cropped = image[..., : nx_out * fx, : ny_out * fy]
    shaped = cropped.reshape(*cropped.shape[:-2], nx_out, fx, ny_out, fy)
    return shaped.mean(axis=(-3, -1))


def upsample_image(image: jnp.ndarray, dimout: Tuple[int, int]) -> jnp.ndarray:
    """Origin-aligned bilinear upsample ``[C?, nx, ny] -> [C?, nx_out, ny_out]``.

    Sample point for output (i, j) is ``(i * nx_in / nx_out, j * ny_in / ny_out)``
    — note this is corner-anchored, not center-anchored, matching the
    reference (``src/Field.tpp:172-173``).
    """
    nx_in, ny_in = image.shape[-2], image.shape[-1]
    nx_out, ny_out = dimout
    if nx_out < nx_in or ny_out < ny_in:
        raise ValueError("upsample target must not be below source dims")
    dtype = image.dtype
    i = jnp.arange(nx_out, dtype=dtype)[:, None]
    j = jnp.arange(ny_out, dtype=dtype)[None, :]
    px = jnp.broadcast_to(i * (nx_in / nx_out), (nx_out, ny_out))
    py = jnp.broadcast_to(j * (ny_in / ny_out), (nx_out, ny_out))

    squeeze = image.ndim == 2
    data = image[None] if squeeze else image
    value, weight, _ = _bilinear_gather(data, px, py)
    out = value / jnp.where(weight != 0, weight, 1.0)
    return out[0] if squeeze else out


def _motion_ratio(u: jnp.ndarray, dimout: Tuple[int, int]) -> jnp.ndarray:
    nx_in, ny_in = u.shape[-2], u.shape[-1]
    nx_out, ny_out = dimout
    ratio = jnp.array(
        [nx_out / nx_in, ny_out / ny_in], dtype=u.dtype
    ).reshape((2,) + (1,) * (u.ndim - 1))
    return ratio


def downsample_motion(u: jnp.ndarray, dimout: Tuple[int, int]) -> jnp.ndarray:
    """Box downsample a motion field and rescale the displacement components
    by the dim ratio (reference ``src/Motion.cpp:87-111``)."""
    ratio = _motion_ratio(u, dimout)
    return downsample_image(u, dimout) * ratio


def upsample_motion(u: jnp.ndarray, dimout: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear upsample a motion field and rescale the displacement
    components by the dim ratio (reference ``src/Motion.cpp:61-85``)."""
    ratio = _motion_ratio(u, dimout)
    return upsample_image(u, dimout) * ratio
