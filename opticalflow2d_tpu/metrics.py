"""Registration quality metrics (the BASELINE.json evaluation vocabulary:
warped-image SSD and endpoint error)."""

from __future__ import annotations

import jax.numpy as jnp

from opticalflow2d_tpu.ops.warp import warp2d
from opticalflow2d_tpu.ops.reduce import ssd


def endpoint_error(u_a: jnp.ndarray, u_b: jnp.ndarray) -> jnp.ndarray:
    """Mean Euclidean distance between two motion fields ``[2, nx, ny]``."""
    d = u_a - u_b
    return jnp.mean(jnp.sqrt(d[..., 0, :, :] ** 2 + d[..., 1, :, :] ** 2), axis=(-2, -1))


def warped_ssd(iref: jnp.ndarray, imov: jnp.ndarray, u: jnp.ndarray,
               halo: int = 0) -> jnp.ndarray:
    """SSD between the reference image and the motion-warped moving image."""
    return ssd(iref, warp2d(imov, u, halo))


def ssd_reduction(iref: jnp.ndarray, imov: jnp.ndarray, u: jnp.ndarray,
                  halo: int = 0) -> jnp.ndarray:
    """Fractional SSD reduction achieved by the registration (1 = perfect)."""
    before = ssd(iref, imov)
    after = warped_ssd(iref, imov, u, halo)
    return 1.0 - after / jnp.maximum(before, jnp.finfo(iref.dtype).tiny)
