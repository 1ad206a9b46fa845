"""Reductions and pointwise normalizations over fields."""

from __future__ import annotations

import jax.numpy as jnp


def motion_norm(u: jnp.ndarray) -> jnp.ndarray:
    """Mean per-pixel magnitude: ``mean_i sqrt(ux_i^2 + uy_i^2)``
    (reference ``src/Motion.cpp:42-49``)."""
    mag = jnp.sqrt(u[..., 0, :, :] ** 2 + u[..., 1, :, :] ** 2)
    return jnp.mean(mag, axis=(-2, -1))


def motion_maxabs(u: jnp.ndarray, bug: bool = False) -> jnp.ndarray:
    """Maximum per-pixel magnitude.

    ``bug=True`` reproduces the reference defect that sums the y component
    twice (``src/Motion.cpp:51-58``): ``sqrt(max(uy^2 + uy^2))``. The fixed
    behavior is ``sqrt(max(ux^2 + uy^2))``.
    """
    if bug:
        normsq = u[..., 1, :, :] ** 2 + u[..., 1, :, :] ** 2
    else:
        normsq = u[..., 0, :, :] ** 2 + u[..., 1, :, :] ** 2
    return jnp.sqrt(jnp.max(normsq, axis=(-2, -1)))


def normalize_minmax(image: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize to [0, 1] (reference ``src/Image.cpp:107-116``).

    Note the reference's ``Image::max()`` initializes to 0 and so returns 0
    for all-negative images (SURVEY.md §2.3.9); we use the true max — for the
    normalized inputs the pipeline feeds this is identical.
    """
    lo = jnp.min(image, axis=(-2, -1), keepdims=True)
    hi = jnp.max(image, axis=(-2, -1), keepdims=True)
    return (image - lo) / (hi - lo)


def ssd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared differences — the implicit data term the solvers
    minimize; used for benchmarks/diagnostics."""
    d = a - b
    return jnp.sum(d * d, axis=(-2, -1))
