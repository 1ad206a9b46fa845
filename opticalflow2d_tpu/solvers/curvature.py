"""Curvature (biharmonic) solver — semi-implicit time marching solved
spectrally in the DCT basis.

Per iteration (reference ``src/regularization/OpticalFlow/
OpticalFlowCurvature.cpp:144-167``):
  1. force ``f`` at the current motion,
  2. rhs = ``u - tau * f``,
  3. forward DCT-II per component,
  4. multiply by precomputed inverse eigenvalues of ``(I + tau*alpha*B^2)``,
  5. inverse DCT-III, normalize by ``4*nx*ny``.

The reference's row-major transposition dance (``:70-124``) disappears: the
matmul DCT acts directly on the array's trailing axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from opticalflow2d_tpu.ops.dct import dct2_fftw, idct2_fftw, curvature_eigenvalues
from opticalflow2d_tpu.solvers.base import Derivatives, lssd_force


def make_curvature_step(nx: int, ny: int, alpha: float, tau: float, dtype=jnp.float32):
    """Build the curvature step for a fixed level shape (the eigenvalue
    matrix is a per-level constant, like the reference's per-level FFTW
    plans)."""
    eig = curvature_eigenvalues(nx, ny, alpha, tau, dtype)
    scale = 1.0 / (4.0 * nx * ny)

    def step(u: jnp.ndarray, d: Derivatives) -> jnp.ndarray:
        f = lssd_force(d, u)
        rhs = u - tau * f
        spec = dct2_fftw(rhs) * eig[None]
        return idct2_fftw(spec) * scale

    return step
