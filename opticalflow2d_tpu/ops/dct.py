"""Matmul-based 2D DCT-II/DCT-III in FFTW's r2r conventions, plus the
curvature-operator eigenvalues.

The reference runs FFTW REDFT10 (forward) / REDFT01 (inverse) plans per
component and divides by ``4 * N`` afterwards (``src/regularization/
OpticalFlow/OpticalFlowCurvature.cpp:52-55, 99-167``). On TPU the transform is
expressed as two dense matmuls ``C2x @ A @ C2y^T`` — the MXU-native form: for
the image sizes this library targets the transform matrices stay resident in
VMEM/HBM and the matmuls run at MXU speed, replacing FFTW's CPU butterflies.

FFTW conventions implemented (unnormalized, matching fftw3 docs):
- REDFT10: ``Y[k] = 2 * sum_n X[n] cos(pi (n+1/2) k / N)``
- REDFT01: ``Y[k] = X[0] + 2 * sum_{n>=1} X[n] cos(pi n (k+1/2) / N)``
so REDFT01(REDFT10(x)) = 2N * x per axis, and the reference's ``/(4*size)``
normalization is applied by the caller (curvature solver).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=64)
def _dct2_matrix(n: int) -> np.ndarray:
    """REDFT10 (DCT-II) matrix, float64 then cast at use site."""
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    return 2.0 * np.cos(np.pi * (j + 0.5) * k / n)


@functools.lru_cache(maxsize=64)
def _dct3_matrix(n: int) -> np.ndarray:
    """REDFT01 (DCT-III) matrix."""
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    m = 2.0 * np.cos(np.pi * j * (k + 0.5) / n)
    m[:, 0] = 1.0
    return m


def _mm(a, b):
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


def dct2_fftw(a: jnp.ndarray) -> jnp.ndarray:
    """2D DCT-II (FFTW REDFT10 x REDFT10) over the trailing two axes."""
    nx, ny = a.shape[-2], a.shape[-1]
    cx = jnp.asarray(_dct2_matrix(nx), a.dtype)
    cy = jnp.asarray(_dct2_matrix(ny), a.dtype)
    return _mm(_mm(cx, a), cy.T)


def idct2_fftw(a: jnp.ndarray) -> jnp.ndarray:
    """2D DCT-III (FFTW REDFT01 x REDFT01) over the trailing two axes.
    ``idct2_fftw(dct2_fftw(x)) == 4 * nx * ny * x``."""
    nx, ny = a.shape[-2], a.shape[-1]
    cx = jnp.asarray(_dct3_matrix(nx), a.dtype)
    cy = jnp.asarray(_dct3_matrix(ny), a.dtype)
    return _mm(_mm(cx, a), cy.T)


def curvature_eigenvalues(
    nx: int, ny: int, alpha: float, tau: float, dtype=jnp.float32
) -> jnp.ndarray:
    """Inverse eigenvalues of the semi-implicit biharmonic (curvature) update
    in the DCT basis:
    ``1 / (1 + tau * alpha * (-4 + 2 cos(p pi / nx) + 2 cos(q pi / ny))^2)``
    (reference ``OpticalFlowCurvature.cpp:6-30``; note the reference's PI
    constant is 3.14159265, reproduced here for bit-level parity)."""
    PI = 3.14159265
    p = np.arange(nx, dtype=np.float64)[:, None]
    q = np.arange(ny, dtype=np.float64)[None, :]
    lam = -4.0 + 2.0 * np.cos(p * PI / nx) + 2.0 * np.cos(q * PI / ny)
    eig = 1.0 / (1.0 + tau * alpha * lam**2)
    return jnp.asarray(eig, dtype)
