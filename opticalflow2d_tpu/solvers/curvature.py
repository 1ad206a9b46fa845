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

from opticalflow2d_tpu.ops.dct import (
    dct2_fftw,
    idct2_fftw,
    dct2_fft,
    idct2_fft,
    curvature_eigenvalues,
)
from opticalflow2d_tpu.solvers.base import Derivatives, lssd_force


def make_curvature_step(nx: int, ny: int, alpha: float, tau: float,
                        dtype=jnp.float32, dct_impl: str = "auto"):
    """Build the curvature step for a fixed level shape (the eigenvalue
    matrix is a per-level constant, like the reference's per-level FFTW
    plans).

    ``dct_impl``:
    - "matmul" (= "auto"): MXU dense transform at HIGHEST precision —
      measured fastest AND bit-closest on TPU v5e (the complex-FFT path is
      emulated there and ~2x slower at 1024^2);
    - "matmul_fast": single-pass (bf16-input) MXU matmuls, ~1e-3 relative
      error, for throughput-first runs;
    - "fft": O(N log N) Makhoul factorization — wins only where FFTs are
      hardware-native or N is very large.
    """
    eig = curvature_eigenvalues(nx, ny, alpha, tau, dtype)
    scale = 1.0 / (4.0 * nx * ny)
    if dct_impl == "auto":
        dct_impl = "matmul"
    if dct_impl == "fft":
        fwd, inv = dct2_fft, idct2_fft
    elif dct_impl == "matmul_fast":
        from jax import lax

        fwd = lambda a: dct2_fftw(a, precision=lax.Precision.DEFAULT)
        inv = lambda a: idct2_fftw(a, precision=lax.Precision.DEFAULT)
    else:
        fwd, inv = dct2_fftw, idct2_fftw

    def step(u: jnp.ndarray, d: Derivatives) -> jnp.ndarray:
        f = lssd_force(d, u)
        rhs = u - tau * f
        spec = fwd(rhs) * eig[None]
        return inv(spec) * scale

    return step
