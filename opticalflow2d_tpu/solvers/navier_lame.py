"""Spectral (FFT-based) Navier-Lame solver.

The reference relaxes the Navier-Lame system with one sequential SOR sweep
per iteration (``OpticalFlowElastic.cpp:21-55``, ``OpticalFlowFluid.cpp:
7-41``). This module solves the SAME finite-difference system *exactly* in
one shot per iteration via a real 2D FFT — the "FFT-based Navier-Lame
solve" upgrade named in BASELINE.json's north star (the reference's fluid
header even includes fftw3.h but never uses it, SURVEY.md §2.3.10).

Discretization solved (the symmetric/textbook stencil, i.e.
``CompatFlags.elastic_stencil_reference=False`` semantics), with periodic
boundary conditions:

  mu * Lap5(v_c) + (mu+lam) * (d2_c(v_c) + dxy(v_other)) = f_c

whose Fourier symbols are ``L = dxx + dyy``, ``dxx = 2cos(wx)-2``,
``dyy = 2cos(wy)-2`` (3-point second differences) and
``dxy = -sin(wx) sin(wy)`` (4-point mixed difference). Per frequency this
is a symmetric 2x2 system inverted analytically; the k=0 (mean) mode is
null and set to zero.

On TPU the whole solve is two rfft2/irfft2 pairs plus elementwise work —
O(N log N), massively faster to convergence than per-sweep SOR for stiff
parameters, at the cost of periodic (not reference) boundary behavior.
Select with ``RegConfig.navier_lame_solver="spectral"``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _inverse_coeffs(nx: int, ny: int, mu: float, lam: float):
    """NumPy [nx, ny//2+1] arrays (i00, i01, i11): the 2x2 inverse of the
    Navier-Lame symbol at each rfft2 frequency."""
    wx = 2.0 * np.pi * np.arange(nx) / nx
    wy = 2.0 * np.pi * np.arange(ny // 2 + 1) / ny
    cx = (2.0 * np.cos(wx) - 2.0)[:, None]
    cy = (2.0 * np.cos(wy) - 2.0)[None, :]
    sx = np.sin(wx)[:, None]
    sy = np.sin(wy)[None, :]

    lap = cx + cy
    a00 = mu * lap + (mu + lam) * cx          # x-equation diagonal
    a11 = mu * lap + (mu + lam) * cy          # y-equation diagonal
    a01 = -(mu + lam) * sx * sy               # mixed term (both equations)

    det = a00 * a11 - a01 * a01
    det_safe = np.where(np.abs(det) > 1e-30, det, 1.0)
    i00 = np.where(np.abs(det) > 1e-30, a11 / det_safe, 0.0)
    i11 = np.where(np.abs(det) > 1e-30, a00 / det_safe, 0.0)
    i01 = np.where(np.abs(det) > 1e-30, -a01 / det_safe, 0.0)
    return i00, i11, i01


def make_spectral_navier_lame_solver(nx: int, ny: int, mu: float, lam: float,
                                     dtype=jnp.float32):
    """Build ``solve(f [2, nx, ny]) -> v`` with
    ``mu*Lap(v) + (mu+lam)*grad(div(v)) = f`` (discrete, periodic BCs)."""
    i00_np, i11_np, i01_np = _inverse_coeffs(nx, ny, mu, lam)
    i00 = jnp.asarray(i00_np, jnp.float32)
    i11 = jnp.asarray(i11_np, jnp.float32)
    i01 = jnp.asarray(i01_np, jnp.float32)

    def solve(f: jnp.ndarray) -> jnp.ndarray:
        fhat = jnp.fft.rfft2(f.astype(jnp.float32))  # [2, nx, ny//2+1]
        vx = i00 * fhat[0] + i01 * fhat[1]
        vy = i01 * fhat[0] + i11 * fhat[1]
        v = jnp.fft.irfft2(jnp.stack([vx, vy]), s=(nx, ny))
        return v.astype(dtype)

    return solve
