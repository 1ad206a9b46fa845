"""Plain-NumPy loop implementations of the reference semantics, used as unit
oracles for the vectorized JAX ops. These are independent transcriptions of
the behaviors documented in SURVEY.md (with file:line citations), written
against the spec — they deliberately use naive loops so they're easy to audit.

Conventions: images ``[nx, ny]`` float64, motion ``[2, nx, ny]``.
"""

import numpy as np


def partial_x(f):
    nx, ny = f.shape
    out = np.zeros_like(f)
    for i in range(nx):
        for j in range(ny):
            if i == 0:
                out[i, j] = f[i + 1, j] - f[i, j]
            elif i == nx - 1:
                out[i, j] = f[i, j] - f[i - 1, j]
            else:
                out[i, j] = (f[i + 1, j] - f[i - 1, j]) / 2.0
    return out


def partial_y(f):
    return partial_x(f.T).T


def partial_xx(f):
    nx, ny = f.shape
    out = np.zeros_like(f)
    for i in range(nx):
        for j in range(ny):
            if i == 0:
                out[i, j] = 2 * f[0, j] - 5 * f[1, j] + 4 * f[2, j] - f[3, j]
            elif i == nx - 1:
                out[i, j] = -f[i - 3, j] + 4 * f[i - 2, j] - 5 * f[i - 1, j] + 2 * f[i, j]
            else:
                out[i, j] = f[i + 1, j] - 2 * f[i, j] + f[i - 1, j]
    return out


def partial_yy(f):
    return partial_xx(f.T).T


def partial_xy(f):
    nx, ny = f.shape
    out = np.zeros_like(f)
    for i in range(1, nx - 1):
        for j in range(1, ny - 1):
            out[i, j] = (
                f[i + 1, j + 1] - f[i + 1, j - 1] - f[i - 1, j + 1] + f[i - 1, j - 1]
            ) / 4.0
    return out


def qlaplacian(f):
    nx, ny = f.shape
    out = np.zeros_like(f)
    for i in range(1, nx - 1):
        for j in range(1, ny - 1):
            out[i, j] = (f[i - 1, j] + f[i + 1, j] + f[i, j - 1] + f[i, j + 1]) / 4.0
    return out


def warp2d(image, u):
    """Backward bilinear warp with OOB passthrough and edge renormalization
    (spec: src/Image.cpp:119-182)."""
    nx, ny = image.shape
    out = image.copy()
    for i in range(nx):
        for j in range(ny):
            px = i + u[0, i, j]
            py = j + u[1, i, j]
            dx = int(np.floor(px))
            dy = int(np.floor(py))
            fx = px - dx
            fy = py - dy
            if dx < 0 or dx >= nx or dy < 0 or dy >= ny:
                continue
            val = image[dx, dy] * (1 - fx) * (1 - fy)
            w = (1 - fx) * (1 - fy)
            if dx < nx - 1:
                val += image[dx + 1, dy] * fx * (1 - fy)
                w += fx * (1 - fy)
            if dy < ny - 1:
                val += image[dx, dy + 1] * (1 - fx) * fy
                w += (1 - fx) * fy
            if dx < nx - 1 and dy < ny - 1:
                val += image[dx + 1, dy + 1] * fx * fy
                w += fx * fy
            if w != 0:
                out[i, j] = val / w
    return out


def compose(u_total, u_inc):
    """Motion composition (spec: src/Motion.cpp:113-178)."""
    nx, ny = u_total.shape[1:]
    out = u_total.copy()
    for i in range(nx):
        for j in range(ny):
            px = i + u_inc[0, i, j]
            py = j + u_inc[1, i, j]
            dx = int(np.floor(px))
            dy = int(np.floor(py))
            fx = px - dx
            fy = py - dy
            if dx < 0 or dx >= nx or dy < 0 or dy >= ny:
                continue  # keeps old accumulated value
            out[:, i, j] = u_inc[:, i, j]
            val = u_total[:, dx, dy] * (1 - fx) * (1 - fy)
            w = (1 - fx) * (1 - fy)
            if dx < nx - 1:
                val = val + u_total[:, dx + 1, dy] * fx * (1 - fy)
                w += fx * (1 - fy)
            if dy < ny - 1:
                val = val + u_total[:, dx, dy + 1] * (1 - fx) * fy
                w += (1 - fx) * fy
            if dx < nx - 1 and dy < ny - 1:
                val = val + u_total[:, dx + 1, dy + 1] * fx * fy
                w += fx * fy
            if w != 0:
                out[:, i, j] = out[:, i, j] + val / w
    return out


def downsample(f, dimout):
    """Box-filter downsample (spec: src/Field.tpp:76-143)."""
    nx_in, ny_in = f.shape
    nx_out, ny_out = dimout
    fx = nx_in // nx_out
    fy = ny_in // ny_out
    out = np.zeros((nx_out, ny_out), f.dtype)
    for i in range(nx_out):
        for j in range(ny_out):
            patch = f[i * fx : i * fx + fx, j * fy : j * fy + fy]
            out[i, j] = patch.mean()
    return out


def upsample(f, dimout):
    """Origin-aligned bilinear upsample (spec: src/Field.tpp:146-206)."""
    nx_in, ny_in = f.shape
    nx_out, ny_out = dimout
    out = np.zeros((nx_out, ny_out), f.dtype)
    for i in range(nx_out):
        for j in range(ny_out):
            px = i * nx_in / nx_out
            py = j * ny_in / ny_out
            dx = int(np.floor(px))
            dy = int(np.floor(py))
            fx = px - dx
            fy = py - dy
            val = f[dx, dy] * (1 - fx) * (1 - fy)
            w = (1 - fx) * (1 - fy)
            if dx < nx_in - 1:
                val += f[dx + 1, dy] * fx * (1 - fy)
                w += fx * (1 - fy)
            if dy < ny_in - 1:
                val += f[dx, dy + 1] * (1 - fx) * fy
                w += (1 - fx) * fy
            if dx < nx_in - 1 and dy < ny_in - 1:
                val += f[dx + 1, dy + 1] * fx * fy
                w += fx * fy
            if w != 0:
                out[i, j] = val / w
    return out


def gaussian_kernel_2d(sigma, width):
    c = (width - 1) // 2
    k = np.zeros((width, width))
    for i in range(width):
        for j in range(width):
            k[i, j] = np.exp(-((i - c) ** 2 + (j - c) ** 2) / (2 * sigma * sigma))
    return k / k.sum()


def convolve_clip(f, sigma, width):
    """Renormalized convolution with true clipping at all edges."""
    k = gaussian_kernel_2d(sigma, width)
    c = (width - 1) // 2
    nx, ny = f.shape
    out = np.zeros_like(f)
    for i in range(nx):
        for j in range(ny):
            val = 0.0
            w = 0.0
            for ii in range(-c, c + 1):
                for jj in range(-c, c + 1):
                    if 0 <= i + ii < nx and 0 <= j + jj < ny:
                        val += f[i + ii, j + jj] * k[ii + c, jj + c]
                        w += k[ii + c, jj + c]
            out[i, j] = val / w
    return out


def convolve_flatwrap(f, sigma, width):
    """Renormalized convolution with the reference's flat-index bounds check:
    x-edge taps wrap across row boundaries (spec: src/Field.tpp:242-258;
    flat layout is x-fastest: flat[i + j*nx])."""
    k = gaussian_kernel_2d(sigma, width)
    c = (width - 1) // 2
    nx, ny = f.shape
    flat = f.T.reshape(-1)  # x-fastest
    size = nx * ny
    out = np.zeros(size)
    for j in range(ny):
        for i in range(nx):
            idx = i + j * nx
            val = 0.0
            w = 0.0
            for ii in range(-c, c + 1):
                for jj in range(-c, c + 1):
                    o = ii + jj * nx
                    if 0 <= idx + o < size:
                        val += flat[idx + o] * k[ii + c, jj + c]
                        w += k[ii + c, jj + c]
            out[idx] = val / w
    return out.reshape(ny, nx).T


def jacobian_det(u):
    dudx = np.stack([partial_x(u[0]), partial_x(u[1])])
    dudy = np.stack([partial_y(u[0]), partial_y(u[1])])
    return (1.0 + dudx[0]) * (1.0 + dudy[1]) - dudx[1] * dudy[0]


def sor_sweep_lexicographic(x, b, mu, lam, omega, reference_stencil=True):
    """One in-place lexicographic SOR sweep (spec:
    src/regularization/OpticalFlow/OpticalFlowElastic.cpp:21-55). Loop order
    is i (x) outer, j (y) inner, matching the reference."""
    nx, ny = x.shape[1:]
    x = x.copy()
    inv = omega / (-6 * mu - 2 * lam)
    for i in range(1, nx - 1):
        for j in range(1, ny - 1):
            for c in range(2):
                o = 1 - c
                lap4 = (
                    x[c, i + 1, j] + x[c, i - 1, j] + x[c, i, j + 1] + x[c, i, j - 1]
                )
                cross = 0.25 * (
                    x[o, i + 1, j + 1]
                    - x[o, i - 1, j + 1]
                    - x[o, i + 1, j - 1]
                    + x[o, i - 1, j - 1]
                )
                if c == 0 or reference_stencil:
                    second = x[c, i + 1, j] + x[c, i - 1, j]
                else:
                    second = x[c, i, j + 1] + x[c, i, j - 1]
                num = b[c, i, j] - mu * lap4 - (mu + lam) * (second + cross)
                x[c, i, j] = (1 - omega) * x[c, i, j] + inv * num
    return x


def dct2_fftw(a):
    """REDFT10 along both axes (unnormalized FFTW convention)."""
    nx, ny = a.shape
    kx = np.arange(nx)[:, None]
    n = np.arange(nx)[None, :]
    cx = 2.0 * np.cos(np.pi * (n + 0.5) * kx / nx)
    ky = np.arange(ny)[:, None]
    m = np.arange(ny)[None, :]
    cy = 2.0 * np.cos(np.pi * (m + 0.5) * ky / ny)
    return cx @ a @ cy.T


def idct2_fftw(a):
    """REDFT01 along both axes."""
    nx, ny = a.shape
    kx = np.arange(nx)[:, None]
    n = np.arange(nx)[None, :]
    cx = 2.0 * np.cos(np.pi * n * (kx + 0.5) / nx)
    cx[:, 0] = 1.0
    ky = np.arange(ny)[:, None]
    m = np.arange(ny)[None, :]
    cy = 2.0 * np.cos(np.pi * m * (ky + 0.5) / ny)
    cy[:, 0] = 1.0
    return cx @ a @ cy.T
