"""Round-9 (driver round 5): temporal-blocked Thirion demons, k=2 —
MEASURED (VERDICT r4 task 7: "measure at 4096^2, don't project").

The k=2 kernel runs two full demons iterations per HBM pass: the chain
(warp -> grad -> force -> smooth_f -> compose -> smooth_d) applied twice
on one extended tile with a doubled halo pad (trapezoid argument — the
same structure diffusion_block uses). Iteration 0's diffusion smooth
runs at EVERY padded row (_smooth_tile_full), iteration 1 consumes only
rows the trapezoid keeps valid; interiors are bit-identical to two
sequential one-pass calls (checked on-chip below before timing).

Expected economics (r4 footprints): per-iteration VPU work grows by the
extra pad rows ((tb + 2*k*pad_1)/k vs tb + 2*pad_1 effective rows per
iteration), HBM traffic halves (~22% share at 4096^2). The kernel lives
HERE until the measurement justifies promoting it to the package
(keep-or-kill on data).

Run (real TPU, background): python benchmarks/r9_demons_k2.py
"""

import functools
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from opticalflow2d_tpu.pallas_kernels import MB, compiler_params
from opticalflow2d_tpu.pallas_kernels.demons_fused import (
    _bilinear_tile, _smooth_tile)
from opticalflow2d_tpu.pallas_kernels.demons_onepass import (
    _smooth_tile_full, required_pad, thirion_onepass_pallas)
from opticalflow2d_tpu.ops.conv import gaussian_kernel_1d

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r9_results.jsonl")


def _chain_to_composed(iaux, iref, u, gi, gj, gi_col, gj_row, *, halo,
                       halo_c, cf, taps_f, nx, ny, sigma_i, sigma_x):
    """Stages 1-5 of demons_onepass._onepass_body (same expressions)."""
    value, weight, in_b = _bilinear_tile(iaux[None], u[0], u[1], gi, gj,
                                         halo, nx)
    ok = in_b & (weight != 0)
    safe_w = jnp.where(weight != 0, weight, 1.0)
    iwar = jnp.where(ok, value[0] / safe_w, iaux)

    from jax.experimental.pallas import tpu as pltpu

    rows = iwar.shape[0]
    nxt_x = pltpu.roll(iwar, rows - 1, 0)
    prv_x = pltpu.roll(iwar, 1, 0)
    gx = jnp.where(gi == 0, nxt_x - iwar,
                   jnp.where(gi == nx - 1, iwar - prv_x,
                             (nxt_x - prv_x) * 0.5))
    nxt_y = pltpu.roll(iwar, ny - 1, 1)
    prv_y = pltpu.roll(iwar, 1, 1)
    gy = jnp.where(gj == 0, nxt_y - iwar,
                   jnp.where(gj == ny - 1, iwar - prv_y,
                             (nxt_y - prv_y) * 0.5))
    it = iwar - iref

    den = gx ** 2 + gy ** 2 + it ** 2 * (sigma_i * sigma_i) / (sigma_x * sigma_x)
    pos = den > 0
    safe_den = jnp.where(pos, den, 1.0)
    cx = jnp.where(pos, (gx * it * -1.0) / safe_den, 0.0)
    cy = jnp.where(pos, (gy * it * -1.0) / safe_den, 0.0)
    corr = jnp.stack([cx, cy])

    c_sm = _smooth_tile_full(corr, gi_col, gj_row, taps_f, cf,
                             iwar.shape[0], nx, ny)

    value, weight, in_b = _bilinear_tile(u, c_sm[0], c_sm[1], gi, gj,
                                         halo_c, nx, per_channel=True)
    safe_w = jnp.where(weight != 0, weight, 1.0)
    inc_plus = c_sm + jnp.where(weight != 0, value / safe_w, 0.0)
    return jnp.where(in_b, inc_plus, u)


def _k2_kernel(ia_c, ia_up, ia_dn, ir_c, ir_up, ir_dn, u_c, u_up, u_dn,
               out_ref, *, k, halo, halo_c, cf, taps_f, cd, taps_d, tb,
               pad, nx, ny, sigma_i, sigma_x):
    i = pl.program_id(0)
    iaux = jnp.concatenate([ia_up[:, :], ia_c[:, :], ia_dn[:, :]], axis=0)
    iref = jnp.concatenate([ir_up[:, :], ir_c[:, :], ir_dn[:, :]], axis=0)
    u = jnp.concatenate([u_up[:, :, :], u_c[:, :, :], u_dn[:, :, :]], axis=1)
    rows = tb + 2 * pad
    gi = lax.broadcasted_iota(jnp.int32, (rows, ny), 0) + i * tb - pad
    gj = lax.broadcasted_iota(jnp.int32, (rows, ny), 1)
    gi_col = gi[:, 0:1]
    gj_row = gj[0:1, :]
    kw = dict(halo=halo, halo_c=halo_c, cf=cf, taps_f=taps_f, nx=nx, ny=ny,
              sigma_i=sigma_i, sigma_x=sigma_x)
    for t in range(k):
        composed = _chain_to_composed(iaux, iref, u, gi, gj, gi_col,
                                      gj_row, **kw)
        if t == k - 1:
            out_ref[:, :, :] = _smooth_tile(
                composed, gi_col, gj_row, taps_d, cd, rows, tb, nx, ny,
                pad=pad)
        else:
            u = _smooth_tile_full(composed, gi_col, gj_row, taps_d, cd,
                                  rows, nx, ny)


@functools.partial(jax.jit, static_argnames=(
    "sigma_i", "sigma_x", "sigma_fluid", "sigma_diffusion", "kernelwidth",
    "halo", "k", "tb", "vmem_mb"))
def thirion_k2_pallas(iaux, iref, u, sigma_i, sigma_x, sigma_fluid,
                      sigma_diffusion, kernelwidth, halo=2, k=2, tb=32,
                      vmem_mb=64):
    nx, ny = iaux.shape
    base_pad = required_pad(halo, kernelwidth)
    pad = k * base_pad
    cf = cd = (kernelwidth - 1) // 2
    taps_f = tuple(float(v) for v in gaussian_kernel_1d(sigma_fluid,
                                                        kernelwidth))
    taps_d = tuple(float(v) for v in gaussian_kernel_1d(sigma_diffusion,
                                                        kernelwidth))
    halo_c = min(halo, max(1, math.ceil(sigma_x / (2.0 * sigma_i))))
    assert nx % tb == 0 and tb % pad == 0, (nx, tb, pad)
    nblocks = nx // tb
    r = tb // pad
    last = nx // pad - 1
    up = lambda i: jnp.maximum(i * r - 1, 0)
    dn = lambda i: jnp.minimum((i + 1) * r, last)
    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((tb, ny), lambda i: (i, 0)),
            pl.BlockSpec((pad, ny), lambda i: (up(i), 0)),
            pl.BlockSpec((pad, ny), lambda i: (dn(i), 0)),
            pl.BlockSpec((tb, ny), lambda i: (i, 0)),
            pl.BlockSpec((pad, ny), lambda i: (up(i), 0)),
            pl.BlockSpec((pad, ny), lambda i: (dn(i), 0)),
            pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, up(i), 0)),
            pl.BlockSpec((2, pad, ny), lambda i: (0, dn(i), 0)),
        ],
        out_specs=pl.BlockSpec((2, tb, ny), lambda i: (0, i, 0)),
    )
    kernel = functools.partial(
        _k2_kernel, k=k, halo=halo, halo_c=halo_c, cf=cf, taps_f=taps_f,
        cd=cd, taps_d=taps_d, tb=tb, pad=pad, nx=nx, ny=ny,
        sigma_i=sigma_i, sigma_x=sigma_x)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        compiler_params=compiler_params(vmem_mb * MB),
        out_shape=jax.ShapeDtypeStruct((2, nx, ny), iaux.dtype),
    )(iaux, iaux, iaux, iref, iref, iref, u, u, u)


def main():
    from opticalflow2d_tpu.utils.profiling import kernel_timer

    fh = open(OUT, "a")

    def emit(row):
        row = {"bench": "demons_k2", **row}
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    SI, SX, SF, SD, KW, HALO = 1.0, 0.25, 2.0, 2.0, 5, 2
    rng = np.random.default_rng(9)
    for n in (1024, 4096):
        iref = jnp.asarray(rng.random((n, n), dtype=np.float32))
        iaux = jnp.asarray(rng.random((n, n), dtype=np.float32))
        u0 = jnp.asarray(
            np.tanh(rng.standard_normal((2, n, n)).astype(np.float32)))

        one = lambda u: thirion_onepass_pallas(
            iaux, iref, u, SI, SX, SF, SD, KW, HALO)

        # correctness first: k2 == two sequential one-pass calls AT THE
        # SAME TILE (bitwise; different tilings differ by 1 ulp even
        # between two standalone calls — tile-shape association)
        for tb in (64, 32, 16):
            pad = 2 * required_pad(HALO, KW)
            if n % tb or tb % pad:
                continue
            try:
                k2 = lambda u, tb=tb: thirion_k2_pallas(
                    iaux, iref, u, SI, SX, SF, SD, KW, HALO, 2, tb)
                one_tb = lambda u, tb=tb: thirion_onepass_pallas(
                    iaux, iref, u, SI, SX, SF, SD, KW, HALO, tb=tb)
                got = k2(u0)
                want = one_tb(one_tb(u0))
                md = float(jnp.max(jnp.abs(got - want)))
                if md > 1e-6:
                    # beyond tile-shape association noise -> a real bug
                    emit({"n": n, "tb": tb, "check": "FAIL", "maxdiff": md})
                    continue
                sec2 = kernel_timer(k2, u0, iters_lo=20, iters_hi=60)
                us2 = sec2 * 1e6 / 2
                emit({"n": n, "tb": tb,
                      "check": "bitwise-ok" if md == 0.0 else "ulp-ok",
                      "maxdiff": md, "us_per_iter_k2": round(us2, 1)})
            except Exception as e:
                emit({"n": n, "tb": tb, "error": type(e).__name__,
                      "msg": str(e)[:160]})
        sec1 = kernel_timer(one, u0, iters_lo=20, iters_hi=60)
        emit({"n": n, "us_per_iter_k1": round(sec1 * 1e6, 1)})
        del iref, iaux, u0
    fh.close()


if __name__ == "__main__":
    main()
