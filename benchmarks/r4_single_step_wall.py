"""Locate the single-step diffusion kernel's Mosaic VMEM wall at large lane
extents (r4_diffusion_diag showed tb=256 AND tb=128 both fail @ny=2048;
every blocked-kernel config passes). Probes descending tiles at 2048/4096
and records a cleaned error excerpt (the raw tunnel error is mostly ANSI
noise around the actual Mosaic message).

Run (real TPU, single process): python benchmarks/r4_single_step_wall.py
Appends JSON lines to benchmarks/r4_results.jsonl.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from opticalflow2d_tpu.utils.profiling import kernel_timer

OUT = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")
_ANSI = re.compile(r"\x1b\[[0-9;]*m")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def clean_error(exc) -> str:
    msg = _ANSI.sub("", str(exc))
    msg = " ".join(msg.split())
    # Prefer the window around the Mosaic resource message if present.
    m = re.search(r"(scoped vmem|vmem|exceeds|RESOURCE|Error:)", msg,
                  re.IGNORECASE)
    if m:
        lo = max(0, m.start() - 80)
        return msg[lo:lo + 420]
    return msg[:420]


def fields(nx, ny, seed=0):
    xs = np.arange(nx, dtype=np.float32)[:, None]
    ys = np.arange(ny, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
    rng = np.random.default_rng(seed)
    u = rng.uniform(-1.4, 1.4, size=(2, nx, ny)).astype(np.float32)
    return jnp.asarray(iref), jnp.asarray(imov), jnp.asarray(u)


def main():
    from opticalflow2d_tpu.solvers.base import derivatives
    from opticalflow2d_tpu.pallas_kernels.diffusion_fused import (
        diffusion_step_pallas)

    for n, tbs in ((2048, (128, 64, 32)), (4096, (64, 32, 16))):
        iref, imov, u = fields(n, n)
        d = derivatives(iref, imov)
        good = None
        for tb in tbs:
            try:
                s = kernel_timer(
                    lambda v, tb=tb: diffusion_step_pallas(
                        v, d.grad_i, d.it, alpha=0.5, tb=tb),
                    u, iters_lo=50, iters_hi=250)
                emit(probe=f"single_tb{tb}_n{n}", ok=True,
                     us_per_iter=round(s * 1e6, 1),
                     gpix_s=round(n * n / s / 1e9, 1))
                if good is None:
                    good = tb
            except Exception as exc:
                emit(probe=f"single_tb{tb}_n{n}", ok=False,
                     error=clean_error(exc))


if __name__ == "__main__":
    main()
