"""Final on-chip check for the simplified (rolling-only) gather kernels
and the errors-on diffusion tiles: compile + bit-check + time the exact
configs the production driver picks.

Run (real TPU, single process): python benchmarks/r4_final_check.py
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
    msg = " ".join(_ANSI.sub("", str(exc)).split())
    m = re.search(r"(Scoped allocation|byte size)", msg)
    if m:
        return msg[max(0, m.start() - 40):m.start() + 200]
    return msg[:240]


def fields(nx, ny, seed=0):
    rng = np.random.default_rng(seed)
    xs = np.arange(nx, dtype=np.float32)[:, None]
    ys = np.arange(ny, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
    u = rng.uniform(-1.4, 1.4, size=(2, nx, ny)).astype(np.float32)
    return jnp.asarray(iref), jnp.asarray(imov), jnp.asarray(u)


def main():
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas, compose_smooth_pallas)

    # Rolling-only demons step at every size (auto tiles), lo/hi sized for
    # <=±15 us/iter jitter at each scale.
    for n, lo, hi in ((1024, 500, 2500), (2048, 200, 1000), (4096, 50, 250)):
        iref, imov, u = fields(n, n)

        def full_step(st):
            v, im, ir = st
            c = demons_correspondence_pallas(im, ir, v, 1.0, 0.25, 2.0, 5,
                                             halo=2)
            return (compose_smooth_pallas(v, c, 2.0, 5, halo=2), im, ir)

        try:
            s = kernel_timer(full_step, (u, imov, iref),
                             iters_lo=lo, iters_hi=hi)
            emit(bench="demons_fused_step", n=n,
                 us_per_iter=round(s * 1e6, 1),
                 gpix_s=round(n * n / s / 1e9, 2), note="rolling-final")
        except Exception as exc:
            emit(bench="demons_fused_step", n=n, error=clean_error(exc))

    # Bit-parity of the simplified kernels vs the unjitted jnp chain.
    from opticalflow2d_tpu.ops.warp import warp2d, compose
    from opticalflow2d_tpu.ops.conv import gaussian_smooth
    from opticalflow2d_tpu.solvers.base import derivatives, demons_force

    iref, imov, u = fields(1024, 1024)
    c_ref = gaussian_smooth(
        demons_force(derivatives(iref, warp2d(imov, u)), 1.0, 0.25), 2.0, 5)
    c_got = demons_correspondence_pallas(imov, iref, u, 1.0, 0.25, 2.0, 5,
                                         halo=2)
    emit(check="rollingA_bitcheck_n1024",
         maxdiff=float(jnp.max(jnp.abs(c_got - c_ref))))
    u_ref = gaussian_smooth(compose(u, c_ref, 0), 2.0, 5)
    u_got = compose_smooth_pallas(u, c_ref, 2.0, 5, halo=2)
    emit(check="rollingB_bitcheck_n1024",
         maxdiff=float(jnp.max(jnp.abs(u_got - u_ref))))

    # Driver-style blocked diffusion with Logger sums at the errors-on
    # tiles: compile + bit-check vs a fori_loop of single steps.
    from jax import lax
    from opticalflow2d_tpu.pallas_kernels.diffusion_fused import (
        diffusion_step_pallas)
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs, _pick_tiles)

    for n, k in ((2048, 16), (2048, 8), (1024, 16)):
        iref, imov, u = fields(n, n)
        d = derivatives(iref, imov)
        g = stack_derivs(d.grad_i, d.it)
        tiles = _pick_tiles(n, k, None, n, with_errors=True)
        try:
            got = jax.jit(
                lambda v, gg: diffusion_block_pallas(v, gg, 0.5, k=k)[0]
            )(u, g)
            want = jax.jit(
                lambda v, gi, it: lax.fori_loop(
                    0, k,
                    lambda _, vv: diffusion_step_pallas(vv, gi, it, alpha=0.5),
                    v)
            )(u, d.grad_i, d.it)
            md = float(jnp.max(jnp.abs(got - want)))
            emit(check=f"diff_block_errors_k{k}_n{n}", tiles=list(tiles),
                 maxdiff=md)
        except Exception as exc:
            emit(check=f"diff_block_errors_k{k}_n{n}", tiles=list(tiles),
                 error=clean_error(exc))


if __name__ == "__main__":
    main()
