"""Validate + time the hybrid (cached/rolling) tap-schedule kernels and the
newly admitted blocked-diffusion tiles on the real chip.

Lessons encoded from the first r4 attempts (see r4_results.jsonl):
- Pass big arrays as jit ARGUMENTS or loop carries, never close over them
  in a zero-arg jit: captured 4096^2 constants inflate the shipped MLIR to
  ~200 MB and the server constant-folds select chains over them into
  multi-GB executables (the tunnel's 2 GiB proto limit kills the compile).
- Reference chains of k single-step pallas calls must run under
  lax.fori_loop (one pallas program), not a Python loop (k inlined copies).

Run (real TPU, single process): python benchmarks/r4_hybrid_validate.py
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
from jax import lax

from opticalflow2d_tpu.utils.profiling import kernel_timer

OUT = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")
_ANSI = re.compile(r"\x1b\[[0-9;]*m")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def clean_error(exc) -> str:
    msg = " ".join(_ANSI.sub("", str(exc)).split())
    m = re.search(r"(scoped vmem|Scoped allocation|byte size|RESOURCE)", msg,
                  re.IGNORECASE)
    if m:
        lo = max(0, m.start() - 80)
        return msg[lo:lo + 260]
    return msg[:260]


def fields(nx, ny, seed=0):
    rng = np.random.default_rng(seed)
    xs = np.arange(nx, dtype=np.float32)[:, None]
    ys = np.arange(ny, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
    u = rng.uniform(-1.4, 1.4, size=(2, nx, ny)).astype(np.float32)
    return jnp.asarray(iref), jnp.asarray(imov), jnp.asarray(u)


def probe(tag, fn, *args, time_it=True, lo=50, hi=250):
    """Compile+run fn(*args); optionally slope-time fn as a step on args[0]
    with the remaining args carried through the fori_loop unchanged."""
    try:
        jax.jit(fn)(*args)
        if not time_it:
            emit(probe=tag, ok=True)
            return None

        def step(state):
            return (fn(*state),) + tuple(state[1:])

        s = kernel_timer(lambda st: step(st), (args[0],) + tuple(args[1:]),
                         iters_lo=lo, iters_hi=hi)
        emit(probe=tag, ok=True, us=round(s * 1e6, 1))
        return s
    except Exception as exc:
        emit(probe=tag, ok=False, error=clean_error(exc))
        return None


def main():
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas, compose_smooth_pallas, _pick_tb)
    from opticalflow2d_tpu.pallas_kernels.warp_fused import (
        warp2d_pallas, compose_pallas)

    # ---- demons hybrid: auto picks per size, full fused step ----------
    for n in (1024, 2048, 4096):
        iref, imov, u = fields(n, n)
        tb_a, roll_a = _pick_tb(n, n, 1, 2)
        tb_b, roll_b = _pick_tb(n, n, 2, 2)
        emit(info=f"hybrid_picks_n{n}", A=[tb_a, roll_a], B=[tb_b, roll_b])

        sa = probe(f"hybridA_auto_n{n}",
                   lambda v, im, ir: demons_correspondence_pallas(
                       im, ir, v, 1.0, 0.25, 2.0, 5, halo=2),
                   u, imov, iref)
        sb = probe(f"hybridB_auto_n{n}",
                   lambda v, c: compose_smooth_pallas(v, c, 2.0, 5, halo=2),
                   u, u * 0.1)

        def full_step(v, im, ir):
            c = demons_correspondence_pallas(im, ir, v, 1.0, 0.25, 2.0, 5,
                                             halo=2)
            return compose_smooth_pallas(v, c, 2.0, 5, halo=2)

        s = probe(f"demons_fused_step_hybrid_n{n}", full_step, u, imov, iref)
        if s is not None:
            emit(bench="demons_fused_step", n=n, us_per_iter=round(s * 1e6, 1),
                 gpix_s=round(n * n / s / 1e9, 2), note="hybrid")

    # ---- bit-check at 1024 vs the UNJITTED jnp chain (op-by-op, the
    # round-2 methodology that measured 0.0) -----------------------------
    from opticalflow2d_tpu.ops.warp import warp2d, compose
    from opticalflow2d_tpu.ops.conv import gaussian_smooth
    from opticalflow2d_tpu.solvers.base import derivatives, demons_force

    iref, imov, u = fields(1024, 1024)
    c_ref = gaussian_smooth(
        demons_force(derivatives(iref, warp2d(imov, u)), 1.0, 0.25), 2.0, 5)
    c_got = demons_correspondence_pallas(imov, iref, u, 1.0, 0.25, 2.0, 5,
                                         halo=2)
    emit(check="hybridA_bitcheck_n1024",
         maxdiff=float(jnp.max(jnp.abs(c_got - c_ref))))
    u_ref = gaussian_smooth(compose(u, c_ref, 0), 2.0, 5)
    u_got = compose_smooth_pallas(u, c_ref, 2.0, 5, halo=2)
    emit(check="hybridB_bitcheck_n1024",
         maxdiff=float(jnp.max(jnp.abs(u_got - u_ref))))

    # ---- warp kernels: rule check at halo 2 and 4 ----------------------
    iref, imov, u = fields(1024, 1024)
    for halo, scale in ((2, 1.0), (4, 2.6)):
        uu = u * scale
        probe(f"warp_auto_h{halo}_n1024",
              lambda v, im, h=halo: v.at[0].set(
                  warp2d_pallas(im, v, halo=h)), uu, imov)
        for tb, roll in ((64, False), (64, True), (32, False), (32, True)):
            probe(f"warp_h{halo}_tb{tb}_{'roll' if roll else 'cache'}_n1024",
                  lambda v, im, h=halo, tb=tb, roll=roll: v.at[0].set(
                      warp2d_pallas(im, v, halo=h, tb=tb, rolling=roll)),
                  uu, imov)
        probe(f"compose_auto_h{halo}_n1024",
              lambda v, c, h=halo: compose_pallas(v, c, halo=h),
              uu, uu * 0.1)

    # ---- blocked diffusion: bit-check newly admitted tiles vs a
    # fori_loop of the single-step kernel --------------------------------
    from opticalflow2d_tpu.solvers.base import derivatives as derivs2
    from opticalflow2d_tpu.pallas_kernels.diffusion_fused import (
        diffusion_step_pallas)
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs, _pick_tiles)

    for n, k in ((2048, 8), (4096, 16), (4096, 8)):
        iref, imov, u = fields(n, n)
        d = derivs2(iref, imov)
        g = stack_derivs(d.grad_i, d.it)
        tiles = _pick_tiles(n, k, None, n)
        try:
            got = jax.jit(
                lambda v, gg: diffusion_block_pallas(
                    v, gg, 0.5, k=k, with_errors=False)[0]
            )(u, g)
            want = jax.jit(
                lambda v, gi, it: lax.fori_loop(
                    0, k,
                    lambda _, vv: diffusion_step_pallas(vv, gi, it, alpha=0.5),
                    v)
            )(u, d.grad_i, d.it)
            md = float(jnp.max(jnp.abs(got - want)))
            emit(check=f"diffusion_block_k{k}_n{n}", tiles=list(tiles),
                 maxdiff=md)
        except Exception as exc:
            emit(check=f"diffusion_block_k{k}_n{n}", tiles=list(tiles),
                 error=clean_error(exc))


if __name__ == "__main__":
    main()
