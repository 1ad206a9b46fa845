"""Race tier-1 (default 16M scoped-vmem, conservative tile) against
tier-2 (bigger tile + raised limit) per kernel/size, all WITHIN one
process (cross-run offsets are ~30%). Also traces the limit penalty curve
on a fixed config. Decides the final (tile, vmem_limit) tables.

Run (real TPU, single process): python benchmarks/r4_tier_race.py
Appends JSON lines to benchmarks/r4_results.jsonl.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflow2d_tpu.utils.profiling import kernel_timer

OUT = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")
_ANSI = re.compile(r"\x1b\[[0-9;]*m")
MB = 1024 * 1024


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def clean(exc):
    msg = " ".join(_ANSI.sub("", str(exc)).split())
    m = re.search(r"Scoped allocation", msg)
    return msg[max(0, m.start() - 40):m.start() + 140] if m else msg[:160]


def _done():
    tags = set()
    try:
        with open(OUT) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                if str(row.get("probe", "")).startswith("race_"):
                    tags.add(row["probe"])
    except OSError:
        pass
    return tags


DONE = _done()

# Patch pallas_call so the limit is switchable per probe.
_orig = pl.pallas_call
LIMIT = {"v": None}


def patched(*a, **kw):
    if LIMIT["v"] is not None:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=LIMIT["v"])
    else:
        kw.pop("compiler_params", None)
    return _orig(*a, **kw)


pl.pallas_call = patched


def fields(n, seed=0, amp=1.4):
    rng = np.random.default_rng(seed)
    xs = np.arange(n, dtype=np.float32)[:, None]
    ys = np.arange(n, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
    u = rng.uniform(-amp, amp, size=(2, n, n)).astype(np.float32)
    return jnp.asarray(iref), jnp.asarray(imov), jnp.asarray(u)


def main():
    from opticalflow2d_tpu.pallas_kernels import demons_fused as df
    from opticalflow2d_tpu.pallas_kernels import warp_fused as wf
    from opticalflow2d_tpu.pallas_kernels import diffusion_block as db
    from opticalflow2d_tpu.pallas_kernels import diffusion_fused as dfu
    from opticalflow2d_tpu.pallas_kernels import elastic_block as eb
    from opticalflow2d_tpu.solvers.base import derivatives

    def clear_caches():
        df.demons_correspondence_pallas.clear_cache()
        df.compose_smooth_pallas.clear_cache()
        wf.warp2d_pallas.clear_cache()
        wf.compose_pallas.clear_cache()
        db.diffusion_block_pallas.clear_cache()
        dfu.diffusion_step_pallas.clear_cache()
        eb.elastic_block_pallas.clear_cache()

    data = {n: fields(n) for n in (1024, 2048, 4096)}
    derivs = {n: derivatives(data[n][0], data[n][1]) for n in data}
    stacked = {n: db.stack_derivs(derivs[n].grad_i, derivs[n].it)
               for n in data}

    def run(tag, fn, args, lo, hi, limit, per=1):
        if tag in DONE:
            return
        LIMIT["v"] = limit
        clear_caches()
        try:
            jax.jit(fn)(*args)
            s = kernel_timer(lambda st, fn=fn: (fn(*st),) + tuple(st[1:]),
                             args, iters_lo=lo, iters_hi=hi) / per
            emit(probe=tag, ok=True, us=round(s * 1e6, 1))
        except Exception as exc:
            emit(probe=tag, ok=False, error=clean(exc))

    # ---- penalty curve: fixed config, rising limit -------------------
    iref, imov, u = data[1024]
    for lim_mb in (24, 32, 48, 64):
        run(f"race_curveA_tb64_1024_lim{lim_mb}",
            lambda v, im, ir: df.demons_correspondence_pallas(
                im, ir, v, 1.0, 0.25, 2.0, 5, halo=2, tb=64),
            (u, imov, iref), 200, 1000, lim_mb * MB)

    # ---- demons h2 tier races ----------------------------------------
    # (tier1 tile @ default limit) vs (tier2 tile @ minimal raised limit)
    CFG = [
        (1024, 64, None, 256, 48), (2048, 32, None, 128, 48),
        (4096, 8, None, 64, 64),
    ]
    for n, tb1, lim1, tb2, lim2 in CFG:
        iref, imov, u = data[n]
        lo, hi = {1024: (200, 1000), 2048: (100, 500), 4096: (30, 150)}[n]
        for tag, tb, lim in ((f"race_A_h2_t1_tb{tb1}_n{n}", tb1, lim1),
                             (f"race_A_h2_t2_tb{tb2}_n{n}", tb2, lim2 * MB)):
            run(tag, lambda v, im, ir, tb=tb: df.demons_correspondence_pallas(
                im, ir, v, 1.0, 0.25, 2.0, 5, halo=2, tb=tb),
                (u, imov, iref), lo, hi, lim)
        for tag, tb, lim in ((f"race_B_h2_t1_tb{tb1}_n{n}", tb1, lim1),
                             (f"race_B_h2_t2_tb{tb2}_n{n}", tb2, lim2 * MB)):
            run(tag, lambda v, c, tb=tb: df.compose_smooth_pallas(
                v, c, 2.0, 5, halo=2, tb=tb),
                (u, u * 0.1), lo, hi, lim)

    # ---- demons h4: tier2 only (tier1 infeasible beyond 1024) --------
    for n, tb2, lim2 in ((2048, 64, 64), (4096, 64, 64)):
        iref, imov, u = data[n]
        u3 = u * (3.4 / 1.4)
        lo, hi = {2048: (100, 500), 4096: (30, 150)}[n]
        run(f"race_A_h4_t2_tb{tb2}_n{n}",
            lambda v, im, ir, tb=tb2: df.demons_correspondence_pallas(
                im, ir, v, 1.0, 0.25, 2.0, 5, halo=4, tb=tb),
            (u3, imov, iref), lo, hi, lim2 * MB)
        run(f"race_B_h4_t2_tb{tb2}_n{n}",
            lambda v, c, tb=tb2: df.compose_smooth_pallas(
                v, c, 2.0, 5, halo=4, tb=tb),
            (u3, u3 * 0.1), lo, hi, lim2 * MB)

    # ---- warp h2 @2048/@4096 ------------------------------------------
    for n, tb1, tb2, lim2 in ((2048, 32, 32, None), (4096, 8, 16, 32)):
        iref, imov, u = data[n]
        lo, hi = {2048: (100, 500), 4096: (30, 150)}[n]
        run(f"race_warp_h2_t1_tb{tb1}_n{n}",
            lambda v, im, tb=tb1: v.at[0].set(
                wf.warp2d_pallas(im, v, halo=2, tb=tb)),
            (u, imov), lo, hi, None)
        if lim2:
            run(f"race_warp_h2_t2_tb{tb2}_n{n}",
                lambda v, im, tb=tb2: v.at[0].set(
                    wf.warp2d_pallas(im, v, halo=2, tb=tb)),
                (u, imov), lo, hi, lim2 * MB)

    # ---- blocked diffusion, errors ON (driver config), proper loops --
    for n, tb1, tb2, lim2, k in ((2048, None, 128, 48, 8),
                                 (2048, None, 128, 48, 16),
                                 (4096, None, 64, 64, 16)):
        u = data[n][2]
        g = stacked[n]
        lo, hi = {2048: (13, 63), 4096: (7, 32)}[n]  # x k iters inside
        if tb1 is None:
            # tier1 = driver fallback: single-step kernel at its pick
            d = derivs[n]
            run(f"race_diffsingle_t1_n{n}",
                lambda v, gi, it: dfu.diffusion_step_pallas(
                    v, gi, it, alpha=0.5),
                (u, d.grad_i, d.it), lo * k, hi * k, None)
        run(f"race_diffblk_k{k}_t2_tb{tb2}_err_n{n}",
            lambda v, gg, k=k, tb=tb2: db.diffusion_block_pallas(
                v, gg, 0.5, k=k, tb=tb)[0],
            (u, g), lo, hi, lim2 * MB, per=k)

    # ---- blocked elastic @4096: bigger tile ---------------------------
    u = data[4096][2]
    g = stacked[4096]
    run("race_elasblk_k4_t1_tb8_n4096",
        lambda v, gg: eb.elastic_block_pallas(
            v, gg, 1.0, 0.1, 0.66, True, k=4, tb=8, with_errors=False)[0],
        (u, g), 15, 65, None, per=4)
    run("race_elasblk_k4_t2_tb64_n4096",
        lambda v, gg: eb.elastic_block_pallas(
            v, gg, 1.0, 0.1, 0.66, True, k=4, tb=64, with_errors=False)[0],
        (u, g), 15, 65, 48 * MB, per=4)


if __name__ == "__main__":
    main()
