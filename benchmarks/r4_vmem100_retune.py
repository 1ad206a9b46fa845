"""Re-tune every Pallas kernel's row tile with the 100 MiB scoped-vmem
limit (pallas_kernels.COMPILER_PARAMS): the old picks were feasibility
choices against Mosaic's flaky 16 MiB default, not perf optima. Carries
all arrays as loop state (never closure constants).

Run (real TPU, single process): python benchmarks/r4_vmem100_retune.py
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


def _done_tags():
    """Probe tags already recorded — reruns skip them (the sweep is longer
    than one driver timeout slot; relaunching continues where it died)."""
    tags = set()
    try:
        with open(OUT) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                if str(row.get("probe", "")).startswith("v100_"):
                    tags.add(row["probe"])
    except OSError:
        pass
    return tags


DONE = _done_tags()


def clean(exc):
    msg = " ".join(_ANSI.sub("", str(exc)).split())
    m = re.search(r"Scoped allocation", msg)
    return msg[max(0, m.start() - 40):m.start() + 140] if m else msg[:160]


def fields(n, seed=0, amp=1.4):
    rng = np.random.default_rng(seed)
    xs = np.arange(n, dtype=np.float32)[:, None]
    ys = np.arange(n, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
    u = rng.uniform(-amp, amp, size=(2, n, n)).astype(np.float32)
    return jnp.asarray(iref), jnp.asarray(imov), jnp.asarray(u)


LOOPS = {1024: (200, 1000), 2048: (50, 250), 4096: (20, 100)}


def probe(tag, fn, args, n):
    if tag in DONE:
        return None
    lo, hi = LOOPS[n]
    try:
        jax.jit(fn)(*args)
        s = kernel_timer(lambda st: (fn(*st),) + tuple(st[1:]), args,
                         iters_lo=lo, iters_hi=hi)
        emit(probe=tag, ok=True, us=round(s * 1e6, 1))
        return s
    except Exception as exc:
        emit(probe=tag, ok=False, error=clean(exc))
        return None


def main():
    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas, compose_smooth_pallas)
    from opticalflow2d_tpu.pallas_kernels.warp_fused import (
        warp2d_pallas, compose_pallas)

    TBS = {1024: (64, 128, 256), 2048: (32, 64, 128), 4096: (8, 16, 32, 64)}

    for n in (1024, 2048, 4096):
        iref, imov, u = fields(n)
        u3 = u * (3.4 / 1.4)
        for tb in TBS[n]:
            probe(f"v100_demonsA_h2_tb{tb}_n{n}",
                  lambda v, im, ir, tb=tb: demons_correspondence_pallas(
                      im, ir, v, 1.0, 0.25, 2.0, 5, halo=2, tb=tb),
                  (u, imov, iref), n)
            probe(f"v100_demonsB_h2_tb{tb}_n{n}",
                  lambda v, c, tb=tb: compose_smooth_pallas(
                      v, c, 2.0, 5, halo=2, tb=tb),
                  (u, u * 0.1), n)
            probe(f"v100_demonsA_h4_tb{tb}_n{n}",
                  lambda v, im, ir, tb=tb: demons_correspondence_pallas(
                      im, ir, v, 1.0, 0.25, 2.0, 5, halo=4, tb=tb),
                  (u3, imov, iref), n)
            probe(f"v100_demonsB_h4_tb{tb}_n{n}",
                  lambda v, c, tb=tb: compose_smooth_pallas(
                      v, c, 2.0, 5, halo=4, tb=tb),
                  (u3, u3 * 0.1), n)
            probe(f"v100_warp_h2_tb{tb}_n{n}",
                  lambda v, im, tb=tb: v.at[0].set(
                      warp2d_pallas(im, v, halo=2, tb=tb)),
                  (u, imov), n)
            probe(f"v100_compose_h4_tb{tb}_n{n}",
                  lambda v, c, tb=tb: compose_pallas(v, c, halo=4, tb=tb),
                  (u3, u3 * 0.1), n)

    # Blocked solvers: errors ON (driver config) and OFF (bench config).
    from opticalflow2d_tpu.solvers.base import derivatives
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs)
    from opticalflow2d_tpu.pallas_kernels import elastic_block

    DTBS = {1024: (128, 256), 2048: (64, 128), 4096: (32, 64)}
    for n in (1024, 2048, 4096):
        iref, imov, u = fields(n)
        d = derivatives(iref, imov)
        g = stack_derivs(d.grad_i, d.it)
        for k in (8, 16):
            for tb in DTBS[n]:
                if n % tb or tb % (((k + 7) // 8) * 8):
                    continue
                for err in (True, False):
                    tag = f"v100_diffblk_k{k}_tb{tb}_{'err' if err else 'noerr'}_n{n}"
                    if tag in DONE:
                        continue
                    try:
                        fn = (lambda v, gg, k=k, tb=tb, err=err:
                              diffusion_block_pallas(
                                  v, gg, 0.5, k=k, tb=tb,
                                  with_errors=err)[0])
                        jax.jit(fn)(u, g)
                        lo, hi = LOOPS[n]
                        s = kernel_timer(lambda st: (fn(*st), st[1]), (u, g),
                                         iters_lo=max(lo // k, 10),
                                         iters_hi=max(hi // k, 50)) / k
                        emit(probe=tag, ok=True, us_per_iter=round(s * 1e6, 1))
                    except Exception as exc:
                        emit(probe=tag, ok=False, error=clean(exc))
        for tb in DTBS[n]:
            if n % tb or tb % 8:
                continue
            tag = f"v100_elasblk_k4_tb{tb}_n{n}"
            if tag in DONE:
                continue
            try:
                fn = (lambda v, gg, tb=tb: elastic_block.elastic_block_pallas(
                    v, gg, 1.0, 0.1, 0.66, True, k=4, tb=tb,
                    with_errors=False)[0])
                jax.jit(fn)(u, g)
                lo, hi = LOOPS[n]
                s = kernel_timer(lambda st: (fn(*st), st[1]), (u, g),
                                 iters_lo=max(lo // 4, 10),
                                 iters_hi=max(hi // 4, 50)) / 4
                emit(probe=tag, ok=True, us_per_iter=round(s * 1e6, 1))
            except Exception as exc:
                emit(probe=tag, ok=False, error=clean(exc))

    # Single-step diffusion at the bigger tiles.
    from opticalflow2d_tpu.pallas_kernels.diffusion_fused import (
        diffusion_step_pallas)

    for n, tbs in ((2048, (128, 256)), (4096, (64, 128))):
        iref, imov, u = fields(n)
        d = derivatives(iref, imov)
        for tb in tbs:
            probe(f"v100_diffsingle_tb{tb}_n{n}",
                  lambda v, gi, it, tb=tb: diffusion_step_pallas(
                      v, gi, it, alpha=0.5, tb=tb),
                  (u, d.grad_i, d.it), n)


if __name__ == "__main__":
    main()
