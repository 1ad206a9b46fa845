"""Compile + time every AUTO (tile, vmem-limit) configuration the new
tier tables produce, on the real chip — the shipping gate for the
table-driven picks. Resumable (skips recorded probes).

Run (real TPU, single process): python benchmarks/r4_table_validate.py
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
                if str(row.get("probe", "")).startswith("tbl_"):
                    tags.add(row["probe"])
    except OSError:
        pass
    return tags


DONE = _done()


def fields(n, seed=0, amp=1.4):
    rng = np.random.default_rng(seed)
    xs = np.arange(n, dtype=np.float32)[:, None]
    ys = np.arange(n, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
    u = rng.uniform(-amp, amp, size=(2, n, n)).astype(np.float32)
    return jnp.asarray(iref), jnp.asarray(imov), jnp.asarray(u)


LOOPS = {1024: (200, 1000), 2048: (100, 500), 4096: (30, 150)}


def probe(tag, fn, args, n, per=1):
    if tag in DONE:
        return
    lo, hi = LOOPS[n]
    lo, hi = max(lo // per, 8), max(hi // per, 40)
    try:
        jax.jit(fn)(*args)
        s = kernel_timer(lambda st, fn=fn: (fn(*st),) + tuple(st[1:]),
                         args, iters_lo=lo, iters_hi=hi) / per
        emit(probe=tag, ok=True, us=round(s * 1e6, 1))
    except Exception as exc:
        emit(probe=tag, ok=False, error=clean(exc))


def main():
    from opticalflow2d_tpu.pallas_kernels import demons_fused as df
    from opticalflow2d_tpu.pallas_kernels import warp_fused as wf
    from opticalflow2d_tpu.pallas_kernels import diffusion_block as db
    from opticalflow2d_tpu.pallas_kernels import elastic_block as eb
    from opticalflow2d_tpu.solvers.base import derivatives

    for n in (1024, 2048, 4096):
        iref, imov, u = fields(n)
        u3 = u * (3.4 / 1.4)
        d = derivatives(iref, imov)
        g = db.stack_derivs(d.grad_i, d.it)

        # demons fused, auto picks, halo 2 and 4
        for halo, uu in ((2, u), (4, u3)):
            probe(f"tbl_demonsA_h{halo}_n{n}",
                  lambda v, im, ir, h=halo: df.demons_correspondence_pallas(
                      im, ir, v, 1.0, 0.25, 2.0, 5, halo=h),
                  (uu, imov, iref), n)
            probe(f"tbl_demonsB_h{halo}_n{n}",
                  lambda v, c, h=halo: df.compose_smooth_pallas(
                      v, c, 2.0, 5, halo=h),
                  (uu, uu * 0.1), n)

        # warp/compose auto, halo 2 and 4
        probe(f"tbl_warp_h2_n{n}",
              lambda v, im: v.at[0].set(wf.warp2d_pallas(im, v, halo=2)),
              (u, imov), n)
        probe(f"tbl_compose_h4_n{n}",
              lambda v, c: wf.compose_pallas(v, c, halo=4),
              (u3, u3 * 0.1), n)

        # blocked diffusion auto, k8/k16, errors on and off
        for k in (8, 16):
            for err in (True, False):
                tag = f"tbl_diffblk_k{k}_{'err' if err else 'noerr'}_n{n}"
                probe(tag,
                      lambda v, gg, k=k, err=err: db.diffusion_block_pallas(
                          v, gg, 0.5, k=k, with_errors=err)[0],
                      (u, g), n, per=k)

        # blocked elastic auto, k4, errors on (driver config)
        probe(f"tbl_elasblk_k4_n{n}",
              lambda v, gg: eb.elastic_block_pallas(
                  v, gg, 1.0, 0.1, 0.66, True, k=4)[0],
              (u, g), n, per=4)


if __name__ == "__main__":
    main()
