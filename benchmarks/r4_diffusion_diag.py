"""Isolate the large-grid diffusion JaxRuntimeErrors: run the blocked
kernel and the single-step kernel SEPARATELY at each failing config and
record the full error head, so the VMEM feasibility models can be refit on
facts instead of a shared try-block's ambiguity (r4_newtile_validate.py
wrapped `blocked` and `k x single-step` in one try).

Run (real TPU, single process): python benchmarks/r4_diffusion_diag.py
Appends JSON lines to benchmarks/r4_results.jsonl.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def fields(nx, ny, seed=0):
    rng = np.random.default_rng(seed)
    xs = np.arange(nx, dtype=np.float32)[:, None]
    ys = np.arange(ny, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))
    u = rng.uniform(-1.4, 1.4, size=(2, nx, ny)).astype(np.float32)
    return jnp.asarray(iref), jnp.asarray(imov), jnp.asarray(u)


def attempt(tag, fn, *args):
    try:
        out = fn(*args)
        out = jax.tree_util.tree_map(
            lambda a: float(jnp.max(jnp.abs(a))), out)
        emit(probe=tag, ok=True)
        return True
    except Exception as exc:
        head = " ".join(str(exc).split())[:240]
        emit(probe=tag, ok=False, error=head)
        return False


def main():
    from opticalflow2d_tpu.solvers.base import derivatives
    from opticalflow2d_tpu.pallas_kernels.diffusion_fused import (
        diffusion_step_pallas)
    from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
        diffusion_block_pallas, stack_derivs)

    for n, k, tb in ((2048, 8, 64), (4096, 16, 16), (4096, 8, 32)):
        iref, imov, u = fields(n, n)
        d = derivatives(iref, imov)
        g = stack_derivs(d.grad_i, d.it)
        attempt(f"blocked_k{k}_tb{tb}_n{n}",
                jax.jit(lambda v, g=g, k=k, tb=tb: diffusion_block_pallas(
                    v, g, 0.5, k=k, tb=tb, with_errors=False)[0]), u)
        attempt(f"single_tb256_n{n}",
                jax.jit(lambda v, d=d: diffusion_step_pallas(
                    v, d.grad_i, d.it, alpha=0.5, tb=256)), u)
        # ny-scaled single-step tile (the fix now in diffusion_fused:
        # auto tb with tb*ny <= 256*1024 lanes).
        attempt(f"single_auto_n{n}",
                jax.jit(lambda v, d=d: diffusion_step_pallas(
                    v, d.grad_i, d.it, alpha=0.5)), u)

    from opticalflow2d_tpu.pallas_kernels.demons_fused import (
        demons_correspondence_pallas, compose_smooth_pallas)

    for n in (2048, 4096):
        iref, imov, u = fields(n, n)
        attempt(f"demons_kernelA_n{n}",
                jax.jit(lambda v, iref=iref, imov=imov:
                        demons_correspondence_pallas(
                            imov, iref, v, 1.0, 0.25, 2.0, 5, halo=2)), u)
        attempt(f"demons_kernelB_n{n}",
                jax.jit(lambda v: compose_smooth_pallas(
                    v, v * 0.1, 2.0, 5, halo=2)), u)


if __name__ == "__main__":
    main()
