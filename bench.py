"""Headline benchmark: Horn-Schunck diffusion solver throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpixels/s/chip", "vs_baseline": N}

The metric is pixel-iterations per second of the hot PDE-update loop
(SURVEY.md §3.4 / BASELINE.md north-star: Mpixels/s/chip PDE-solver
throughput). ``vs_baseline`` is the speedup over the single-core C++
reference performing the same update (oracle bench mode, measured on this
host; falls back to a recorded measurement if the toolchain is missing).
"""

import json
import os
import subprocess
import sys
import time

NX = NY = 1024
# Two iteration counts: device throughput is taken from the SLOPE
# (t_hi - t_lo) / (hi - lo), which cancels the fixed per-call dispatch
# overhead (~28 ms through the remote-TPU tunnel).
ITERS_LO = 1000
ITERS_HI = 5000
# oracle bench 1024x1024, single-core g++ -O2, measured on this host.
FALLBACK_CPP_MPIX_S = 10.15


def cpp_baseline() -> float:
    repo = os.path.dirname(os.path.abspath(__file__))
    binary = os.path.join(repo, "oracle", "build", "oracle")
    try:
        if not os.path.exists(binary):
            subprocess.run(
                [os.path.join(repo, "oracle", "build.sh")],
                check=True, capture_output=True, timeout=300,
            )
        out = subprocess.run(
            [binary, "bench", str(NX), str(NY), "30"],
            check=True, capture_output=True, timeout=600,
        )
        return float(json.loads(out.stdout.decode())["mpixels_per_s"])
    except Exception as e:  # pragma: no cover
        print(f"bench: using recorded C++ baseline ({e})", file=sys.stderr)
        return FALLBACK_CPP_MPIX_S


def tpu_throughput() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from opticalflow2d_tpu.solvers.base import derivatives
    from opticalflow2d_tpu.solvers.diffusion import diffusion_step

    xs = np.arange(NX, dtype=np.float32)[:, None]
    ys = np.arange(NY, dtype=np.float32)[None, :]
    iref = np.sin(0.11 * xs) * np.cos(0.07 * ys)
    imov = np.sin(0.11 * (xs - 1.3)) * np.cos(0.07 * (ys + 0.6))

    d = derivatives(jnp.asarray(iref), jnp.asarray(imov))

    # Hot update loop: the temporal-blocked Pallas kernel (k iterations
    # per HBM pass, bit-identical interiors — see
    # pallas_kernels/diffusion_block.py; 14.5 vs 25-28 us/iter measured on
    # v5e @1024^2), falling back to the jnp step if unavailable.
    BLOCK_K = 16
    try:
        from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
            diffusion_block_pallas, stack_derivs, _pick_tiles,
        )

        if _pick_tiles(NX, BLOCK_K, None, NY) is None:
            raise ValueError("no tiling")
        g = stack_derivs(d.grad_i, d.it)

        def step(u):
            return diffusion_block_pallas(
                u, g, 0.5, k=BLOCK_K, with_errors=False
            )[0]

        calls_per_iter = BLOCK_K
    except Exception as e:  # pragma: no cover
        print(f"bench: blocked kernel unavailable ({e}); jnp step",
              file=sys.stderr)
        from opticalflow2d_tpu.solvers.base import Derivatives

        dd = Derivatives(d.grad_i, d.it)

        def step(u):
            return diffusion_step(u, dd, 0.5)

        calls_per_iter = 1

    def make(iters):
        @jax.jit
        def run(u, grad_i, it_img):
            u = jax.lax.fori_loop(
                0, iters // calls_per_iter, lambda _, v: step(v), u
            )
            # Reduce to a scalar inside the program: forcing the scalar to
            # host is the only reliable execution barrier through the
            # remote-TPU tunnel (block_until_ready can return early).
            return jnp.sum(u)

        return run

    u0 = jnp.zeros((2, NX, NY))
    run_lo = make(ITERS_LO)
    run_hi = make(ITERS_HI)

    def best_of(run, reps=3):
        float(run(u0, d.grad_i, d.it))  # compile + warmup
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(u0, d.grad_i, d.it))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = best_of(run_lo)
    t_hi = best_of(run_hi)
    per_iter = (t_hi - t_lo) / (ITERS_HI - ITERS_LO)
    return NX * NY / per_iter / 1e6


def main():
    cpp = cpp_baseline()
    tpu = tpu_throughput()
    print(json.dumps({
        "metric": "hs_diffusion_solver_throughput",
        "value": round(tpu, 1),
        "unit": "Mpixels/s/chip",
        "vs_baseline": round(tpu / cpp, 1),
    }))


if __name__ == "__main__":
    main()
