"""Headline benchmark: Horn-Schunck diffusion solver throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpixels/s/chip", "vs_baseline": N,
   "ceiling": N, "baseline_mpix_s": N}

``value`` is the PRODUCTION configuration — the temporal-blocked Pallas
kernel with the per-iteration Logger error sums ON, exactly what
``register()`` executes for its convergence gate (engine/registration.py
``_solve_level_blocked``). ``ceiling`` is the same kernel with errors off
(the kernel's upper bound, previously the headline; kept as a secondary
field for continuity with BENCH_r01/r02).

``vs_baseline`` divides by a PINNED single-core C++ reference measurement
(oracle bench mode, protocol recorded in BASELINE.md: 1024^2, 30 iters,
best of 5 back-to-back runs on this host class). Re-measuring the C++
baseline inside every bench run made the ratio swing ~2x with host load
(10.15 vs 15.9 Mpix/s across rounds 1-2); a pinned best-of-N number keeps
the ratio reproducible. Set OF2D_REMEASURE_BASELINE=1 to re-run the
protocol instead.
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
# Pinned C++ baseline: oracle bench 1024 1024 30, best of 5 (g++ -O2,
# single core, this host class; BASELINE.md "baseline protocol"). The
# best-of is deliberate: the HIGHEST observed baseline gives the most
# conservative speedup claim.
PINNED_CPP_MPIX_S = 16.27
BLOCK_K = 16


def cpp_baseline() -> float:
    if not os.environ.get("OF2D_REMEASURE_BASELINE"):
        return PINNED_CPP_MPIX_S
    repo = os.path.dirname(os.path.abspath(__file__))
    binary = os.path.join(repo, "oracle", "build", "oracle")
    try:
        if not os.path.exists(binary):
            subprocess.run(
                [os.path.join(repo, "oracle", "build.sh")],
                check=True, capture_output=True, timeout=300,
            )
        best = 0.0
        for _ in range(5):
            out = subprocess.run(
                [binary, "bench", str(NX), str(NY), "30"],
                check=True, capture_output=True, timeout=600,
            )
            best = max(best,
                       float(json.loads(out.stdout.decode())["mpixels_per_s"]))
        return best
    except Exception as e:  # pragma: no cover
        print(f"bench: using pinned C++ baseline ({e})", file=sys.stderr)
        return PINNED_CPP_MPIX_S


def tpu_throughput(with_errors: bool) -> float:
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
    # pallas_kernels/diffusion_block.py), falling back to the jnp step if
    # unavailable. with_errors=True emits the per-iteration Logger sums
    # the production driver's convergence gate consumes; the bench carries
    # them into the result so XLA cannot dead-code them away.
    try:
        from opticalflow2d_tpu.pallas_kernels.diffusion_block import (
            diffusion_block_pallas, stack_derivs, _pick_tiles,
        )

        if _pick_tiles(NX, BLOCK_K, None, NY) is None:
            raise ValueError("no tiling")
        g = stack_derivs(d.grad_i, d.it)

        if with_errors:
            def step(carry):
                u, acc = carry
                u, sums = diffusion_block_pallas(
                    u, g, 0.5, k=BLOCK_K, with_errors=True
                )
                return (u, acc + jnp.sum(sums))
        else:
            def step(carry):
                u, acc = carry
                u, _ = diffusion_block_pallas(
                    u, g, 0.5, k=BLOCK_K, with_errors=False
                )
                return (u, acc)

        calls_per_iter = BLOCK_K
    except Exception as e:  # pragma: no cover
        print(f"bench: blocked kernel unavailable ({e}); jnp step",
              file=sys.stderr)
        from opticalflow2d_tpu.solvers.base import Derivatives

        dd = Derivatives(d.grad_i, d.it)

        def step(carry):
            u, acc = carry
            return (diffusion_step(u, dd, 0.5), acc)

        calls_per_iter = 1

    def make(iters):
        @jax.jit
        def run(u, grad_i, it_img):
            u, acc = jax.lax.fori_loop(
                0, iters // calls_per_iter, lambda _, c: step(c),
                (u, jnp.float32(0)),
            )
            # Reduce to a scalar inside the program: forcing the scalar to
            # host is the only reliable execution barrier through the
            # remote-TPU tunnel (block_until_ready can return early).
            return jnp.sum(u) + acc

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
    prod = tpu_throughput(with_errors=True)
    ceil = tpu_throughput(with_errors=False)
    print(json.dumps({
        "metric": "hs_diffusion_solver_throughput",
        "value": round(prod, 1),
        "unit": "Mpixels/s/chip",
        "vs_baseline": round(prod / cpp, 1),
        "ceiling": round(ceil, 1),
        "baseline_mpix_s": cpp,
    }))


if __name__ == "__main__":
    main()
