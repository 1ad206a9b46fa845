"""Pallas TPU kernels for the hot loops (SURVEY.md §3.4) where explicit
fusion/tiling beats XLA's defaults.

Scoped-vmem policy (v5e, measured in the round-4 sweeps,
benchmarks/r4_results.jsonl):

- Mosaic's default 16 MiB scoped-vmem budget is a compiler default, not
  hardware (v5e has 128 MiB VMEM/core), and allocation is NONDETERMINISTIC
  run-to-run: identical programs with ~16-24 MiB stacks compiled in one
  run and failed in another. Every kernel therefore picks its row tile
  together with a vmem limit that leaves ~2x margin over the stack its
  configuration was measured to need.
- Raised limits of 24-64 MiB are runtime-neutral (within-run A/B:
  123.8-135.2 us across 24/32/48/64M vs ~130 at default on the same
  config), but 100 MiB degrades Mosaic's codegen by 7-33% — never use it.
- The larger tiles the raised limits admit are where the wins are: e.g.
  the fused demons step at 4096^2 runs 7.6 ms at (tb=64, 64M) vs 14.5 ms
  at the largest default-limit tile.
"""

from jax.experimental.pallas import tpu as _pltpu

MB = 1024 * 1024


def compiler_params(vmem_limit_bytes: int | None):
    """CompilerParams carrying a raised scoped-vmem limit, or None for
    Mosaic's default budget."""
    if vmem_limit_bytes is None:
        return None
    return _pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes)
