"""Auxiliary subsystems (SURVEY.md §5): checkpoint/resume, profiling,
numerical-health checks."""

from opticalflow2d_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from opticalflow2d_tpu.utils.profiling import trace, kernel_timer
from opticalflow2d_tpu.utils.health import debug_nans, assert_finite

__all__ = [
    "save_checkpoint", "load_checkpoint", "trace", "kernel_timer",
    "debug_nans", "assert_finite",
]
