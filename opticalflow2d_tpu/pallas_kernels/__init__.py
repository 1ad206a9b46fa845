"""Pallas TPU kernels for the hot loops (SURVEY.md §3.4) where explicit
fusion/tiling beats XLA's defaults."""
