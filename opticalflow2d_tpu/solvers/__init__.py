"""Solver step functions — one per reference solver class
(``src/regularization/``): Horn-Schunck diffusion, DCT-spectral curvature,
elastic red-black SOR, viscous fluid, Thirion and diffeomorphic demons."""

from opticalflow2d_tpu.solvers.base import Derivatives, derivatives, lssd_force, demons_force
from opticalflow2d_tpu.solvers.diffusion import diffusion_step
from opticalflow2d_tpu.solvers.curvature import make_curvature_step
from opticalflow2d_tpu.solvers.elastic import sor_sweep, elastic_step
from opticalflow2d_tpu.solvers.fluid import make_fluid_step
from opticalflow2d_tpu.solvers.demons import make_demons_step

__all__ = [
    "Derivatives", "derivatives", "lssd_force", "demons_force",
    "diffusion_step", "make_curvature_step", "sor_sweep", "elastic_step",
    "make_fluid_step", "make_demons_step",
]
