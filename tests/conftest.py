"""Test harness: force the CPU backend with 8 virtual devices so sharding
tests run anywhere; numerics are identical to TPU modulo float rounding."""

import os

# Hard override: the environment pins JAX_PLATFORMS=axon (remote TPU tunnel,
# ~1-2 min backend init per process) and the axon sitecustomize additionally
# calls jax.config.update("jax_platforms", "axon,cpu") which overrides the env
# var — so reset both BEFORE any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Interpret-mode pallas (used throughout the kernel tests) deadlocks against
# async eager dispatch on small hosts: a pending interpreted program's
# io_callback thread and the next eagerly dispatched op wait on each other
# (reproduced deterministically on a 4-core box in
# test_diffusion_pallas_iterated). Synchronous dispatch removes the overlap;
# jitted programs are unaffected.
jax.config.update("jax_cpu_enable_async_dispatch", False)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_pair(nx=48, ny=40, shift=(1.5, -0.8), rng=None):
    """Synthetic smooth image pair with a known constant translation:
    Imov(x) = Iref(x - shift) so that warping Imov by u=shift recovers Iref."""
    rng = rng or np.random.default_rng(0)
    xs = np.arange(nx)[:, None]
    ys = np.arange(ny)[None, :]

    def img(ox, oy):
        g = np.zeros((nx, ny))
        for (cx, cy, s, a) in [
            (nx * 0.4, ny * 0.5, 6.0, 1.0),
            (nx * 0.65, ny * 0.3, 4.0, 0.7),
            (nx * 0.3, ny * 0.75, 5.0, 0.5),
        ]:
            g += a * np.exp(-(((xs - ox) - cx) ** 2 + ((ys - oy) - cy) ** 2) / (2 * s * s))
        return g

    iref = img(0.0, 0.0)
    imov = img(shift[0], shift[1])
    return iref.astype(np.float32), imov.astype(np.float32)
