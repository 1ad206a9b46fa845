"""Batched (data-parallel) registration.

``register_batch`` vmaps the full pyramid/refine/iterate driver over a batch
of image pairs and shards the batch axis over the mesh's ``"data"`` axis.
Under vmap the per-pair ``while_loop`` convergence gates become masked
iterations (a pair that converged early idles until the batch maximum), which
preserves per-pair results exactly while keeping the computation SPMD.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opticalflow2d_tpu.config import RegConfig
from opticalflow2d_tpu.engine.registration import _register_impl, RegistrationResult


@functools.lru_cache(maxsize=32)
def _jitted_batch(cfg: RegConfig, mesh: Optional[Mesh]):
    fn = jax.vmap(lambda r, m: _register_impl(r, m, cfg))
    if mesh is None:
        return jax.jit(fn)
    data_sharding = NamedSharding(mesh, P("data"))
    return jax.jit(
        fn,
        in_shardings=(data_sharding, data_sharding),
        out_shardings=data_sharding,
    )


def register_batch(
    irefs, imovs, cfg: RegConfig, mesh: Optional[Mesh] = None
) -> RegistrationResult:
    """Register a batch of pairs.

    Args:
      irefs, imovs: ``[B, nx, ny]`` image stacks.
      cfg: static registration config.
      mesh: optional mesh with a ``"data"`` axis; the batch is sharded over
        it (B must be divisible by the axis size).

    Returns:
      ``RegistrationResult`` with a leading batch axis on every leaf
      (``motion`` is ``[B, 2, nx, ny]``).
    """
    irefs = jnp.asarray(irefs)
    imovs = jnp.asarray(imovs)
    if irefs.ndim != 3 or irefs.shape != imovs.shape:
        raise ValueError(
            f"expected matching [B, nx, ny] stacks, got {irefs.shape} vs {imovs.shape}"
        )
    if mesh is not None:
        b = irefs.shape[0]
        nd = mesh.shape["data"]
        if b % nd != 0:
            raise ValueError(f"batch {b} not divisible by data-axis size {nd}")
    return _jitted_batch(cfg, mesh)(irefs, imovs)
