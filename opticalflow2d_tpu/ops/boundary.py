"""Boundary-condition enforcement on motion fields.

API-parity equivalents of ``Motion::Neumann_boundaryconditions`` /
``Motion::Dirichlet_boundaryconditions`` (``src/Motion.cpp:181-251``). In the
reference these are dead code (never called, SURVEY.md §2.3.10); they are
provided here as clean implementations of the *intended* semantics —
copy-from-interior (Neumann/zero-flux) and zero (Dirichlet) borders — for
users building custom solver loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def dirichlet_boundary(u: jnp.ndarray) -> jnp.ndarray:
    """Zero the border ring of ``[..., nx, ny]``."""
    out = u
    zero = jnp.zeros((), u.dtype)
    out = out.at[..., 0, :].set(zero)
    out = out.at[..., -1, :].set(zero)
    out = out.at[..., :, 0].set(zero)
    out = out.at[..., :, -1].set(zero)
    return out


def neumann_boundary(u: jnp.ndarray) -> jnp.ndarray:
    """Zero-flux border: each border pixel copies its inward neighbour,
    corners copy the inward diagonal."""
    out = u
    out = out.at[..., 0, :].set(u[..., 1, :])
    out = out.at[..., -1, :].set(u[..., -2, :])
    out = out.at[..., :, 0].set(out[..., :, 1])
    out = out.at[..., :, -1].set(out[..., :, -2])
    return out
