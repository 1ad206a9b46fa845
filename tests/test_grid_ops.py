import numpy as np
import jax.numpy as jnp
import pytest

from opticalflow2d_tpu.ops import grid
import reference_impl as ref


@pytest.fixture
def field(rng):
    return rng.standard_normal((17, 23)).astype(np.float32)


@pytest.mark.parametrize(
    "jax_fn,ref_fn",
    [
        (grid.partial_x, ref.partial_x),
        (grid.partial_y, ref.partial_y),
        (grid.partial_xx, ref.partial_xx),
        (grid.partial_yy, ref.partial_yy),
        (grid.partial_xy, ref.partial_xy),
        (grid.qlaplacian, ref.qlaplacian),
    ],
)
def test_stencils_match_reference_loops(field, jax_fn, ref_fn):
    got = np.asarray(jax_fn(jnp.asarray(field)))
    want = ref_fn(field.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_stencils_batch_over_leading_axes(rng):
    f = rng.standard_normal((2, 17, 23)).astype(np.float32)
    got = np.asarray(grid.partial_x(jnp.asarray(f)))
    for c in range(2):
        np.testing.assert_allclose(
            got[c], ref.partial_x(f[c].astype(np.float64)), rtol=1e-5, atol=1e-5
        )


def test_spatial_gradient_stacks_components(field):
    g = np.asarray(grid.spatial_gradient(jnp.asarray(field)))
    assert g.shape == (2, 17, 23)
    np.testing.assert_allclose(g[0], ref.partial_x(field.astype(np.float64)), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(g[1], ref.partial_y(field.astype(np.float64)), rtol=1e-5, atol=1e-5)


def test_jacobian_det_identity_for_zero_motion():
    u = jnp.zeros((2, 12, 14))
    np.testing.assert_allclose(np.asarray(grid.jacobian_det(u)), 1.0)


def test_jacobian_det_matches_reference(rng):
    u = (0.1 * rng.standard_normal((2, 15, 18))).astype(np.float32)
    got = np.asarray(grid.jacobian_det(jnp.asarray(u)))
    want = ref.jacobian_det(u.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
