"""Seeded parity fuzz: random configurations and shapes vs the C++ oracle.

Each case draws method, pyramid depth, refinement count, iteration budget,
image shape, and regularisation parameters from seeded distributions and
asserts bit-level agreement of the converged motion fields. Deterministic
(fixed seeds) so failures reproduce."""

import numpy as np
import pytest

from conftest import make_pair
from oracle_utils import run_oracle, endpoint_error, ensure_oracle
from opticalflow2d_tpu import register, RegConfig, Method, CompatFlags

try:
    ensure_oracle()
    HAVE_ORACLE = True
except Exception:  # pragma: no cover
    HAVE_ORACLE = False

pytestmark = pytest.mark.skipif(not HAVE_ORACLE, reason="oracle build failed")

COMPAT = CompatFlags(maxabs_bug=True, conv_flatwrap=True)


def _draw(seed):
    rng = np.random.default_rng(seed)
    method = Method(int(rng.integers(0, 6)))
    nx = int(rng.integers(28, 72))
    ny = int(rng.integers(28, 72))
    nscales = int(rng.integers(0, 3))
    while min(nx, ny) // (2 ** nscales) < 12:
        nscales -= 1
    nrefine = int(rng.integers(1, 3))
    niter = [int(rng.integers(5, 25)) for _ in range(nscales + 1)]
    shift = (float(rng.uniform(-2, 2)), float(rng.uniform(-2, 2)))

    if method == Method.DIFFUSION:
        params = [float(rng.uniform(0.2, 1.5))]
    elif method == Method.CURVATURE:
        params = [float(rng.uniform(0.05, 0.5)), float(rng.uniform(0.5, 1.5))]
    elif method in (Method.ELASTIC, Method.FLUID):
        params = [float(rng.uniform(0.2, 1.0)), float(rng.uniform(0.0, 0.3))]
    elif method == Method.THIRIONS_DEMONS:
        params = [1.0, 0.25, float(rng.uniform(1.0, 3.0)),
                  float(rng.uniform(1.0, 3.0)), float(rng.choice([3, 5, 7])),
                  float(rng.integers(0, 2))]
    else:  # diffeomorphic
        params = [1.0, 0.25, float(rng.uniform(1.0, 3.0)),
                  float(rng.uniform(1.0, 3.0)), float(rng.choice([3, 5]))]
    return method, nx, ny, nscales, nrefine, niter, shift, params


@pytest.mark.parametrize("seed", range(12))
def test_random_config_parity(seed):
    method, nx, ny, nscales, nrefine, niter, shift, params = _draw(seed)
    iref, imov = make_pair(nx, ny, shift=shift)

    u_ref, _ = run_oracle(iref, imov, nscales, nrefine, int(method), params, niter)
    kw = dict(compat=COMPAT, warp_halo=0, warp_halo_outer=0)
    if method in (Method.ELASTIC, Method.FLUID):
        kw["sor_ordering"] = "lexicographic"
    cfg = RegConfig.from_regparams(method, niter, nscales, params, nrefine, **kw)
    res = register(iref, imov, cfg)

    ee = endpoint_error(np.asarray(res.motion, np.float64), u_ref)
    assert ee < 1e-4, (
        f"seed {seed}: {method.name} {nx}x{ny} nscales={nscales} "
        f"nrefine={nrefine} niter={niter} params={params}: EE={ee}"
    )
