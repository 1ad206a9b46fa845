"""Python harness around the C++ parity oracle (oracle/build/oracle).

Raw-file layout contract (see oracle/main.cpp): double arrays, x-fastest
(reference flat layout ``flat[i + j*nx]``); motion output is the x-plane then
the y-plane.
"""

import os
import subprocess
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_BIN = os.path.join(REPO, "oracle", "build", "oracle")
BUILD_SH = os.path.join(REPO, "oracle", "build.sh")


def ensure_oracle() -> str:
    if not os.path.exists(ORACLE_BIN):
        subprocess.run([BUILD_SH], check=True, capture_output=True)
    return ORACLE_BIN


def _write_raw(path: str, a: np.ndarray):
    # a is [nx, ny]; x-fastest flat = a.T (C-order) ravel
    np.ascontiguousarray(a.T, dtype=np.float64).ravel().tofile(path)


def run_oracle(
    iref: np.ndarray,
    imov: np.ndarray,
    nscales: int,
    nrefine: int,
    reg: int,
    regparams,
    niter,
    timeout: float = 300.0,
    pair2=None,
):
    """Run the reference implementation; returns (motion [2, nx, ny],
    warped [nx, ny]) as float64.

    ``pair2=(iref2, imov2)``: repeated-register mode — the oracle runs a
    SECOND register call on the same persistent object (the reference MEX
    wrapper's statefulness) and the outputs reflect that warm-continued
    second call."""
    ensure_oracle()
    nx, ny = iref.shape
    with tempfile.TemporaryDirectory() as td:
        pref = os.path.join(td, "iref.raw")
        pmov = os.path.join(td, "imov.raw")
        pmot = os.path.join(td, "motion.raw")
        pwar = os.path.join(td, "warped.raw")
        _write_raw(pref, iref)
        _write_raw(pmov, imov)
        env = None
        if pair2 is not None:
            pref2 = os.path.join(td, "iref2.raw")
            pmov2 = os.path.join(td, "imov2.raw")
            _write_raw(pref2, pair2[0])
            _write_raw(pmov2, pair2[1])
            env = dict(os.environ, OF2D_ORACLE_PAIR2=f"{pref2}:{pmov2}")
        args = (
            [ORACLE_BIN, pref, pmov, pmot, pwar, str(nx), str(ny),
             str(nscales), str(nrefine), str(int(reg)), str(len(regparams))]
            + [repr(float(p)) for p in regparams]
            + [str(int(n)) for n in niter]
        )
        proc = subprocess.run(args, capture_output=True, timeout=timeout,
                              env=env)
        if proc.returncode != 0:
            raise RuntimeError(
                f"oracle failed ({proc.returncode}): {proc.stderr.decode()[-2000:]}"
            )
        size = nx * ny
        mo = np.fromfile(pmot, dtype=np.float64)
        assert mo.size == 2 * size
        ux = mo[:size].reshape(ny, nx).T
        uy = mo[size:].reshape(ny, nx).T
        war = np.fromfile(pwar, dtype=np.float64).reshape(ny, nx).T
        return np.stack([ux, uy]), war


def endpoint_error(u_a: np.ndarray, u_b: np.ndarray) -> float:
    """Mean Euclidean distance between two motion fields."""
    d = u_a - u_b
    return float(np.mean(np.sqrt(d[0] ** 2 + d[1] ** 2)))
