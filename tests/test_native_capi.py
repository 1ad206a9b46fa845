"""Native C API: build the shared library + C harness and run it in a
subprocess (CPU backend)."""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD_SH = os.path.join(REPO, "native", "build.sh")
TEST_BIN = os.path.join(REPO, "native", "build", "of2d_test")


@pytest.fixture(scope="module")
def native_binary():
    if not os.path.exists(TEST_BIN):
        try:
            subprocess.run([BUILD_SH], check=True, capture_output=True, timeout=300)
        except Exception as e:  # pragma: no cover
            pytest.skip(f"native build failed: {e}")
    return TEST_BIN


def test_c_api_end_to_end(native_binary):
    env = dict(
        os.environ,
        OF2D_PYTHONPATH=REPO,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        [native_binary], env=env, capture_output=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr.decode()[-1500:]
    assert b"PASSED" in proc.stdout
