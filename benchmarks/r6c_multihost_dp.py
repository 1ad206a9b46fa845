"""Two-process jax.distributed DP serving benchmark (CPU, gloo) —
VERDICT r2 item #8: a real DCN-path datapoint while multi-chip hardware
is unavailable.

Topologies compared on identical total batch and device count (4 virtual
CPU devices):
  multihost:       2 processes x 2 devices, collectives cross the process
                   boundary via gloo (the DCN-facing path)
  single-process:  1 process x 4 devices (the no-DCN control)

Also asserts the two topologies' motions agree (non-flaky equality: same
batch, same config, same vmap program).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/r6c_multihost_dp.py
"""

import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH, N, REPS = 8, 128, 5


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def multihost_run(tmp):
    worker = os.path.join(REPO, "benchmarks", "_mh_dp_worker.py")
    out_path = os.path.join(tmp, "mh.npz")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coordinator, out_path,
             str(BATCH), str(N), str(REPS)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{out}")
    import numpy as np

    data = np.load(out_path)
    return float(data["best_seconds"]), np.asarray(data["motion"])


def single_process_run():
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.parallel.mesh import make_mesh
    from opticalflow2d_tpu.parallel.batch import register_batch

    rng = np.random.default_rng(7)
    irefs = rng.random((BATCH, N, N), dtype=np.float32)
    imovs = rng.random((BATCH, N, N), dtype=np.float32)
    cfg = RegConfig(method=Method.DIFFUSION, niter=(10, 5), nscales=1,
                    alpha=0.5, warp_halo=0, warp_halo_outer=0)
    mesh = make_mesh(data=len(jax.devices()))

    def run():
        res = register_batch(irefs, imovs, cfg, mesh=mesh, impl="vmap")
        return np.asarray(res.motion)

    motion = run()
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        m = run()
        best = min(best, time.perf_counter() - t0)
    return best, motion


def main():
    import numpy as np

    with tempfile.TemporaryDirectory() as tmp:
        mh_s, mh_motion = multihost_run(tmp)
    sp_s, sp_motion = single_process_run()

    np.testing.assert_allclose(mh_motion, sp_motion, rtol=1e-6, atol=1e-7)
    row = {
        "bench": "multihost_dp_serving",
        "batch": BATCH, "size": N,
        "multihost_reg_per_s": round(BATCH / mh_s, 2),
        "single_process_reg_per_s": round(BATCH / sp_s, 2),
        "dcn_overhead_pct": round((mh_s / sp_s - 1) * 100, 1),
        "equal": True,
    }
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "benchmarks", "r6_results.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
