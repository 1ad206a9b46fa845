"""Worker for benchmarks/r6c_multihost_dp.py (two-process jax.distributed
DP serving benchmark, CPU/gloo). Not a test; run via the parent script."""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    coordinator = sys.argv[3]
    out_path = sys.argv[4]
    batch = int(sys.argv[5])
    n = int(sys.argv[6])
    reps = int(sys.argv[7])

    from opticalflow2d_tpu.parallel.multihost import (
        initialize_multihost,
        shard_batch_for_host,
    )

    initialize_multihost(coordinator, num_processes, process_id)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.parallel.mesh import make_mesh
    from opticalflow2d_tpu.parallel.batch import register_batch

    rng = np.random.default_rng(7)
    irefs = rng.random((batch, n, n), dtype=np.float32)
    imovs = rng.random((batch, n, n), dtype=np.float32)
    cfg = RegConfig(method=Method.DIFFUSION, niter=(10, 5), nscales=1,
                    alpha=0.5, warp_halo=0, warp_halo_outer=0)

    mesh = make_mesh(data=len(jax.devices()))
    sl = shard_batch_for_host(batch)
    sharding = NamedSharding(mesh, P("data"))
    girefs = jax.make_array_from_process_local_data(
        sharding, irefs[sl], (batch, n, n))
    gimovs = jax.make_array_from_process_local_data(
        sharding, imovs[sl], (batch, n, n))

    def run():
        res = register_batch(girefs, gimovs, cfg, mesh=mesh, impl="vmap")
        # Serving semantics: results land on the host (allgather readback).
        return multihost_utils.process_allgather(res.motion, tiled=True)

    motion = run()  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        multihost_utils.sync_global_devices("rep-start")
        t0 = time.perf_counter()
        m = run()
        best = min(best, time.perf_counter() - t0)

    if process_id == 0:
        tmp = out_path + ".tmp.npz"
        np.savez(tmp, motion=np.asarray(motion),
                 best_seconds=np.float64(best))
        os.replace(tmp, out_path)
    print(json.dumps({"process": process_id, "best_s": round(best, 4),
                      "reg_per_s": round(batch / best, 2)}), flush=True)


if __name__ == "__main__":
    main()
