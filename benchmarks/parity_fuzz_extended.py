"""Extended parity fuzz vs the C++ oracle: the same seeded distribution as
tests/test_parity_fuzz.py (which CI trims to 12 seeds to bound suite time,
commit 9a69287), run over a much larger seed range in one process.

Usage:  python benchmarks/parity_fuzz_extended.py [start] [stop]
Default seeds 0..100. Appends one JSON line per seed to
benchmarks/fuzz_extended.jsonl and prints a summary; the worst observed
endpoint error per family is recorded in PARITY.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

from conftest import make_pair
from oracle_utils import run_oracle, endpoint_error, ensure_oracle
from opticalflow2d_tpu import register, RegConfig, Method
from test_parity_fuzz import COMPAT, _draw

OUT = os.path.join(os.path.dirname(__file__), "fuzz_extended.jsonl")


def run_seed(seed):
    method, nx, ny, nscales, nrefine, niter, shift, params = _draw(seed)
    iref, imov = make_pair(nx, ny, shift=shift)
    u_ref, _ = run_oracle(
        iref, imov, nscales, nrefine, int(method), params, niter)
    kw = dict(compat=COMPAT, warp_halo=0, warp_halo_outer=0)
    if method in (Method.ELASTIC, Method.FLUID):
        kw["sor_ordering"] = "lexicographic"
    cfg = RegConfig.from_regparams(
        method, niter, nscales, params, nrefine, **kw)
    res = register(iref, imov, cfg)
    ee = endpoint_error(np.asarray(res.motion, np.float64), u_ref)
    return {
        "seed": seed, "method": method.name, "shape": [nx, ny],
        "nscales": nscales, "nrefine": nrefine, "niter": niter,
        "ee": float(ee), "ok": bool(ee < 1e-4),
    }


def main():
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    stop = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    ensure_oracle()
    worst = {}
    fails = []
    t0 = time.time()
    with open(OUT, "a") as f:
        for seed in range(start, stop):
            row = run_seed(seed)
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)
            m = row["method"]
            if row["ee"] > worst.get(m, -1.0):
                worst[m] = row["ee"]
            if not row["ok"]:
                fails.append(row["seed"])
    print(json.dumps({
        "seeds": [start, stop], "failures": fails,
        "worst_ee_per_family": {k: round(v, 10) for k, v in worst.items()},
        "elapsed_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
