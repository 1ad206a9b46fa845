"""Round-8: warm-start sequence-tracking throughput.

The serving pattern of sequence registration (cine MRI, fluoroscopy):
register frame t against a fixed reference, warm-starting from frame
t-1's motion (``register(initial_motion=...)`` — the analog of the
reference's persistent-session reuse, but with a self-consistent
full-resolution seed). Reports frames/s over a synthetic moving
sequence, warm vs cold, with per-frame early-stop iteration counts —
the warm start's value is the iterations it removes.

Run (real TPU, background): python benchmarks/r8_tracking.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r8_results.jsonl")


def make_sequence(n, frames, rng):
    """Reference image + a sequence of smoothly-moving deformations."""
    xs = np.arange(n)[:, None]
    ys = np.arange(n)[None, :]
    img = np.zeros((n, n), np.float32)
    for _ in range(30):
        cx, cy = rng.uniform(0, n, 2)
        s = rng.uniform(3, max(5.0, n * 0.08))
        img += rng.uniform(-1, 1) * np.exp(
            -((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * s * s)
        ).astype(np.float32)
    seq = []
    for t in range(frames):
        ph = 2 * np.pi * t / frames
        sx = 2.0 * np.sin(ys * (2 * np.pi / (n / 3)) + ph) * \
            np.cos(xs * (2 * np.pi / (n / 2)))
        ix = np.clip(xs + sx, 0, n - 1).astype(np.int32)
        seq.append(img[ix, np.arange(n)[None, :]].astype(np.float32))
    return img, seq


def main():
    from opticalflow2d_tpu.config import Method, RegConfig
    from opticalflow2d_tpu.engine.registration import register

    fh = open(OUT, "a")

    def emit(row):
        print(json.dumps(row), flush=True)
        fh.write(json.dumps(row) + "\n")
        fh.flush()

    rng = np.random.default_rng(12)
    FRAMES = 16
    for n in (512, 1024):
        img, seq = make_sequence(n, FRAMES, rng)
        iref = jnp.asarray(img)
        movs = [jnp.asarray(m) for m in seq]
        cfg = RegConfig(method=Method.THIRIONS_DEMONS, niter=(60, 30),
                        nscales=1)
        for mode in ("cold", "warm"):
            try:
                # Warmup/compile on frame 0 both ways.
                r0 = register(iref, movs[0], cfg)
                float(jnp.sum(r0.motion))
                if mode == "warm":
                    register(iref, movs[1], cfg, initial_motion=r0.motion)
                t0 = time.perf_counter()
                prev = None
                iters = []
                for m in movs:
                    if mode == "warm" and prev is not None:
                        res = register(iref, m, cfg, initial_motion=prev)
                    else:
                        res = register(iref, m, cfg)
                    prev = res.motion
                float(jnp.sum(prev))
                wall = time.perf_counter() - t0
                iters = [int(t.iterations) for t in res.traces]
                emit({"bench": "tracking", "n": n, "mode": mode,
                      "frames": FRAMES,
                      "fps": round(FRAMES / wall, 1),
                      "ms_per_frame": round(wall / FRAMES * 1e3, 2),
                      "last_frame_iters": iters})
            except Exception as e:
                emit({"bench": "tracking", "n": n, "mode": mode,
                      "error": type(e).__name__, "msg": str(e)[:160]})
        del iref, movs
    fh.close()


if __name__ == "__main__":
    main()
