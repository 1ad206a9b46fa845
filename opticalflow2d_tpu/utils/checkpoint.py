"""Checkpoint/resume for long registrations.

The reference has no persistence — its MEX singleton holds state only
between calls (``WrapperOpticalFlow2d.cpp:13-16``). Here, the natural resume
points are pyramid-level boundaries (SURVEY.md §5): a checkpoint is the
full-resolution motion field plus the config fingerprint and the last
completed pyramid scale, written as an atomically-renamed ``np.savez``
archive (deliberately dependency-free; the payload is one small array).

``register_resumable`` is the high-level path: it runs the pyramid one
level per jit call, checkpoints after each, and on restart resumes from the
first incomplete level — bit-identical to an uninterrupted ``register``.
``load_checkpoint`` + ``register(initial_motion=..., start_scale=...)`` is
the manual equivalent.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import numpy as np


def _cfg_fingerprint(cfg) -> str:
    d = dataclasses.asdict(cfg)
    d["method"] = int(cfg.method)
    d["accumulation"] = int(cfg.accumulation)
    # Logging-only knobs must not invalidate checkpoints (and keep round-1
    # fingerprints, which predate the field, loadable).
    d.pop("verbose_stream", None)
    return json.dumps(d, sort_keys=True, default=str)


def _inputs_fingerprint(iref, imov) -> str:
    """Content hash of the image pair — a checkpoint is only a valid resume
    point for the registration of the SAME inputs."""
    import hashlib

    h = hashlib.sha1()
    for a in (iref, imov):
        a = np.ascontiguousarray(np.asarray(a))
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def save_checkpoint(path: str, motion, cfg, level: Optional[int] = None,
                    inputs_fp: str = "", traces=()) -> None:
    """Write a checkpoint (atomically: temp + rename). ``traces``: the
    completed levels' LevelTrace tuples, persisted so a resumed run can
    return the FULL trace history, not just the levels it ran itself."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    payload = dict(
        motion=np.asarray(motion),
        config=_cfg_fingerprint(cfg),
        level=-1 if level is None else int(level),
        inputs=inputs_fp,
        n_traces=len(traces),
    )
    for i, t in enumerate(traces):
        payload[f"t{i}_scale"] = np.asarray(t.scale)
        payload[f"t{i}_errors"] = np.asarray(t.errors)
        payload[f"t{i}_iterations"] = np.asarray(t.iterations)
        payload[f"t{i}_regrids"] = np.asarray(t.regrids)
        payload[f"t{i}_fallbacks"] = np.asarray(t.fallbacks)
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_checkpoint_traces(path: str):
    """Recover the persisted LevelTrace history from a checkpoint (empty
    for pre-round-3 checkpoints, which did not record traces)."""
    from opticalflow2d_tpu.engine.registration import LevelTrace

    traces = []
    with np.load(path, allow_pickle=False) as z:
        n = int(z["n_traces"]) if "n_traces" in z else 0
        for i in range(n):
            traces.append(LevelTrace(
                scale=z[f"t{i}_scale"],
                errors=z[f"t{i}_errors"],
                iterations=z[f"t{i}_iterations"],
                regrids=z[f"t{i}_regrids"],
                fallbacks=(z[f"t{i}_fallbacks"]
                           if f"t{i}_fallbacks" in z else 0),
            ))
    return tuple(traces)


def load_checkpoint(path: str, cfg=None, inputs_fp: str = "") -> Tuple[np.ndarray, int]:
    """Load (motion, level). If ``cfg`` is given, mismatched config
    fingerprints raise; if ``inputs_fp`` is given and the checkpoint
    recorded one, mismatched image pairs raise — resuming a different
    registration silently produces wrong results otherwise."""
    with np.load(path, allow_pickle=False) as z:
        motion = z["motion"]
        stored = str(z["config"])
        level = int(z["level"])
        stored_inputs = str(z["inputs"]) if "inputs" in z else ""
    if cfg is not None and stored != _cfg_fingerprint(cfg):
        raise ValueError(
            "checkpoint was written under a different RegConfig; refusing to resume"
        )
    if inputs_fp and stored_inputs and stored_inputs != inputs_fp:
        raise ValueError(
            "checkpoint was written for a different image pair; refusing to resume"
        )
    return motion, level


def register_resumable(iref, imov, cfg, path: str, _crash_after_scale=None):
    """Registration with per-pyramid-level checkpointing and resume.

    Runs scales coarse -> fine one jit call each; after each completed scale
    the full-resolution motion is checkpointed to ``path`` (atomic rename).
    If ``path`` already holds a checkpoint for this ``cfg``, completed levels
    are skipped and the run continues from the first incomplete one.
    Level-split execution matches a monolithic ``register`` to float
    associativity (the split points are the driver's own down/upsample
    points, but XLA fuses the upsample->downsample pair across a monolithic
    level boundary with different rounding — measured maxdiff ~6e-8).

    ``_crash_after_scale`` (tests only): return ``None`` right after
    checkpointing that scale, simulating a mid-run kill.

    Returns a ``RegistrationResult`` whose ``traces`` cover the FULL
    pyramid: completed levels' traces are persisted in the checkpoint and
    restored on resume (pre-round-3 checkpoints without them resume with
    only this process's traces).
    """
    from opticalflow2d_tpu.engine.registration import register, RegistrationResult

    import jax.numpy as jnp

    inputs_fp = _inputs_fingerprint(iref, imov)
    start = cfg.nscales
    u0 = None
    traces = []
    if os.path.exists(path):
        motion, last_done = load_checkpoint(path, cfg, inputs_fp)
        traces = list(load_checkpoint_traces(path))
        if last_done == 0:
            return RegistrationResult(motion=jnp.asarray(motion),
                                      traces=tuple(traces))
        u0 = motion
        if last_done > 0:
            start = last_done - 1
        # last_done < 0 (level-less checkpoint): warm-start the full pyramid.

    for s in range(start, -1, -1):
        res = register(
            iref, imov, cfg, initial_motion=u0, start_scale=s, stop_scale=s
        )
        u0 = np.asarray(res.motion)
        traces.extend(res.traces)
        save_checkpoint(path, u0, cfg, level=s, inputs_fp=inputs_fp,
                        traces=traces)
        if _crash_after_scale is not None and s == _crash_after_scale:
            return None
    return RegistrationResult(motion=jnp.asarray(u0), traces=tuple(traces))
