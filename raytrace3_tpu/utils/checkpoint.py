"""Checkpoint / resume for the progressive render.

Reference: none — the accumulator lives only in RAM and the only artifact is
the per-pass JPEG (Raytracer.h:472-474); killing the process loses all
progress (SURVEY.md section 5).  Because each SPPM pass here is a pure
function ``key -> image``, recovery is exact: persist (accumulated image,
pass counter, base seed) and resume at pass i with the same per-pass folded
keys — bitwise-identical to the uninterrupted run.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save(path: str, accum: np.ndarray, passes_done: int, seed: int,
         extra: dict | None = None) -> None:
    tmp = path + ".tmp.npz"
    np.savez(
        tmp,
        accum=np.asarray(accum),
        passes_done=np.int64(passes_done),
        seed=np.int64(seed),
        extra=json.dumps(extra or {}),
    )
    os.replace(tmp, path)


def load(path: str):
    """Returns (accum, passes_done, seed, extra) or None if absent."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        return (
            z["accum"],
            int(z["passes_done"]),
            int(z["seed"]),
            json.loads(str(z["extra"])),
        )
