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


# --- train-state (pytree) checkpointing -----------------------------------
#
# Inverse rendering carries (params, opt_state, step) — arbitrary nested
# pytrees of arrays.  Flatten with jax.tree_util key paths into one .npz
# (atomic-rename write); restore by unflattening against a live template of
# the same structure.  SURVEY.md section 5's "orbax/np checkpoint of
# (..., learnable params)" plan — np chosen: single-host, zero extra deps.


def _flatten_with_paths(tree):
    import jax

    leaves = jax.tree_util.tree_leaves_with_path(tree)
    flat = {jax.tree_util.keystr(kp): np.asarray(v) for kp, v in leaves}
    # Two distinct key paths stringifying identically would silently drop a
    # leaf in the dict comprehension — compare against the leaf count.
    assert len(flat) == len(leaves), "duplicate pytree key-path strings"
    return flat


def save_tree(path: str, tree, step: int = 0) -> None:
    """Persist any pytree of arrays (params / opt_state / ...) atomically."""
    flat = _flatten_with_paths(tree)
    tmp = path + ".tmp.npz"
    np.savez(tmp, __step__=np.int64(step), **flat)
    os.replace(tmp, path)


def load_tree(path: str, template):
    """Restore a pytree saved by ``save_tree``.

    ``template`` supplies the structure (e.g. freshly-built params /
    optimizer.init(params)); every leaf must be present in the file.
    Returns (tree, step) or None if the file is absent.
    """
    import jax

    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        leaves_kp, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for kp, tmpl in leaves_kp:
            arr = z[jax.tree_util.keystr(kp)]
            assert arr.shape == np.shape(tmpl), (
                f"checkpoint leaf {jax.tree_util.keystr(kp)} shape "
                f"{arr.shape} != template {np.shape(tmpl)}"
            )
            want = np.asarray(tmpl).dtype
            assert arr.dtype == want, (
                f"checkpoint leaf {jax.tree_util.keystr(kp)} dtype "
                f"{arr.dtype} != template {want} (silent casts corrupt "
                f"precision; rebuild the template with matching dtypes)"
            )
            leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, leaves), int(z["__step__"])
