#!/usr/bin/env python
"""Attribute the bench's wall-vs-device-op gap (VERDICT r3 next-step #1).

The round-4 trace shows the device timeline inside one pass is PACKED
(1.230 s ops in a 1.232 s span, 2 ms idle) — so the ~0.6 s/pass gap between
bench wall time (1.80 s) and device time (1.23 s) must live on the HOST
side of the tunnel: per-pass dispatch, the key fold_in dispatches, the
first-use compile of the bench's reduction graph, and the final device_get
RTT amortised over only 2 timed passes.

This script measures each component separately with a warm pass fn:
  * dispatch-only cost of fn(key) (async return, no sync)
  * fold_in dispatch cost
  * wall/pass at n = 2, 4, 8 timed passes (fixed-cost amortisation)
  * the tunnel RTT of one scalar device_get

Usage: python scripts/perf_dispatch_micro.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def main() -> int:
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from profile_pass import build_pass_fn

    fn = build_pass_fn()
    key = jax.random.key(0)
    t0 = time.perf_counter()
    img, stats = fn(key)
    jax.block_until_ready(img)
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    out = {}

    # tunnel RTT: one scalar device_get of an already-computed value
    s = stats["photons_emitted"]
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_get(s)
        out.setdefault("device_get_scalar_s", []).append(
            round(time.perf_counter() - t0, 4))

    # fold_in dispatch (async)
    t0 = time.perf_counter()
    keys = [jax.random.fold_in(key, i) for i in range(8)]
    out["fold_in_x8_dispatch_s"] = round(time.perf_counter() - t0, 4)
    jax.block_until_ready(keys)

    # dispatch-only cost of the big pass fn (async return)
    disp = []
    outs = []
    for i in range(4):
        t0 = time.perf_counter()
        img, st = fn(keys[i])
        disp.append(round(time.perf_counter() - t0, 4))
        outs.append(st["photons_emitted"])
    out["pass_dispatch_s"] = disp
    t0 = time.perf_counter()
    jax.device_get(jnp.stack(outs).sum())
    out["drain_4_passes_s"] = round(time.perf_counter() - t0, 4)

    # steady-state wall/pass at several n (keys pre-folded, sum graph warm)
    warm = jnp.stack(outs).sum()
    jax.block_until_ready(warm)
    for n in (2, 4, 8):
        ks = [jax.random.fold_in(key, 100 + i) for i in range(n)]
        jax.block_until_ready(ks)
        t0 = time.perf_counter()
        acc = []
        for k in ks:
            img, st = fn(k)
            acc.append(st["photons_emitted"])
        jax.device_get(jnp.stack(acc).sum())
        dt = time.perf_counter() - t0
        out[f"wall_per_pass_n{n}_s"] = round(dt / n, 4)

    # bench-style: fold_in INSIDE the timed loop (the round-3 bench shape)
    t0 = time.perf_counter()
    acc = []
    for i in range(4):
        img, st = fn(jax.random.fold_in(key, 200 + i))
        acc.append(st["photons_emitted"])
    jax.device_get(jnp.stack(acc).sum())
    out["wall_per_pass_n4_foldin_inside_s"] = round(
        (time.perf_counter() - t0) / 4, 4)

    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
