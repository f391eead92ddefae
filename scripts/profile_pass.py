#!/usr/bin/env python
"""Op-level TPU profile of one bench pass.

Runs the bench.py teapot512 pass under jax.profiler.trace and aggregates the
captured XPlane device events by op name, printing the top-N ops by total
time.  This is the ground truth for where a pass spends its time (the
subsystem bisect in perf_bisect.py brackets the same costs end-to-end).

Usage: python scripts/profile_pass.py [top_n]
Env: same RT3_BENCH_* knobs as bench.py.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def build_pass_fn():
    from raytrace3_tpu.ops.deposit_pallas import (PallasDeposit,
                                                  PallasDepositTile,
                                                  world_bounds_from_scene)
    from raytrace3_tpu.ops.newton_pallas import make_newton_pallas
    from raytrace3_tpu.render.driver import build_scene, make_pass_fn
    from raytrace3_tpu.utils.config import RenderConfig

    res = int(os.environ.get("RT3_BENCH_RES", "512"))
    rounds = int(os.environ.get("RT3_BENCH_ROUNDS", "16"))
    photons = int(os.environ.get("RT3_BENCH_PHOTONS", "131072"))
    # Keep this IDENTICAL to bench.py's config so the profiled program is
    # the benched program AND the persistent compile cache is shared.
    depfrac = float(os.environ.get("RT3_BENCH_DEPFRAC", "1.0"))
    restarts = int(os.environ.get("RT3_BENCH_RESTARTS", "8"))
    # At 1024^2 mirror the reference1024 preset's schedule (the cli path
    # the REFERENCE1024.json artifact runs) so the profiled program IS the
    # recorded one and the compile cache is shared.
    schedule = (((1, 0.3), (4, 0.055), (6, 0.028)) if res >= 1024
                else ((1, 0.25), (4, 0.04), (6, 0.02)))
    cfg = RenderConfig(
        scene="full", width=res, height=res, passes=1, rounds=rounds,
        photons_per_round=photons, max_depth=13,
        atlas_res=256 if res >= 1024 else 128,  # match the preset's atlas
        bezier_compact_frac=0.09, bezier_compact_frac_photon=0.05,
        newton_restarts=4, newton_iters=10,
        update_mode="sppm", deposit="pallas", deposit_compact_frac=depfrac,
        hitpoint_factor=1.3, photon_regen=True,
        eye_compact_schedule=schedule,
    )
    scene = build_scene(cfg)
    newton_fn = make_newton_pallas(iters=cfg.newton_iters, restarts=restarts)
    wchunk = int(os.environ.get("RT3_BENCH_WCHUNK", "2048"))
    work_cap = int(os.environ.get("RT3_BENCH_WORKCAP", "16384"))
    dep_cls = os.environ.get("RT3_BENCH_DEPCLS", "tile")
    dep_tile = int(os.environ.get(
        "RT3_BENCH_DEPTILE",
        ("512" if cfg.hitpoint_capacity > (1 << 19) else "256")
        if dep_cls == "tile" else "512"))
    dep_2d = os.environ.get("RT3_BENCH_DEP2D", "0") == "1"
    bounds = world_bounds_from_scene(scene, extra_points=[base_cam()])
    bkw = bounds if dep_2d else {k: bounds[k] for k in
                                 ("x_lo", "x_hi", "y_lo", "y_hi")}
    if dep_cls == "tile":
        deposit_fn = PallasDepositTile(tile=dep_tile, chunk=wchunk,
                                       bucket2d=dep_2d, **bkw)
    else:
        deposit_fn = PallasDeposit(tile=dep_tile, wchunk=wchunk,
                                   work_cap=work_cap, bucket2d=dep_2d,
                                   **bkw)
    base = base_cam()
    look = base + np.array([0.0, 0.042612, -1.0])
    return make_pass_fn(scene, cfg, base, look, deposit_fn=deposit_fn,
                        newton_fn=newton_fn)


def base_cam():
    return np.array([50.0, 35.0, 230.0])


def dump_top_ops(logdir: str, top_n: int):
    """Aggregate device-op time from the Chrome-format trace.json.gz, by op
    name AND by source file:line (the tensorflow xplane protos are not
    available in this image; the Chrome trace carries the same args)."""
    import collections
    import gzip

    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace capture found (device tracing unsupported here?)",
              file=sys.stderr)
        return
    for path in sorted(paths)[-1:]:
        with gzip.open(path) as f:
            d = json.load(f)
        pids, tids = {}, {}
        for e in d["traceEvents"]:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
        by_op = collections.Counter()
        by_src = collections.Counter()
        n_op = collections.Counter()
        for e in d["traceEvents"]:
            if e.get("ph") != "X":
                continue
            if "TPU" not in pids.get(e["pid"], ""):
                continue
            if "XLA Ops" not in tids.get((e["pid"], e.get("tid")), ""):
                continue
            name = e["name"]
            if name.split(".")[0] == "while":
                continue  # nests its children; avoid double counting
            dur = e.get("dur", 0)
            by_op[name] += dur
            n_op[name] += 1
            by_src[e.get("args", {}).get("source", "?")] += dur
        grand = sum(by_op.values())
        # --- timeline gap attribution (VERDICT r3 next-step #1): the
        # wall-vs-op difference lives BETWEEN ops on the device timeline.
        # Collect non-while X events on the XLA Ops thread, sort by start,
        # and charge each idle gap to the op that FOLLOWS it (the op whose
        # launch the device waited for).
        evs = []
        for e in d["traceEvents"]:
            if e.get("ph") != "X":
                continue
            if "TPU" not in pids.get(e["pid"], ""):
                continue
            if "XLA Ops" not in tids.get((e["pid"], e.get("tid")), ""):
                continue
            if e["name"].split(".")[0] == "while":
                continue
            evs.append((e["ts"], e["ts"] + e.get("dur", 0), e["name"]))
        evs.sort()
        gap_by_op = collections.Counter()
        gap_n = collections.Counter()
        gap_hist = collections.Counter()
        total_gap = 0.0
        cur_end = None
        for ts, te, name in evs:
            if cur_end is not None and ts > cur_end:
                g = ts - cur_end
                total_gap += g
                key = name.split(".")[0]
                gap_by_op[key] += g
                gap_n[key] += 1
                bucket = ("<5us" if g < 5 else "<20us" if g < 20 else
                          "<100us" if g < 100 else "<1ms" if g < 1e3 else
                          ">=1ms")
                gap_hist[bucket] += g
            cur_end = te if cur_end is None else max(cur_end, te)
        span = (evs[-1][1] - evs[0][0]) / 1e6 if evs else 0.0
        print(f"== {path}: {grand/1e6:.3f}s device op time (ex-while); "
              f"timeline span {span:.3f}s, device idle {total_gap/1e6:.3f}s "
              f"({len(evs)} events)")
        print("-- idle-gap histogram (total us per bucket):")
        for b, us in gap_hist.most_common():
            print(json.dumps({"gap_bucket": b, "ms": round(us / 1e3, 2)}))
        print("-- idle time charged to the FOLLOWING op (top):")
        for name, us in gap_by_op.most_common(20):
            print(json.dumps({"before_op": name[:70],
                              "ms": round(us / 1e3, 2), "n": gap_n[name]}))
        print("-- by source line:")
        for src, us in by_src.most_common(top_n):
            print(json.dumps({"src": src.replace("/root/repo/", ""),
                              "ms": round(us / 1e3, 2)}))
        print("-- by op:")
        for name, us in by_op.most_common(top_n):
            print(json.dumps({"op": name[:80], "ms": round(us / 1e3, 2),
                              "n": n_op[name]}))


def main() -> int:
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    fn = build_pass_fn()
    key = jax.random.key(0)
    t0 = time.perf_counter()
    img, stats = fn(key)
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s "
          f"emitted={float(stats['photons_emitted'])}", file=sys.stderr)

    logdir = os.environ.get("RT3_PROF_DIR", "/tmp/rt3prof")
    jax.profiler.start_trace(logdir)
    img, stats = fn(jax.random.fold_in(key, 1))
    _ = float(stats["photons_emitted"])  # forces completion
    jax.profiler.stop_trace()
    dump_top_ops(logdir, top_n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
