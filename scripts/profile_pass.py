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
    from raytrace3_tpu.ops.deposit_pallas import PallasDeposit
    from raytrace3_tpu.ops.newton_pallas import make_newton_pallas
    from raytrace3_tpu.render.driver import build_scene, make_pass_fn
    from raytrace3_tpu.utils.config import RenderConfig

    res = int(os.environ.get("RT3_BENCH_RES", "512"))
    rounds = int(os.environ.get("RT3_BENCH_ROUNDS", "16"))
    photons = int(os.environ.get("RT3_BENCH_PHOTONS", "131072"))
    # Keep this IDENTICAL to bench.py's config so the profiled program is
    # the benched program AND the persistent compile cache is shared.
    depfrac = float(os.environ.get("RT3_BENCH_DEPFRAC", "1.0"))
    restarts = int(os.environ.get("RT3_BENCH_RESTARTS", "16"))
    cfg = RenderConfig(
        scene="full", width=res, height=res, passes=1, rounds=rounds,
        photons_per_round=photons, max_depth=13, atlas_res=128,
        bezier_compact_frac=0.09, bezier_compact_frac_photon=0.05,
        newton_restarts=4, newton_iters=10,
        update_mode="sppm", deposit="pallas", deposit_compact_frac=depfrac,
        hitpoint_factor=1.3, photon_regen=True,
        eye_compact_schedule=((1, 0.25), (4, 0.04), (6, 0.02)),
    )
    scene = build_scene(cfg)
    newton_fn = make_newton_pallas(iters=cfg.newton_iters, restarts=restarts)
    wchunk = int(os.environ.get("RT3_BENCH_WCHUNK", "1024"))
    work_cap = int(os.environ.get("RT3_BENCH_WORKCAP", "16384"))
    deposit_fn = PallasDeposit(tile=512, wchunk=wchunk, work_cap=work_cap)
    base = np.array([50.0, 35.0, 230.0])
    look = base + np.array([0.0, 0.042612, -1.0])
    return make_pass_fn(scene, cfg, base, look, deposit_fn=deposit_fn,
                        newton_fn=newton_fn)


def dump_top_ops(logdir: str, top_n: int):
    from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane capture found (device tracing unsupported here?)",
              file=sys.stderr)
        return
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            total = {}
            for line in plane.lines:
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    total[name] = total.get(name, 0) + ev.duration_ps
            if not total:
                continue
            items = sorted(total.items(), key=lambda kv: -kv[1])[:top_n]
            grand = sum(total.values())
            print(f"== plane: {plane.name} (total {grand/1e12:.3f}s summed)")
            for name, ps in items:
                print(json.dumps({"op": name[:120],
                                  "ms": round(ps / 1e9, 2),
                                  "pct": round(100 * ps / grand, 1)}))


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
