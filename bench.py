#!/usr/bin/env python
"""Benchmark: photons/s on the 512x512 teapot caustics scene, one chip.

Prints ONE JSON line:
  {"metric": "photons_per_s_teapot512", "value": N, "unit": "photons/s",
   "vs_baseline": N, ...}

``vs_baseline`` is measured against the C++ baseline implementation of the
reference algorithm (native/baseline_sppm.cpp — same workload: Newton
10x(50-restart) ray-Bezier intersection, depth-13 walks, r^2=2 deposits),
built and timed on this host's CPU with all cores, exactly like the
reference's OpenMP setup (BASELINE.md: the reference publishes no numbers,
so the baseline must be measured here).

Env knobs: RT3_BENCH_ROUNDS, RT3_BENCH_PHOTONS, RT3_BENCH_RES,
RT3_BENCH_PLATFORM (force e.g. cpu), RT3_BENCH_PALLAS=0/1,
RT3_BENCH_RESTARTS (Pallas Newton restarts/lane grid, default 16),
RT3_BENCH_TIMED (timed passes, default 4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def measure_cpp_baseline(reps: int = 3) -> dict:
    """Build + run the C++ baseline; returns its JSON record.

    The baseline host is small (2 cores here) and shares the machine with
    other processes, so a single run is noisy (observed ~±30%); take the
    median photons/s of ``reps`` runs.
    """
    src = os.path.join(REPO, "native", "baseline_sppm.cpp")
    exe = os.path.join(REPO, "native", "baseline_sppm")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-std=c++17", src,
             "-o", exe],
            check=True,
        )
    threads = os.cpu_count() or 1
    runs = []
    for _ in range(max(reps, 1)):
        out = subprocess.run(
            [exe, os.path.join(REPO, "assets", "teapot.bpt"), "512", "2000",
             str(threads)],
            check=True, capture_output=True, text=True, timeout=1800,
        ).stdout.strip()
        runs.append(json.loads(out.splitlines()[-1]))
    runs.sort(key=lambda r: float(r["photons_per_s"]))
    med = runs[len(runs) // 2]
    med["photons_per_s_runs"] = [round(float(r["photons_per_s"]), 1)
                                 for r in runs]
    return med


def main() -> int:
    rounds = int(os.environ.get("RT3_BENCH_ROUNDS", "16"))
    photons = int(os.environ.get("RT3_BENCH_PHOTONS", "131072"))
    res = int(os.environ.get("RT3_BENCH_RES", "512"))
    platform = os.environ.get("RT3_BENCH_PLATFORM")
    use_pallas = os.environ.get("RT3_BENCH_PALLAS", "1") != "0"
    # 8 restarts (2x4 stratified grid): certified per-ray against a
    # 64-restart oracle (docs/NEWTON_RESTARTS.json: zero eye misses, ~1%
    # different-root picks with t within 4%) and in aggregate by the
    # pallas-newton crossval; halves the Newton kernel vs round 4's 16.
    restarts = int(os.environ.get("RT3_BENCH_RESTARTS", "8"))
    n_timed = int(os.environ.get("RT3_BENCH_TIMED", "4"))
    # 1.0 = no deposit compaction: the banded deposit's sort already pushes
    # invalid lanes outside every search window, and the compaction gathers
    # cost more than the 11% larger sort (docs/PERF.md).
    depfrac = float(os.environ.get("RT3_BENCH_DEPFRAC", "1.0"))

    try:
        cpp = measure_cpp_baseline()
        baseline_pps = float(cpp["photons_per_s"])
    except Exception as e:  # keep benching even if the toolchain breaks
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        cpp = {}
        baseline_pps = float("nan")

    import jax

    # Persistent compilation cache: the 512^2 graph takes ~20 min to compile
    # on the remote-TPU path; cache it across processes.
    cache_dir = os.environ.get("JAX_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception as e:
        print(f"compilation cache unavailable: {e}", file=sys.stderr)

    if platform:
        jax.config.update("jax_platforms", platform)
    import numpy as np

    from raytrace3_tpu.render.driver import build_scene, make_pass_fn
    from raytrace3_tpu.utils.config import RenderConfig

    backend = jax.default_backend()
    cfg = RenderConfig(
        scene="full", width=res, height=res, passes=1, rounds=rounds,
        photons_per_round=photons, max_depth=13, atlas_res=128,
        bezier_compact_frac=0.09, bezier_compact_frac_photon=0.05,
        newton_restarts=4, newton_iters=10,
        update_mode="sppm", deposit="pallas", deposit_compact_frac=depfrac,
        hitpoint_factor=1.3, photon_regen=True,
        # measured eye survival: 20% after segment 1, 2.5% after 4, ~1.1%
        # after 6 — stage the wavefront down (overflow shows up in "dropped")
        eye_compact_schedule=((1, 0.25), (4, 0.04), (6, 0.02)),
    )
    scene = build_scene(cfg)
    newton_fn = None
    # Round-3 measured-fastest deposit (scripts/perf_deposit_sweep.py
    # sweeps #3-#6): tile-loop kernel, 1-D banding, tile 128, chunk 1024.
    # It also runs the rounds loop in LAYOUT SPACE (photon_rounds packed
    # mode) and has no work cap / overflow path.  RT3_BENCH_DEPCLS=block
    # restores the round-2 block kernel for A/B.
    from raytrace3_tpu.ops.deposit_pallas import (PallasDeposit,
                                                  PallasDepositTile,
                                                  world_bounds_from_scene)
    # Round-5 sweep #8 (docs/PERF.md): tile 256 / chunk 2048 measured
    # 55.5 ms/round vs round 4's t128/ch1024 at 60.0 — halving the DMA
    # issue count (the measured per-chunk floor) beats the round-3 optimum.
    wchunk = int(os.environ.get("RT3_BENCH_WCHUNK", "2048"))
    work_cap = int(os.environ.get("RT3_BENCH_WORKCAP", "16384"))
    dep_cls = os.environ.get("RT3_BENCH_DEPCLS", "tile")
    dep_tile = int(os.environ.get("RT3_BENCH_DEPTILE",
                                  "256" if dep_cls == "tile" else "512"))
    dep_2d = os.environ.get("RT3_BENCH_DEP2D", "0") == "1"
    bounds = world_bounds_from_scene(scene,
                                     extra_points=[[50.0, 35.0, 230.0]])
    if dep_cls == "tile":
        deposit_fn = PallasDepositTile(
            tile=dep_tile, chunk=wchunk, bucket2d=dep_2d,
            interpret=backend != "tpu",
            **(bounds if dep_2d else {k: bounds[k] for k in
                                      ("x_lo", "x_hi", "y_lo", "y_hi")}))
    else:
        deposit_fn = PallasDeposit(tile=dep_tile, wchunk=wchunk,
                                   work_cap=work_cap, bucket2d=dep_2d,
                                   interpret=backend != "tpu",
                                   **(bounds if dep_2d else
                                      {k: bounds[k] for k in
                                       ("x_lo", "x_hi", "y_lo", "y_hi")}))
    if use_pallas and backend == "tpu":
        from raytrace3_tpu.ops.newton_pallas import make_newton_pallas

        newton_fn = make_newton_pallas(iters=cfg.newton_iters,
                                       restarts=restarts)

    base = np.array([50.0, 35.0, 230.0])
    look = base + np.array([0.0, 0.042612, -1.0])
    fn = make_pass_fn(scene, cfg, base, look, deposit_fn=deposit_fn,
                      newton_fn=newton_fn)

    print(f"bench: backend={backend} warming up / compiling ...",
          file=sys.stderr, flush=True)
    key = jax.random.key(0)
    t0 = time.perf_counter()
    img, stats = fn(key)
    jax.block_until_ready(img)
    compile_s = time.perf_counter() - t0
    print(f"bench: compile+first pass {compile_s:.1f}s; timing ...",
          file=sys.stderr, flush=True)

    # timed passes: dispatch all passes WITHOUT touching their outputs —
    # float(stats[...]) inside the loop forces a per-pass device->host
    # round trip through the remote tunnel (~0.3 s of pure latency per
    # pass, measured); read everything after the final pass completes.
    #
    # Warm EVERY auxiliary graph before the clock starts: the round-4 gap
    # attribution (scripts/perf_dispatch_micro.py) showed the device
    # timeline inside a pass is packed (2 ms idle) and pass dispatch is
    # ~0.3 ms — the entire 0.6 s/pass wall-vs-op gap of rounds 1-3 was the
    # first-use compiles of fold_in and the stack/sum reduction landing
    # INSIDE the 2-pass timed window.  Steady state measures 1.241 s wall
    # vs 1.232 s device span.
    import jax.numpy as jnp

    keys = [jax.random.fold_in(key, i + 1) for i in range(n_timed)]
    warm = jax.device_get(
        jnp.stack([stats["photons_emitted"]] * n_timed).sum())
    jax.block_until_ready(keys)

    t0 = time.perf_counter()
    emitted_acc = []
    for k in keys:
        img, stats = fn(k)
        emitted_acc.append(stats["photons_emitted"])
    # ONE device_get of a scalar forces full completion (CLAUDE.md: on the
    # tunnel block_until_ready alone can return early).  Summing on device
    # first keeps exactly one tunnel RTT inside the timed window — a
    # per-pass loop of device_gets charged ~1 RTT of pure latency to every
    # timed pass (ADVICE round 2).
    emitted = float(jax.device_get(jnp.stack(emitted_acc).sum()))
    dt = (time.perf_counter() - t0) / n_timed
    emitted /= n_timed

    pps = emitted / dt
    # Traced ray segments per pass (BASELINE.json's second headline metric):
    # eye = staged wavefront widths x segment counts; photon = regen keeps
    # every lane live for all rounds x (max_depth + 1) segments.
    from raytrace3_tpu.render.eye import eye_stage_widths

    eye_rays = sum(s * w for s, w in eye_stage_widths(
        res * res, cfg.eye_compact_schedule, cfg.max_depth))
    photon_rays = rounds * (cfg.max_depth + 1) * photons
    mrays = (eye_rays + photon_rays) / dt / 1e6
    record = {
        "metric": "photons_per_s_teapot512",
        "value": round(pps, 1),
        "unit": "photons/s",
        "vs_baseline": round(pps / baseline_pps, 3) if baseline_pps == baseline_pps else None,
        "backend": backend,
        "pallas_newton": newton_fn is not None,
        "newton_restarts": restarts if newton_fn is not None else None,
        "mrays_per_s": round(mrays, 2),
        "pass_seconds": round(dt, 4),
        "compile_seconds": round(compile_s, 1),
        "photons_per_pass": int(emitted),
        "deposits_dropped": int(stats["deposits_dropped"]),
        "eye_dropped": int(stats["dropped"]),
        "hitpoints": int(stats["count"]),
        "cpp_baseline_photons_per_s": cpp.get("photons_per_s"),
        "cpp_threads": cpp.get("threads"),
    }
    print(json.dumps(record))
    # Silently lost flux invalidates the metric: both drop counters must be
    # zero (deposit work-list overflow + eye-compaction clipping).
    assert record["deposits_dropped"] == 0, record
    assert record["eye_dropped"] == 0, record
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
