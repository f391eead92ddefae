#!/usr/bin/env python
"""Perf bisection: time the bench pass with subsystems selectively disabled.

Each variant is the bench.py teapot512 workload minus one subsystem, so
(full - variant) isolates that subsystem's share of the pass time.  The
variants change the image (they are timing probes, not estimators); the
full-pass bench in bench.py remains the only reported number.

Usage: python scripts/perf_bisect.py [variant ...]
Variants: full nodeposit notex nobezier nonewton eyeonly rbg
(default: all).  ``rbg`` is the full pass driven by an rbg-impl key (the
TPU-native hardware PRNG) instead of threefry.  Prints one JSON line per
variant.
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
import numpy as np


def main() -> int:
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from raytrace3_tpu.ops.deposit_pallas import PallasDeposit
    from raytrace3_tpu.ops.newton_pallas import make_newton_pallas
    from raytrace3_tpu.render.camera import emit_rays, look_at
    from raytrace3_tpu.render.driver import build_scene
    from raytrace3_tpu.render.sppm import render_pass
    from raytrace3_tpu.utils.config import RenderConfig

    res = int(os.environ.get("RT3_BENCH_RES", "512"))
    rounds = int(os.environ.get("RT3_BENCH_ROUNDS", "16"))
    photons = int(os.environ.get("RT3_BENCH_PHOTONS", "131072"))
    restarts = int(os.environ.get("RT3_BENCH_RESTARTS", "16"))
    backend = jax.default_backend()

    cfg = RenderConfig(
        scene="full", width=res, height=res, passes=1, rounds=rounds,
        photons_per_round=photons, max_depth=13, atlas_res=128,
        bezier_compact_frac=0.09, bezier_compact_frac_photon=0.05,
        newton_restarts=4, newton_iters=10,
        update_mode="sppm", deposit="pallas", deposit_compact_frac=0.9,
        hitpoint_factor=1.3, photon_regen=True,
        eye_compact_schedule=((1, 0.25), (4, 0.04), (6, 0.02)),
    )
    scene = build_scene(cfg)
    newton_fn = make_newton_pallas(iters=cfg.newton_iters, restarts=restarts) \
        if backend == "tpu" else None
    deposit_fn = PallasDeposit(tile=512, wchunk=1024, work_cap=16384,
                               interpret=backend != "tpu")

    base_pos = jnp.asarray([50.0, 35.0, 230.0], jnp.float32)
    look = base_pos + jnp.asarray([0.0, 0.042612, -1.0], jnp.float32)
    cam = look_at(base_pos, look, cfg.width, cfg.height)
    org, dir = emit_rays(cam)

    class ZeroDeposit:
        """Timing probe: drops the deposit op (keeps the photon walk)."""

        def __call__(self, hp, dep, prep=None):
            c = hp.r2.shape[0]
            return jnp.zeros((c,), jnp.float32), jnp.zeros((c, 3), jnp.float32)

    def pass_fn(variant):
        ps = scene.replace(bezier_compact_frac=cfg.bezier_compact_frac_photon)
        dep, nwt, rnds = deposit_fn, newton_fn, cfg.rounds
        if variant == "nodeposit":
            dep = ZeroDeposit()
        elif variant == "notex":
            ps = ps.replace(obj_tex=jnp.full_like(ps.obj_tex, -1))
        elif variant == "nobezier":
            ps = ps.replace(bezier=None)
        elif variant == "nonewton":
            # Bezier AABB gate + compaction still run; the solve is skipped
            # by an always-miss solver.
            def nwt(o, d, c):
                r = o.shape[0]
                big = jnp.full((r,), 1e9, jnp.float32)
                z = jnp.zeros((r,), jnp.float32)
                return big, z, z, jnp.zeros((r,), jnp.int32), jnp.zeros((r,), bool)
        elif variant == "eyeonly":
            rnds = 1
        elif variant != "full" and variant != "rbg":
            raise SystemExit(f"unknown variant {variant}")

        def f(key):
            img, stats = render_pass(
                scene, org, dir, key,
                hitpoint_capacity=cfg.hitpoint_capacity,
                n_rounds=rnds, photons_per_round=cfg.photons_per_round,
                max_depth=cfg.max_depth, update_mode=cfg.update_mode,
                deposit_fn=dep, newton_fn=nwt,
                deposit_compact_frac=cfg.deposit_compact_frac,
                photon_scene=ps, photon_regen=True,
                eye_compact_schedule=cfg.eye_compact_schedule,
            )
            return img, stats

        return jax.jit(f)

    variants = sys.argv[1:] or [
        "full", "nodeposit", "notex", "nobezier", "nonewton", "eyeonly",
        "rbg"]
    for v in variants:
        key = jax.random.key(0, impl="rbg" if v == "rbg" else None)
        fn = pass_fn(v)
        t0 = time.perf_counter()
        img, _ = fn(key)
        # device_get forces real completion (remote-tunnel block_until_ready
        # can ack early); bench.py's stats fetch does the same.
        np.asarray(jax.device_get(img[0, 0]))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(2):
            img, _ = fn(jax.random.fold_in(key, i + 1))
        np.asarray(jax.device_get(img[0, 0]))
        dt = (time.perf_counter() - t0) / 2
        print(json.dumps({"variant": v, "pass_seconds": round(dt, 4),
                          "compile_seconds": round(compile_s, 1),
                          "backend": backend}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
