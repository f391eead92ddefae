#!/usr/bin/env python
"""Render the flagship scene with the reference's REAL texture assets.

VERDICT round 4 missing item 1: every committed artifact used procedural
texture stand-ins; the reference ships wall.jpg (marble), timg.jpg (red
marble floor) and planet.jpg in /root/reference/raytracer and publishes its
converged 1024^2 result as 大理石.jpg (README.md:355).  This script renders
the same scene through the bench-tuned TPU path with those images loaded
via the ``RT3_ASSET_TEXTURES`` override (scenes.py:62-79, the cv::imread
path of Element.h:47-59) and writes docs/asset_teapot{res}.png + a metrics
JSON.  blue.jpg is missing from the reference repo (SURVEY quirk #11), so
the teapot keeps the flat-blue stand-in, exactly like the reference as
cloned would.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/asset_render.py \
      [--res 512] [--passes 8] [--assets /root/reference/raytracer]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=16)
    ap.add_argument("--photons", type=int, default=131072)
    ap.add_argument("--atlas-res", type=int, default=128)
    ap.add_argument("--assets", default="/root/reference/raytracer")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    os.environ["RT3_ASSET_TEXTURES"] = args.assets

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import numpy as np

    from raytrace3_tpu.render import driver
    from raytrace3_tpu.render.sppm import tonemap
    from raytrace3_tpu.utils.config import RenderConfig
    from raytrace3_tpu.utils.image import save_png

    backend = jax.default_backend()
    # The bench-tuned execution path (bench.py): Pallas deposit + Newton,
    # photon regen, staged eye wavefront.
    cfg = RenderConfig(
        scene="full", width=args.res, height=args.res, passes=args.passes,
        rounds=args.rounds, photons_per_round=args.photons, max_depth=13,
        atlas_res=args.atlas_res,
        bezier_compact_frac=0.09, bezier_compact_frac_photon=0.05,
        newton_restarts=4, newton_iters=10, update_mode="sppm",
        hitpoint_factor=1.3, photon_regen=True,
        eye_compact_schedule=((1, 0.25), (4, 0.04), (6, 0.02))
        if args.res == 512 else ((1, 0.3), (4, 0.055), (6, 0.028)),
        out=os.path.join(REPO, "docs", f"asset_teapot{args.res}.png"),
    )
    scene = driver.build_scene(cfg)

    newton_fn = None
    deposit_fn = None
    if backend == "tpu":
        from raytrace3_tpu.ops.deposit_pallas import (make_pallas_deposit,
                                                      world_bounds_from_scene)
        from raytrace3_tpu.ops.newton_pallas import make_newton_pallas

        bounds = world_bounds_from_scene(
            scene, extra_points=[[50.0, 35.0, 230.0]])
        deposit_fn = make_pallas_deposit(
            bucket2d=False,
            **{k: bounds[k] for k in ("x_lo", "x_hi", "y_lo", "y_hi")})
        newton_fn = make_newton_pallas(iters=10, restarts=8)

    t0 = time.time()
    img, metrics = driver.render(cfg, scene=scene, deposit_fn=deposit_fn,
                                 newton_fn=newton_fn)
    dt = time.time() - t0
    save_png(cfg.out, np.asarray(tonemap(img)), tonemapped=True)

    rec = {
        "what": "full scene with the reference's real textures "
                "(wall.jpg/timg.jpg/planet.jpg via RT3_ASSET_TEXTURES; "
                "blue.jpg absent upstream -> flat blue, quirk #11)",
        "reference_image": "/root/reference/raytracer/大理石.jpg "
                           "(README.md:355)",
        "res": args.res, "passes": args.passes,
        "backend": backend, "seconds": round(dt, 1),
        "meter": metrics.get("meter"),
        "dropped": metrics.get("dropped"),
        "deposits_dropped": metrics.get("deposits_dropped"),
        "out": cfg.out,
    }
    outj = os.path.join(REPO, "docs", f"ASSET_TEAPOT{args.res}.json")
    with open(outj, "w") as f:
        json.dump(rec, f, indent=1, ensure_ascii=False)
    print(json.dumps({k: v for k, v in rec.items() if k != "meter"},
                     ensure_ascii=False))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
