#!/usr/bin/env python
"""A/B timing: fused walk-segment Pallas kernel vs the jnp op-chain.

Times ONE photon-walk segment (intersect + material + branch; Bezier Newton
included via the Pallas solver in both paths) at bench shapes, plus the eye
variant.  Pattern follows scripts/perf_deposit_sweep.py: standalone jits,
single scalar device_get to force completion, warm reps.

Usage: PYTHONPATH=... python scripts/perf_walk_micro.py
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


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def main() -> int:
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from raytrace3_tpu.render.driver import build_scene
    from raytrace3_tpu.utils.config import RenderConfig
    from raytrace3_tpu.ops.walk_pallas import (eye_segment, pack_walk_table,
                                               photon_segment)
    from raytrace3_tpu.geometry.scene import intersect_scene
    from raytrace3_tpu.render.photon import _material_lanes
    from raytrace3_tpu.core.sampling import cosine_hemisphere, roulette
    from raytrace3_tpu.core.vecmath import normalize, reflect, refract
    from raytrace3_tpu.core.types import eta_from_refrn

    on_tpu = jax.default_backend() == "tpu"
    newton_fn = None
    if on_tpu:
        from raytrace3_tpu.ops.newton_pallas import make_newton_pallas

        newton_fn = make_newton_pallas(iters=10, restarts=16)

    N = int(os.environ.get("RT3_WALK_N", str(131072)))
    cfrac = float(os.environ.get("RT3_WALK_CFRAC", "0.05"))
    scene = build_scene(RenderConfig(scene="full", atlas_res=128,
                                     bezier_compact_frac=cfrac))
    tbl = pack_walk_table(scene)

    key = jax.random.key(0)
    ko, kd, kr, k1, k2 = jax.random.split(key, 5)
    o = jax.random.uniform(ko, (N, 3), minval=5.0, maxval=95.0)
    d = jax.random.normal(kd, (N, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    f = jnp.ones((N, 3))
    u_r = jax.random.uniform(kr, (N,))
    u1 = jax.random.uniform(k1, (N,))
    u2 = jax.random.uniform(k2, (N,))

    fetch_mat = _material_lanes(scene)

    def jnp_segment(o, d, f, u_key):
        k_r, k_d = jax.random.split(u_key)
        rec = intersect_scene(scene, o, d, newton_fn=newton_fn)
        obj = jnp.clip(rec.obj_id, 0, scene.n_objects - 1)
        dp, rp, rr, isd, rn = fetch_mat(obj)
        branch = roulette(k_r, dp, rp, rr)
        d_diff = cosine_hemisphere(k_d, rec.n)
        d_refl = normalize(reflect(d, rec.n))
        eta = eta_from_refrn(rn, rec.inside)
        n_eff = jnp.where(rec.inside[:, None], -rec.n, rec.n)
        d_refr = normalize(refract(d, n_eff, eta))
        new_d = jnp.where((branch == 0)[:, None], d_diff,
                          jnp.where((branch == 1)[:, None], d_refl, d_refr))
        return rec.pos, new_d, rec.color * f, rec.hit & isd

    def fused(o, d, f, u_r, u1, u2):
        seg = photon_segment(scene, tbl, o, d, u_r, u1, u2,
                             newton_fn=newton_fn, compact_frac=cfrac,
                             interpret=not on_tpu)
        return seg["pos"], seg["new_d"], seg["color"] * f, \
            seg["hit"] & seg["isd"]

    def eye_jnp(o, d):
        rec = intersect_scene(scene, o, d, newton_fn=newton_fn)
        return rec.pos, rec.n, rec.color

    def eye_fused(o, d):
        seg = eye_segment(scene, tbl, o, d, newton_fn=newton_fn,
                          compact_frac=cfrac, interpret=not on_tpu)
        return seg["pos"], seg["n"], seg["color"]

    cases = [
        ("photon_jnp", jax.jit(jnp_segment), (o, d, f, key)),
        ("photon_fused", jax.jit(fused), (o, d, f, u_r, u1, u2)),
        ("eye_jnp", jax.jit(eye_jnp), (o, d)),
        ("eye_fused", jax.jit(eye_fused), (o, d)),
    ]
    print(f"# N={N} backend={jax.default_backend()} cfrac={cfrac}",
          file=sys.stderr, flush=True)
    for name, fn, args in cases:
        try:
            out = fn(*args)
            _sync(out)
            t0 = time.perf_counter()
            _sync(out)
            rtt = time.perf_counter() - t0
            reps = 16
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*args)
            _sync(out)
            dt = (time.perf_counter() - t0 - rtt) / reps
            print(json.dumps({"case": name, "ms": round(dt * 1e3, 3)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"case": name, "error": str(e)[:400]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
