#!/usr/bin/env python
"""Inverse rendering on the TPU: recover perturbed scene parameters from a
rendered target by gradient descent through the full SPPM pass.

VERDICT round 2 item 9: the README's inverse-rendering claim needs an
artifact, not just a smoke test.  Two experiments:

  * ``albedo`` — the full reference scene at 128^2: the diffuse albedo
    table (reference Material.diff, Scene.h:100-113) is perturbed by
    per-channel factors in [0.55, 1.45] and recovered with Adam.  The
    deposit backward is the round-3 transposed banded Pallas kernel
    (ops/deposit_pallas.py PallasDepositLane(differentiable=True)) — the
    FAST deposit path, not the bruteforce oracle.
  * ``ctrl`` — the curved-teapot-patch scene (same as scripts/gradcheck.py)
    at 48^2: Bezier control points are perturbed by Gaussian noise and
    recovered; gradients flow through the Newton intersection via the
    implicit-function-theorem custom_vjp (geometry/bezier.py winner_root —
    the differentiable replacement of raytracer/Bezier.h:112-159).

Common-random-numbers setup: the target is rendered at the TRUE parameters
with the SAME key the loss uses, so the loss is deterministic with minimum
exactly at the truth — convergence isolates gradient correctness from
Monte-Carlo noise.

Writes docs/INVERSE_<exp>.json (loss + parameter-error curves) and a
side-by-side PNG.  Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/inverse_render.py \
      --exp albedo [--steps 200] [--platform cpu]
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
    ap.add_argument("--exp", choices=["albedo", "ctrl"], default="albedo")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from raytrace3_tpu.diff.train import (extract_params, make_render_fn)
    from raytrace3_tpu.ops.deposit_pallas import (PallasDepositLane,
                                                  world_bounds_from_scene)
    from raytrace3_tpu.render.driver import build_scene
    from raytrace3_tpu.utils.config import RenderConfig

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(args.seed)

    if args.exp == "albedo":
        cfg = RenderConfig(
            scene="full", width=128, height=128, rounds=4,
            photons_per_round=16384, max_depth=13, atlas_res=64,
            bezier_compact_frac=0.12, bezier_compact_frac_photon=0.06,
            hitpoint_factor=1.5,
        )
        scene = build_scene(cfg)
        camera_pose = None
        lr, key_name = 2e-2, "diff"

        def perturb(p):
            true = np.asarray(p["diff"])
            fac = rng.uniform(0.55, 1.45, true.shape).astype(np.float32)
            return dict(p, diff=jnp.asarray(np.clip(true * fac, 0.0, 1.0)))
    else:
        cfg = RenderConfig(
            scene="bezier_patch", width=48, height=48, rounds=2,
            photons_per_round=8192, max_depth=6, atlas_res=16,
            bezier_compact_frac=1.0,
        )
        scene = build_scene(cfg)
        scene = scene.replace(
            light_pos=jnp.asarray([[10.0, 18.0, 108.0]], jnp.float32))
        camera_pose = ((8.0, 8.0, 128.0), (16.0, 6.6, 116.0))
        lr, key_name = 3e-3, "ctrl"

        def perturb(p):
            true = np.asarray(p["ctrl"])
            noise = rng.normal(0.0, 0.25, true.shape).astype(np.float32)
            return dict(p, ctrl=jnp.asarray(true + noise))

    newton_fn = None
    if on_tpu:
        from raytrace3_tpu.ops.newton_pallas import make_newton_pallas

        newton_fn = make_newton_pallas(iters=cfg.newton_iters, restarts=8)
    bounds = world_bounds_from_scene(scene,
                                     extra_points=[[50.0, 35.0, 230.0]])
    deposit_fn = PallasDepositLane(
        tile=256, chunk=512, work_cap=16384, differentiable=True,
        interpret=not on_tpu, **bounds,
    )
    render = make_render_fn(scene, cfg, camera_pose=camera_pose,
                            newton_fn=newton_fn, deposit_fn=deposit_fn)

    true_params = extract_params(scene)
    key = jax.random.key(args.seed + 1)
    print(f"inverse[{args.exp}]: rendering target "
          f"({cfg.width}^2, backend={jax.default_backend()})...",
          file=sys.stderr, flush=True)
    target = jax.jit(render)(true_params, key)
    target = jax.block_until_ready(target)

    params = perturb(true_params)
    p0_err = float(jnp.abs(params[key_name] - true_params[key_name]).mean())

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            img = render(p, key)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if args.exp == "albedo":
            params["diff"] = jnp.clip(params["diff"], 0.0, 1.0)
        return params, opt_state, loss

    losses, errs = [], []
    t0 = time.time()
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state)
        if i % 5 == 0 or i == args.steps - 1:
            loss = float(loss)
            err = float(jnp.abs(params[key_name]
                                - true_params[key_name]).mean())
            losses.append([i, loss])
            errs.append([i, err])
            print(f"inverse[{args.exp}] step {i}: loss {loss:.3e} "
                  f"|d{key_name}| {err:.4f}", file=sys.stderr, flush=True)
    dt = time.time() - t0

    final_err = errs[-1][1]
    record = {
        "experiment": args.exp,
        "scene": cfg.scene,
        "res": cfg.width,
        "photons_per_step": cfg.rounds * cfg.photons_per_round,
        "steps": args.steps,
        "backend": jax.default_backend(),
        "deposit_backend": "PallasDepositLane(differentiable)",
        "initial_param_err": round(p0_err, 5),
        "final_param_err": round(final_err, 5),
        "err_reduction": round(p0_err / max(final_err, 1e-9), 2),
        "initial_loss": losses[0][1],
        "final_loss": losses[-1][1],
        "seconds": round(dt, 1),
        "loss_curve": [[i, round(l, 8)] for i, l in losses],
        "param_err_curve": [[i, round(e, 6)] for i, e in errs],
        "pass": bool(final_err < 0.25 * p0_err),
    }
    os.makedirs(os.path.join(REPO, "docs"), exist_ok=True)
    out = os.path.join(REPO, "docs", f"INVERSE_{args.exp.upper()}.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")

    # side-by-side PNG: target | initial | recovered
    try:
        from raytrace3_tpu.render.sppm import tonemap
        from raytrace3_tpu.utils.image import save_png

        img_rec = np.asarray(jax.jit(render)(params, key))
        img_bad = np.asarray(jax.jit(render)(perturb(true_params), key))
        h = cfg.height
        trip = np.concatenate(
            [np.asarray(target).reshape(h, -1, 3),
             img_bad.reshape(h, -1, 3), img_rec.reshape(h, -1, 3)], axis=1)
        save_png(os.path.join(REPO, "docs", f"inverse_{args.exp}.png"),
                 np.asarray(tonemap(jnp.asarray(trip))), tonemapped=True)
    except Exception as e:  # plotting is best-effort
        print(f"inverse: PNG skipped ({e})", file=sys.stderr)

    print(json.dumps({k: v for k, v in record.items()
                      if "curve" not in k}, indent=2))
    return 0 if record["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
