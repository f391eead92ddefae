"""Eye-pass branch-following tests: the reference follows EVERY active lobe
deterministically (Raytracer.h:312-336) — diffuse records don't consume the
ray, and refl+refr on one object splits the path.  These exercise the K-slot
wavefront including slot allocation."""

import jax
import jax.numpy as jnp
import numpy as np

from raytrace3_tpu.core.types import Materials
from raytrace3_tpu.geometry.plane import make_planes
from raytrace3_tpu.geometry.scene import Scene
from raytrace3_tpu.geometry.sphere import make_spheres
from raytrace3_tpu.render.eye import eye_pass
from raytrace3_tpu.render.light import emit_photons


def _mini_scene(mats):
    """A floor plane + a sphere in front of the camera with material mats[1]."""
    planes = make_planes([(0.0, 0.0, -10.0)], [(0.0, 0.0, 1.0)])
    spheres = make_spheres([(0.0, 0.0, -5.0)], [1.0])
    m = Materials(
        diff=jnp.asarray([mats[0]["diff"], mats[1]["diff"]], jnp.float32),
        refl=jnp.asarray([mats[0]["refl"], mats[1]["refl"]], jnp.float32),
        refr=jnp.asarray([mats[0]["refr"], mats[1]["refr"]], jnp.float32),
        refrn=jnp.asarray([1.5, 1.5], jnp.float32),
        refln=jnp.ones((2,), jnp.float32),
    )
    return Scene(
        planes=planes, spheres=spheres, bezier=None, materials=m,
        obj_color=jnp.ones((2, 3), jnp.float32) * 0.9,
        obj_tex=jnp.full((2,), -1, jnp.int32),
        atlas=jnp.ones((1, 4, 4, 3), jnp.float32),
        light_pos=jnp.asarray([[0.0, 3.0, -5.0]], jnp.float32),
        light_color=jnp.asarray([[100.0] * 3], jnp.float32),
    )


DIFF = dict(diff=(0.7, 0.7, 0.7), refl=(0, 0, 0), refr=(0, 0, 0))
GLOSSY = dict(diff=(0.25, 0.25, 0.25), refl=(0.9, 0.9, 0.9), refr=(0, 0, 0))
SPLIT = dict(diff=(0, 0, 0), refl=(0.5, 0.5, 0.5), refr=(0.5, 0.5, 0.5))


def _rays(n=1):
    org = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32), (n, 1))
    dir = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    return org, dir


def test_glossy_records_and_continues():
    """MIRROR2-style material (Scene.h:108): diffuse record AND mirror
    continuation from the same hit — one slot suffices."""
    scene = _mini_scene([DIFF, GLOSSY])
    org, dir = _rays()
    hp, stats = eye_pass(scene, org, dir, capacity=8, max_depth=3, slots=1)
    # sphere hit records one hitpoint; reflected ray flies off to -z... it
    # reflects back toward +z (camera), hitting nothing -> 1 hit point
    assert int(stats["count"]) == 1
    assert int(stats["dropped"]) == 0
    assert bool(hp.valid[0])
    np.testing.assert_allclose(float(hp.pos[0, 2]), -4.0, atol=1e-4)


def test_split_material_needs_second_slot():
    """refl+refr both active: K=1 drops the secondary (counted); K=2 keeps
    both continuations."""
    scene = _mini_scene([DIFF, SPLIT])
    org, dir = _rays()
    _, s1 = eye_pass(scene, org, dir, capacity=16, max_depth=3, slots=1)
    assert int(s1["dropped"]) >= 1  # secondary refr continuation dropped

    hp2, s2 = eye_pass(scene, org, dir, capacity=16, max_depth=3, slots=2)
    assert int(s2["dropped"]) == 0
    # refr ray goes through the glass sphere and hits the floor plane
    # (diffuse) -> at least one hit point from the refracted branch
    assert int(s2["count"]) >= 1


def test_slot_capacity_overflow_counts():
    scene = _mini_scene([DIFF, DIFF])
    org, dir = _rays(4)
    hp, stats = eye_pass(scene, org, dir, capacity=2, max_depth=1, slots=1)
    assert int(stats["count"]) == 2          # saturated
    assert int(stats["dropped"]) >= 2        # overflow counted, not crashed
    assert int(hp.valid.sum()) == 2


def test_multi_light_emission(key):
    lp = jnp.asarray([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]], jnp.float32)
    lc = jnp.asarray([[5.0, 5.0, 5.0], [1.0, 2.0, 3.0]], jnp.float32)
    org, dir, flux = emit_photons(key, lp, lc, 128)
    assert org.shape == (256, 3)
    np.testing.assert_allclose(np.asarray(org[:128]), 0.0)
    np.testing.assert_allclose(np.asarray(org[128:, 0]), 10.0)
    np.testing.assert_allclose(
        np.asarray(flux[128:]),
        np.tile(np.asarray(lc[1] * 4 * np.pi), (128, 1)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dir), axis=1), 1.0,
                               rtol=1e-5)


def test_eye_compact_schedule_equivalent():
    """Staged-width compaction stores the same hit points (same pixels,
    same per-pixel weight sums up to reassociation roundoff)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytrace3_tpu import emit_rays, get_scene
    from raytrace3_tpu.render.eye import eye_pass
    from raytrace3_tpu.scenes import reference_camera

    scene = get_scene("cornell_specular", atlas_res=32)
    cam = reference_camera(64, 64)
    org, dir = emit_rays(cam)
    cap = 64 * 64 * 3
    a, sa = jax.jit(lambda: eye_pass(scene, org, dir, cap, 13))()
    b, sb = jax.jit(lambda: eye_pass(
        scene, org, dir, cap, 13, compact_schedule=((1, 0.5), (4, 0.1))))()
    assert int(sa["count"]) == int(sb["count"])
    assert int(sb["dropped"]) == 0

    def per_pixel(hp):
        w = jnp.where(hp.valid[:, None], hp.wgt, 0.0)
        idx = jnp.where(hp.valid, hp.pixel, 64 * 64)
        return np.asarray(jnp.zeros((64 * 64, 3)).at[idx].add(w, mode="drop"))

    pa, pb = per_pixel(a), per_pixel(b)
    # the two paths compile to different fusions: last-ulp position shifts
    # can land on a texture-wrap seam, so allow a tiny mismatch fraction
    close = np.isclose(pa, pb, rtol=1e-4, atol=1e-5)
    assert close.mean() > 0.999, (1 - close.mean())


def test_eye_compact_overflow_counted():
    """A too-tight stage width drops rays and counts them."""
    import jax

    from raytrace3_tpu import emit_rays, get_scene
    from raytrace3_tpu.render.eye import eye_pass
    from raytrace3_tpu.scenes import reference_camera

    scene = get_scene("cornell_specular", atlas_res=32)
    cam = reference_camera(64, 64)
    org, dir = emit_rays(cam)
    _, st = jax.jit(lambda: eye_pass(
        scene, org, dir, 64 * 64 * 3, 13,
        compact_schedule=((1, 0.02),)))()
    assert int(st["dropped"]) > 0
