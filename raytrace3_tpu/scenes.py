"""Named scene registry implementing the reference scene and BASELINE configs.

Reference: the hard-coded Cornell-box variant built by ``Scene::init``
(raytracer/Scene.h:98-164) and the camera pose from ``main()``
(raytracer/main.cpp:22-27).  The reference has no config system at all
(SURVEY.md section 5) — every scene is compile-time code; here scenes are
data built by parameterised constructors and looked up by name:

  * ``cornell_diffuse``   — BASELINE config #1: spheres+planes, diffuse only.
  * ``cornell_specular``  — config #2: textured + mirror + glass.
  * ``bezier_patch``      — config #3: a single bicubic patch + UV texture.
  * ``teapot``            — config #4: full 32-patch teapot caustics scene.
  * ``full``              — config #5 / the reference's exact object list.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .core.types import Materials
from .geometry.bezier import BezierObject, load_bpt, teapot_transform
from .geometry.plane import make_planes
from .geometry.scene import Scene
from .geometry.sphere import make_spheres
from .render.camera import Camera, look_at
from .textures import texture as tx

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")

# Reference materials (Scene.h:100-113).  Material(d, s, r, rr, rl); several
# pass rr=0 but their refractive lobe is inactive so rr never reads.
WHITE_DIFF = dict(diff=(0.75, 0.75, 0.75), refl=(0, 0, 0), refr=(0, 0, 0), refrn=0.0)
MIRROR = dict(diff=(0, 0, 0), refl=(0.999, 0.999, 0.999), refr=(0, 0, 0), refrn=0.0)
REFR0 = dict(diff=(0, 0, 0), refl=(0, 0, 0), refr=(0.999, 0.999, 0.999), refrn=1.5)
RED_DIFF = dict(diff=(0.75, 0.3, 0.3), refl=(0, 0, 0), refr=(0, 0, 0), refrn=0.0)
BLUE_DIFF = dict(diff=(0.3, 0.3, 0.75), refl=(0, 0, 0), refr=(0, 0, 0), refrn=0.0)


def _materials(mats: list[dict]) -> Materials:
    f = lambda k: jnp.asarray([m[k] for m in mats], jnp.float32)
    return Materials(
        diff=f("diff"), refl=f("refl"), refr=f("refr"),
        refrn=jnp.asarray([m.get("refrn", 1.5) for m in mats], jnp.float32),
        refln=jnp.asarray([m.get("refln", 1.0) for m in mats], jnp.float32),
    )


#: Atlas slot -> reference asset filename (Scene.h:131-156).  Extensions are
#: tried in this order so PNG re-exports of the JPEGs also work.
ATLAS_ASSETS = ("wall", "timg", "planet", "blue")
_ASSET_EXTS = (".jpg", ".jpeg", ".png")


def _atlas(res: int, asset_dir: str | None = None):
    """Procedural stand-ins for wall.jpg / timg.jpg / planet.jpg / blue.jpg
    (Scene.h:131-156; blue.jpg is missing from the reference repo —
    SURVEY quirk #11 — so a flat blue takes its place).

    When ``asset_dir`` (or env ``RT3_ASSET_TEXTURES``) names a directory,
    any of the reference texture files found there replace the matching
    procedural slot — the ``load_image`` path the reference exercises via
    cv::imread (Element.h:47-59)."""
    slots = [
        tx.bricks(res),                        # 0: wall
        tx.marble(res),                        # 1: timg (floor)
        tx.planet(res),                        # 2: planet
        tx.flat(res, (0.2, 0.35, 0.9)),        # 3: blue
    ]
    asset_dir = asset_dir or os.environ.get("RT3_ASSET_TEXTURES")
    if asset_dir:
        for i, stem in enumerate(ATLAS_ASSETS):
            for ext in _ASSET_EXTS:
                path = os.path.join(asset_dir, stem + ext)
                if os.path.exists(path):
                    slots[i] = tx.load_image(path, res)
                    break
    return tx.build_atlas(slots)


def _cornell_geometry():
    """The 5 reference planes + 3 reference spheres (Scene.h:116-126)."""
    planes = make_planes(
        p0=[(1, 40.8, 81.6), (99, 40.8, 81.6), (50, 40.8, 0.0),
            (50, 0.0, 81.6), (50, 81.6, 81.6)],
        normal=[(1, 0, 0), (1, 0, 0), (0, 0, 1), (0, -1, 0), (0, 1, 0)],
    )
    spheres = make_spheres(
        center=[(27, 16.5, 47), (73, 16.5, 88), (50, 8.5, 60)],
        radius=[16.5, 16.5, 8.5],
    )
    return planes, spheres


def _teapot_ctrl() -> jnp.ndarray:
    """Teapot control points with the reference placement: scale 4,
    orientation Trans2 @ Trans, translation (20, 0, 120) (Scene.h:142-153)."""
    path = os.path.join(ASSETS, "teapot.bpt")
    ctrl = load_bpt(path, scale=4.0, transform=teapot_transform(),
                    translate=(20.0, 0.0, 120.0))
    return jnp.asarray(ctrl)


def reference_camera(width: int = 1024, height: int = 1024) -> Camera:
    """The main.cpp:22-27 pose: pos (50,35,230) looking at +(0,0.042612,-1)."""
    pos = np.array([50.0, 35.0, 230.0])
    return look_at(pos, pos + np.array([0.0, 0.042612, -1.0]), width, height)


def cornell_diffuse(atlas_res: int = 64) -> Scene:
    """Config #1: all-diffuse Cornell spheres+planes, flat colours."""
    planes, spheres = _cornell_geometry()
    mats = [RED_DIFF, BLUE_DIFF, WHITE_DIFF, WHITE_DIFF, WHITE_DIFF,
            WHITE_DIFF, WHITE_DIFF, WHITE_DIFF]
    color = jnp.asarray(
        [(0.75, 0.25, 0.25), (0.25, 0.25, 0.75), (0.75, 0.75, 0.75),
         (0.75, 0.75, 0.75), (0.75, 0.75, 0.75),
         (0.999,) * 3, (0.999,) * 3, (0.999,) * 3], jnp.float32)
    return Scene(
        planes=planes, spheres=spheres, bezier=None,
        materials=_materials(mats), obj_color=color,
        obj_tex=jnp.full((8,), -1, jnp.int32), atlas=_atlas(atlas_res),
        light_pos=jnp.asarray([[50.0, 60.0, 85.0]], jnp.float32),
        light_color=jnp.asarray([[5000.0] * 3], jnp.float32),
    )


def cornell_specular(atlas_res: int = 128) -> Scene:
    """Config #2: the reference scene minus the teapot — textured walls,
    mirror back plane, mirror + glass spheres (Scene.h:116-141,157)."""
    planes, spheres = _cornell_geometry()
    mats = [WHITE_DIFF, WHITE_DIFF, MIRROR, WHITE_DIFF, WHITE_DIFF,
            MIRROR, REFR0, WHITE_DIFF]
    color = jnp.asarray(
        [(0.75, 0.25, 0.25), (0.25, 0.25, 0.75), (0.75, 0.75, 0.75),
         (0.75, 0.75, 0.75), (0.75, 0.75, 0.75),
         (0.999,) * 3, (0.999,) * 3, (0.999,) * 3], jnp.float32)
    # Texture map (Scene.h:134-141): walls 0,1,4 = wall; 3 = timg; sphere 7
    # (= our id 7) = planet; back mirror plane untextured.
    tex = jnp.asarray([0, 0, -1, 1, 0, -1, -1, 2], jnp.int32)
    return Scene(
        planes=planes, spheres=spheres, bezier=None,
        materials=_materials(mats), obj_color=color, obj_tex=tex,
        atlas=_atlas(atlas_res),
        light_pos=jnp.asarray([[50.0, 60.0, 85.0]], jnp.float32),
        light_color=jnp.asarray([[5000.0] * 3], jnp.float32),
    )


def bezier_patch(atlas_res: int = 128) -> Scene:
    """Config #3: one bicubic patch + UV texture over a textured floor.

    The patch is teapot BODY quarter 4 (8 x 6 x 8 units at (16, 6.6, 116)) —
    large and genuinely curved, so eye rays and photons actually interact
    with it (patch 0, the rim, is a 0.5-unit-thick band that subtends less
    than a pixel at test resolutions).  The patch carries the non-flat
    planet texture and the floor the marble texture: control-point
    gradients flow through the texture-UV chains (the deposit VJP's box
    kernel is a.e. position-constant by design, diff/vjp.py:13-19), so a
    scene where every surface is flat-coloured has ZERO d(image)/d(ctrl)
    almost everywhere — as an honest grad check on an untextured variant
    would report."""
    planes, spheres = _cornell_geometry()
    ctrl = _teapot_ctrl()[4:5]
    mats = [WHITE_DIFF] * 8 + [WHITE_DIFF]
    color = jnp.concatenate(
        [jnp.full((8, 3), 0.75, jnp.float32),
         jnp.asarray([[0.0, 0.999, 0.999]], jnp.float32)])
    tex = jnp.asarray([-1, -1, -1, 1, -1, -1, -1, -1, 2], jnp.int32)
    return Scene(
        planes=planes, spheres=spheres, bezier=BezierObject(ctrl=ctrl),
        materials=_materials(mats), obj_color=color, obj_tex=tex,
        atlas=_atlas(atlas_res),
        light_pos=jnp.asarray([[50.0, 60.0, 85.0]], jnp.float32),
        light_color=jnp.asarray([[5000.0] * 3], jnp.float32),
    )


def full(atlas_res: int = 256, bezier_uv_quirk: bool = True) -> Scene:
    """Config #4/#5 and the reference's exact object list (Scene.h:116-157):
    obj ids 0-4 planes, 5 mirror sphere, 6 glass sphere, 7 planet sphere,
    8 teapot."""
    planes, spheres = _cornell_geometry()
    mats = [WHITE_DIFF, WHITE_DIFF, MIRROR, WHITE_DIFF, WHITE_DIFF,
            MIRROR, REFR0, WHITE_DIFF, WHITE_DIFF]
    color = jnp.asarray(
        [(0.75, 0.25, 0.25), (0.25, 0.25, 0.75), (0.75, 0.75, 0.75),
         (0.75, 0.75, 0.75), (0.75, 0.75, 0.75),
         (0.999,) * 3, (0.999,) * 3, (0.999,) * 3,
         (0.0, 0.999, 0.999)], jnp.float32)
    tex = jnp.asarray([0, 0, -1, 1, 0, -1, -1, 2, 3], jnp.int32)
    return Scene(
        planes=planes, spheres=spheres,
        bezier=BezierObject(ctrl=_teapot_ctrl()),
        materials=_materials(mats), obj_color=color, obj_tex=tex,
        atlas=_atlas(atlas_res),
        light_pos=jnp.asarray([[50.0, 60.0, 85.0]], jnp.float32),
        light_color=jnp.asarray([[5000.0] * 3], jnp.float32),
        bezier_uv_quirk=bezier_uv_quirk,
    )


def cornell_two_lights(atlas_res: int = 64) -> Scene:
    """Two-light diffuse variant modelled on the reference's older commented
    scene (Scene.h:44-68: two SpotLights at different positions/powers) —
    exercises the multi-light emission path end to end."""
    s = cornell_diffuse(atlas_res)
    return s.replace(
        light_pos=jnp.asarray([[50.0, 60.0, 85.0], [30.0, 50.0, 120.0]],
                              jnp.float32),
        light_color=jnp.asarray([[2500.0] * 3, [1000.0, 2000.0, 2000.0]],
                                jnp.float32),
    )


def full_flat(atlas_res: int = 16, bezier_uv_quirk: bool = True) -> Scene:
    """The full reference scene with ALL textures disabled (every object uses
    its flat Obj color, the GetColor-without-texture path, Obj.h:86-88).
    This is the cross-validation scene: native/baseline_sppm.cpp implements
    exactly this object/material/color list, so the two renderers estimate
    the same integral and can be compared statistically (scripts/crossval.py)."""
    s = full(atlas_res=atlas_res, bezier_uv_quirk=bezier_uv_quirk)
    return s.replace(obj_tex=jnp.full((9,), -1, jnp.int32))


teapot = full

REGISTRY = {
    "full_flat": full_flat,
    "cornell_two_lights": cornell_two_lights,
    "cornell_diffuse": cornell_diffuse,
    "cornell_specular": cornell_specular,
    "bezier_patch": bezier_patch,
    "teapot": teapot,
    "full": full,
}


def get_scene(name: str, **kw) -> Scene:
    if name not in REGISTRY:
        raise KeyError(f"unknown scene '{name}'; have {sorted(REGISTRY)}")
    return REGISTRY[name](**kw)
