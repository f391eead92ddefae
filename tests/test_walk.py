"""Parity tests for the fused walk-segment Pallas kernel (ops/walk_pallas.py).

The fused path must reproduce the jnp walk (render/photon.py, render/eye.py)
on identical random streams: same deposits, same hit points, same surviving
lanes.  Run in interpret mode on the CPU mesh; tolerances are a few ULP of
f32 (the kernel's explicit mult-add chains vs XLA's einsum lowering).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace3_tpu.render.driver import build_scene
from raytrace3_tpu.render.eye import eye_pass
from raytrace3_tpu.render.photon import photon_trace, photon_trace_regen
from raytrace3_tpu.utils.config import RenderConfig

CFG = RenderConfig(scene="full", width=32, height=32, atlas_res=32,
                   max_depth=6, bezier_compact_frac=1.0)


@pytest.fixture(scope="module")
def scene():
    return build_scene(CFG)


@pytest.fixture(scope="module")
def cornell():
    return build_scene(RenderConfig(scene="cornell_diffuse", atlas_res=16))


def _rand_rays(key, n):
    ko, kd = jax.random.split(key)
    o = jax.random.uniform(ko, (n, 3), minval=5.0, maxval=95.0)
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_photon_trace_fused_parity(scene):
    key = jax.random.key(7)
    n = 512
    ke, kw = jax.random.split(key)
    o, d = _rand_rays(ke, n)
    o = jnp.broadcast_to(jnp.asarray(scene.light_pos[0]), (n, 3))
    flux = jnp.ones((n, 3)) * 4.0 * jnp.pi

    ref = jax.jit(lambda: photon_trace(scene, kw, o, d, flux, 6))()
    fus = jax.jit(lambda: photon_trace(scene, kw, o, d, flux, 6,
                                       fused=True))()

    same_valid = np.mean(np.asarray(ref.valid) == np.asarray(fus.valid))
    assert same_valid > 0.999, same_valid
    both = np.asarray(ref.valid) & np.asarray(fus.valid)
    for a, b in ((ref.pos, fus.pos), (ref.n, fus.n), (ref.flux, fus.flux)):
        a, b = np.asarray(a)[both], np.asarray(b)[both]
        close = np.isclose(a, b, rtol=1e-4, atol=1e-4).all(axis=1)
        assert close.mean() > 0.995, (1 - close.mean())


def test_photon_regen_fused_parity(scene):
    key = jax.random.key(3)
    ref = jax.jit(lambda: photon_trace_regen(
        scene, key, scene.light_pos, scene.light_color, 512, None, 6))()
    fus = jax.jit(lambda: photon_trace_regen(
        scene, key, scene.light_pos, scene.light_color, 512, None, 6,
        fused=True))()
    dr, df = ref[0], fus[0]
    # Per-lane agreement is perfect at depth <= 2 and decays only by chaotic
    # ULP amplification through specular bounces (verified depth sweep);
    # emitted counts may differ by the few diverged lanes' refill timing.
    assert abs(float(ref[2].sum()) - float(fus[2].sum())) <= 8.0
    same_valid = np.mean(np.asarray(dr.valid) == np.asarray(df.valid))
    assert same_valid > 0.995, same_valid
    both = np.asarray(dr.valid) & np.asarray(df.valid)
    a, b = np.asarray(dr.pos)[both], np.asarray(df.pos)[both]
    close = np.isclose(a, b, rtol=1e-4, atol=1e-4).all(axis=1)
    assert close.mean() > 0.99


def test_photon_fused_debias(scene):
    key = jax.random.key(11)
    ref = jax.jit(lambda: photon_trace_regen(
        scene, key, scene.light_pos, scene.light_color, 256, None, 4,
        debias_roulette=True))()
    fus = jax.jit(lambda: photon_trace_regen(
        scene, key, scene.light_pos, scene.light_color, 256, None, 4,
        debias_roulette=True, fused=True))()
    dr, df = ref[0], fus[0]
    both = np.asarray(dr.valid) & np.asarray(df.valid)
    a, b = np.asarray(dr.flux)[both], np.asarray(df.flux)[both]
    close = np.isclose(a, b, rtol=1e-3, atol=1e-3).all(axis=1)
    assert close.mean() > 0.995


@pytest.mark.parametrize("which", ["full", "cornell"])
def test_eye_fused_parity(scene, cornell, which):
    sc = scene if which == "full" else cornell
    from raytrace3_tpu.render.camera import emit_rays, look_at

    cam = look_at(jnp.array([50.0, 35.0, 230.0]),
                  jnp.array([50.0, 35.042612, 229.0]), 32, 32)
    o, d = emit_rays(cam)
    sched = ((2, 0.5),)
    ref = jax.jit(lambda: eye_pass(sc, o, d, 2048, 6,
                                   compact_schedule=sched))()
    fus = jax.jit(lambda: eye_pass(sc, o, d, 2048, 6,
                                   compact_schedule=sched, fused=True))()
    hr, sr_ = ref
    hf, sf = fus
    # Counts may differ by a few borderline lanes (ULP-level t/branch flips
    # amplified through depth-6 specular chains; see the photon tests), and
    # ONE diverged lane shifts every later packed slot — so compare the
    # per-pixel aggregate weight image, not slot-by-slot.
    assert abs(int(sr_["count"]) - int(sf["count"])) <= 4
    assert abs(int(sr_["dropped"]) - int(sf["dropped"])) <= 4

    def pix_img(hp):
        img = np.zeros((1024, 3))
        v = np.asarray(hp.valid)
        np.add.at(img, np.asarray(hp.pixel)[v], np.asarray(hp.wgt)[v])
        return img

    a, b = pix_img(hr), pix_img(hf)
    close = np.isclose(a, b, rtol=1e-3, atol=1e-4).all(axis=1)
    assert close.mean() > 0.995, (1 - close.mean())
