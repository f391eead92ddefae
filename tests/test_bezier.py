"""Bezier patch tests: Bernstein vs numpy polynomials, Newton solver on an
analytically-known flat patch, derivative consistency, teapot loading
(reference behaviours cited from raytracer/Bezier.h)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from raytrace3_tpu.geometry.bezier import (
    BezierObject,
    bernstein,
    dbernstein,
    intersect_bezier,
    load_bpt,
    newton_patch_solve,
    patch_derivs,
    patch_point,
    teapot_transform,
)

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


def flat_patch(z=2.0, size=1.0):
    """A planar bicubic patch spanning [0,size]^2 at height z: S(u,v) =
    (size*u_coord, size*v_coord, z) — Newton roots are analytic."""
    g = np.linspace(0, size, 4)
    uu, vv = np.meshgrid(g, g, indexing="xy")  # ctrl[i(v), k(u)]
    ctrl = np.stack([uu, vv, np.full_like(uu, z)], -1)
    return jnp.asarray(ctrl[None], jnp.float32)  # (1, 4, 4, 3)


def test_bernstein_matches_numpy_polynomial(rng):
    t = rng.uniform(0, 1, 64).astype(np.float32)
    got = np.asarray(bernstein(jnp.asarray(t)))
    from scipy.special import comb

    want = np.stack([comb(3, i) * t**i * (1 - t) ** (3 - i) for i in range(4)], -1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    assert np.allclose(got.sum(-1), 1.0, atol=1e-5)  # partition of unity


def test_dbernstein_is_derivative(rng):
    t = rng.uniform(0.05, 0.95, 32)
    # analytic d/dt of the Bernstein polynomials, evaluated in float64 numpy
    want = np.stack(
        [
            -3 * (1 - t) ** 2,
            3 * (1 - t) ** 2 - 6 * t * (1 - t),
            6 * t * (1 - t) - 3 * t**2,
            3 * t**2,
        ],
        -1,
    )
    got = np.asarray(dbernstein(jnp.asarray(t, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_patch_point_on_flat_patch():
    ctrl = flat_patch(z=3.0, size=2.0)[0]
    u = jnp.asarray([0.0, 0.5, 1.0, 0.25])
    v = jnp.asarray([0.0, 0.5, 1.0, 0.75])
    p = np.asarray(patch_point(jnp.broadcast_to(ctrl, (4, 4, 4, 3)), u, v))
    # On this patch x tracks the u basis argument, y tracks v.
    np.testing.assert_allclose(p[:, 0], 2.0 * np.asarray(u), atol=1e-5)
    np.testing.assert_allclose(p[:, 1], 2.0 * np.asarray(v), atol=1e-5)
    np.testing.assert_allclose(p[:, 2], 3.0, atol=1e-6)


def test_patch_derivs_match_autodiff(rng):
    ctrl = jnp.asarray(rng.normal(size=(4, 4, 3)).astype(np.float32))
    u, v = 0.37, 0.62
    _, su, sv = patch_derivs(ctrl, jnp.asarray(u), jnp.asarray(v))
    ju = jax.jacfwd(lambda uu: patch_point(ctrl, uu, jnp.asarray(v)))(jnp.asarray(u))
    jv = jax.jacfwd(lambda vv: patch_point(ctrl, jnp.asarray(u), vv))(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(su), np.asarray(ju), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(jv), rtol=1e-3, atol=1e-4)


def test_newton_flat_patch_analytic():
    """Rays into a flat patch at z=2: t, u, v all analytic."""
    ctrl = flat_patch(z=2.0, size=1.0)
    org = jnp.asarray([[0.3, 0.4, 0.0], [0.9, 0.1, 1.0], [2.0, 2.0, 0.0]], jnp.float32)
    dir = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
    t, u, v, hit = newton_patch_solve(org, dir, ctrl)
    t, u, v, hit = map(np.asarray, (t, u, v, hit))
    assert hit[0, 0] and hit[1, 0]
    assert not hit[2, 0]  # (2,2) is outside the patch
    np.testing.assert_allclose(t[:2, 0], [2.0, 1.0], atol=1e-3)
    np.testing.assert_allclose(u[:2, 0], [0.3, 0.9], atol=1e-3)
    np.testing.assert_allclose(v[:2, 0], [0.4, 0.1], atol=1e-3)


def test_newton_oblique_ray():
    ctrl = flat_patch(z=2.0, size=1.0)
    d = jnp.asarray([[0.3, 0.2, 0.93]], jnp.float32)
    d = d / jnp.linalg.norm(d)
    org = jnp.asarray([[0.2, 0.3, 0.0]], jnp.float32)
    t, u, v, hit = newton_patch_solve(org, d, ctrl)
    assert bool(hit[0, 0])
    p = np.asarray(org[0] + t[0, 0] * d[0])
    np.testing.assert_allclose(p[2], 2.0, atol=1e-3)
    np.testing.assert_allclose([u[0, 0], v[0, 0]], [p[0], p[1]], atol=1e-3)


def test_intersect_bezier_normal_faces_viewer():
    ctrl = flat_patch(z=2.0)
    obj = BezierObject(ctrl=ctrl)
    org = jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32)
    dir = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t, hit, u, v, n = intersect_bezier(org, dir, obj)
    assert bool(hit[0])
    # normal flipped against the ray (Bezier.h:270)
    assert float(n[0, 2]) < 0.0
    np.testing.assert_allclose(np.abs(np.asarray(n[0])), [0, 0, 1], atol=1e-4)


def test_curved_patch_against_dense_sampling(rng):
    """Newton hit distance agrees with dense brute-force sampling of a
    genuinely curved patch."""
    base = flat_patch(z=2.0)[0]
    bump = np.zeros((4, 4, 3), np.float32)
    bump[1:3, 1:3, 2] = 0.8  # raise the middle control points
    ctrl = jnp.asarray(np.asarray(base) + bump)[None]

    org = jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32)
    dir = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t, u, v, hit = newton_patch_solve(org, dir, ctrl)
    assert bool(hit[0, 0])

    # brute force: finely sample the surface, find min distance to the ray
    g = jnp.linspace(0, 1, 400)
    uu, vv = jnp.meshgrid(g, g, indexing="ij")
    pts = patch_point(
        jnp.broadcast_to(ctrl[0], (400, 400, 4, 4, 3)), uu, vv
    ).reshape(-1, 3)
    onray = np.asarray(pts)[:, :2] - np.array([0.5, 0.5])
    close = np.linalg.norm(onray, axis=1) < 2e-3
    t_bf = np.asarray(pts)[close, 2].min()
    np.testing.assert_allclose(float(t[0, 0]), t_bf, atol=5e-3)


def test_teapot_loads_and_intersects():
    ctrl = load_bpt(
        os.path.join(ASSETS, "teapot.bpt"), scale=4.0,
        transform=teapot_transform(), translate=(20.0, 0.0, 120.0),
    )
    assert ctrl.shape == (32, 4, 4, 3)
    obj = BezierObject(ctrl=jnp.asarray(ctrl))
    lo, hi = ctrl.reshape(-1, 3).min(0), ctrl.reshape(-1, 3).max(0)
    center = (lo + hi) / 2
    # aim from the reference camera position at the teapot centre
    org = np.array([50.0, 35.0, 230.0], np.float32)
    d = center - org
    d = d / np.linalg.norm(d)
    t, hit, u, v, n = intersect_bezier(
        jnp.asarray(org)[None], jnp.asarray(d)[None], obj
    )
    assert bool(hit[0])
    p = org + float(t[0]) * d
    assert (p >= lo - 1e-2).all() and (p <= hi + 1e-2).all()
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n[0])), 1.0, rtol=1e-4)


def test_newton_differentiable_wrt_ctrl():
    """d(t)/d(ctrl) flows (BASELINE: gradients w.r.t. control points)."""
    ctrl = flat_patch(z=2.0)

    def hit_t(c):
        t, _, _, _ = newton_patch_solve(
            jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32),
            jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
            c,
        )
        return t[0, 0]

    g = jax.grad(hit_t)(ctrl)
    assert np.isfinite(np.asarray(g)).all()
    # raising the patch raises t: gradient w.r.t. z-coords must sum to ~1
    np.testing.assert_allclose(float(jnp.sum(g[..., 2])), 1.0, atol=5e-2)
