"""Unit tests for core vector math vs closed-form reference formulas
(reference behaviours cited from raytracer/Vec3.h)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace3_tpu.core import vecmath as vm


def test_reflect_matches_formula(rng):
    d = rng.normal(size=(64, 3)).astype(np.float32)
    n = rng.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    got = np.asarray(vm.reflect(jnp.asarray(d), jnp.asarray(n)))
    want = d - 2 * np.sum(d * n, -1, keepdims=True) * n
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_reflect_preserves_length_and_flips_normal_component(rng):
    d = rng.normal(size=(32, 3)).astype(np.float32)
    n = rng.normal(size=(32, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    r = np.asarray(vm.reflect(jnp.asarray(d), jnp.asarray(n)))
    np.testing.assert_allclose(
        np.linalg.norm(r, axis=-1), np.linalg.norm(d, axis=-1), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.sum(r * n, -1), -np.sum(d * n, -1), rtol=1e-4, atol=1e-5
    )


def test_refract_snell_law(rng):
    """Check Snell's law sin(theta_t) = eta sin(theta_i) for non-TIR rays."""
    n = np.array([0.0, 0.0, 1.0], np.float32)
    theta_i = np.linspace(0.01, 1.0, 16)  # below TIR for eta=1/1.5
    d = np.stack([np.sin(theta_i), np.zeros_like(theta_i), -np.cos(theta_i)], -1)
    eta = 1 / 1.5
    t = np.asarray(vm.refract(jnp.asarray(d, jnp.float32), jnp.asarray(np.tile(n, (16, 1))), eta))
    sin_t = np.linalg.norm(np.cross(t, np.tile(n, (16, 1))), axis=-1) / np.linalg.norm(t, axis=-1)
    np.testing.assert_allclose(sin_t, eta * np.sin(theta_i), rtol=1e-4, atol=1e-5)


def test_refract_total_internal_reflection():
    """Dense-to-sparse beyond the critical angle must return the mirror
    reflection (Vec3.h:131-133)."""
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    theta = 0.9  # > asin(1/1.5) = 0.7297
    d = jnp.asarray([[np.sin(theta), 0.0, -np.cos(theta)]], jnp.float32)
    got = vm.refract(d, n, 1.5)
    want = vm.reflect(d, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_rotate_matches_rodrigues(rng):
    v = rng.normal(size=(16, 3)).astype(np.float32)
    axis = rng.normal(size=(16, 3)).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    ang = rng.uniform(0.1, 3.0, size=16).astype(np.float32)
    got = np.asarray(vm.rotate(jnp.asarray(v), jnp.asarray(axis), jnp.asarray(ang)))
    c, s = np.cos(ang)[:, None], np.sin(ang)[:, None]
    want = (
        v * c
        + np.cross(axis, v) * s
        + axis * np.sum(axis * v, -1, keepdims=True) * (1 - c)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # rotation preserves length
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=-1), np.linalg.norm(v, axis=-1), rtol=1e-4
    )


def test_anormal_orthogonal(rng):
    v = rng.normal(size=(64, 3)).astype(np.float32)
    a = np.asarray(vm.anormal(jnp.asarray(v)))
    np.testing.assert_allclose(np.sum(a * v, -1), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(a, axis=-1), 1.0, rtol=1e-5)
    # degenerate xy -> (1,0,0) (Vec3.h:87)
    a0 = np.asarray(vm.anormal(jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)))
    np.testing.assert_allclose(a0, [[1.0, 0.0, 0.0]])


def test_any_near_zero_quirk():
    """The reference lobe predicate is ANY-channel-near-zero (Vec3.h:72-79)."""
    v = jnp.asarray([[0.5, 0.5, 0.5], [0.5, 0.0, 0.5], [1e-5, 1.0, 1.0]])
    got = np.asarray(vm.any_near_zero(v))
    np.testing.assert_array_equal(got, [False, True, True])


def test_orthonormal_frame(rng):
    n = rng.normal(size=(128, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t, b = vm.orthonormal_frame(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    np.testing.assert_allclose(np.sum(t * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(b * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(t * b, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1.0, rtol=1e-5)
