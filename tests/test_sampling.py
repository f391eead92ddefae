"""Statistical tests for the sampling core (reference laws from Vec3.h/Obj.h)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from raytrace3_tpu.core import sampling


def test_uniform_sphere_is_unit_and_uniform(key):
    d = np.asarray(sampling.uniform_sphere(key, (20000,)))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-5)
    # z-coordinate of a uniform sphere direction is U(-1, 1): KS test.
    p = stats.kstest(d[:, 2], stats.uniform(loc=-1, scale=2).cdf).pvalue
    assert p > 1e-3, p
    # mean direction ~ 0
    assert np.linalg.norm(d.mean(0)) < 0.02


def test_cosine_hemisphere_distribution(key):
    """cos(theta) about the normal must follow p(c) = 2c on [0, 1]
    (the theta = acos(sqrt(u)) law of Vec3.h:90-98)."""
    n = jnp.asarray(np.tile([0.3, -0.5, 0.81], (20000, 1)), jnp.float32)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    d = np.asarray(sampling.cosine_hemisphere(key, n))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-4)
    c = np.sum(d * np.asarray(n), -1)
    assert (c > -1e-6).all()  # hemisphere
    # CDF of p(c)=2c is c^2
    p = stats.kstest(c, lambda x: np.clip(x, 0, 1) ** 2).pvalue
    assert p > 1e-3, p


def test_roulette_frequencies(key):
    """Branch frequencies proportional to lobe powers (Obj.h:30-45)."""
    n = 20000
    diff = jnp.full((n,), 0.6)
    refl = jnp.full((n,), 0.3)
    refr = jnp.full((n,), 0.1)
    b = np.asarray(sampling.roulette(key, diff, refl, refr))
    freq = np.bincount(b, minlength=3) / n
    np.testing.assert_allclose(freq, [0.6, 0.3, 0.1], atol=0.02)


def test_roulette_degenerate_all_zero(key):
    """All-zero powers resolve to REFR like the reference's trailing else."""
    z = jnp.zeros((8,))
    b = np.asarray(sampling.roulette(key, z, z, z))
    assert (b == 2).all()
