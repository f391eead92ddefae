"""compact_indices == jnp.nonzero(size=..., fill_value=...) on every shape
of mask (empty, full, overflowing the cap) — the hot-path replacement must
be a bit-exact drop-in (ops/compact.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace3_tpu.ops.compact import compact_indices


@pytest.mark.parametrize("frac", [0.0, 0.03, 0.5, 1.0])
@pytest.mark.parametrize("cap_frac", [0.05, 0.6, 1.0])
def test_matches_nonzero(frac, cap_frac):
    N = 4096
    cap = max(1, int(N * cap_frac))
    mask = np.asarray(
        jax.random.uniform(jax.random.key(hash((frac, cap_frac)) % 2**31),
                           (N,)) < frac
    )
    want = jnp.nonzero(jnp.asarray(mask), size=cap, fill_value=N)[0]
    got = compact_indices(jnp.asarray(mask), cap, fill=N)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_custom_fill():
    mask = jnp.array([False, True, False, True, False])
    got = compact_indices(mask, 4, fill=99)
    np.testing.assert_array_equal(np.asarray(got), [1, 3, 99, 99])
