"""FPS Pallas kernel vs the XLA fori-loop formulation.

The kernel runs the whole batch in ONE grid step with no aliasing, so
interpret mode is exact here (the same scope argument as the one-layer
megakernel tests). The contract is BIT-EXACT index equality: same f32
distance math, same running min, same first-index argmax tie-break.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowcompare_tpu.ops.fps import furthest_point_sampling
from flowcompare_tpu.ops.fps_pallas import fps_pallas


@pytest.mark.parametrize("b,n,m", [(2, 100, 25), (3, 1250, 312), (1, 7, 7)])
def test_fps_kernel_matches_xla(b, n, m):
    xyz = jax.random.normal(jax.random.PRNGKey(b * 131 + n), (b, n, 3))
    ref = furthest_point_sampling(xyz, m)
    got = fps_pallas(xyz, m, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fps_kernel_with_duplicate_points():
    """Ties in min-distance must break to the lowest index, like
    jnp.argmax."""
    xyz = jnp.concatenate([jnp.zeros((1, 4, 3)),
                           jnp.ones((1, 4, 3)),
                           jnp.zeros((1, 4, 3))], axis=1)
    ref = furthest_point_sampling(xyz, 6)
    got = fps_pallas(xyz, 6, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fps_kernel_extra_feature_dims_ignored():
    xyz = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 6))
    ref = furthest_point_sampling(xyz[..., :3], 16)
    got = fps_pallas(xyz, 16, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
