"""Host-stepped SAH frontier must produce the exact same tree as the
while_loop form (same per-level math, different loop driver)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh.split_convert import build_sah_split
from tpu_raytracing.scene import procedural


@pytest.mark.quick
@pytest.mark.parametrize("enable_pairs", [False, True])
def test_host_stepped_sah_matches_while_loop(enable_pairs):
    scene = procedural.sphere_scene(3)
    tris = jnp.asarray(scene.triangles)
    s1, p1 = jax.jit(lambda t: build_sah_split(
        t, enable_pairs=enable_pairs, leaf_width=16))(tris)
    s2, p2 = build_sah_split(
        tris, enable_pairs=enable_pairs, leaf_width=16, host_stepped=True)
    np.testing.assert_array_equal(np.asarray(s1.inner), np.asarray(s2.inner))
    np.testing.assert_array_equal(np.asarray(p1.rows), np.asarray(p2.rows))
    assert int(s1.num_inner) == int(s2.num_inner)
    assert int(s1.num_leaves) == int(s2.num_leaves)
