"""fused_sorted_pairs must be layout-identical to the legacy front
(generate_morton_codes[_pairs] + sort_codes + generate_triangles): the
pair rows ride the sort as payloads, and stable-sort tie order is
preserved by the A/B interleave, so every output matches exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import lbvh
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace.traverse import pack_pairs


def _legacy(triangles, enable_pairs):
    aabb_min, aabb_max = lbvh.scene_aabb(triangles)
    if enable_pairs:
        codes, values, num_leaves = lbvh.generate_morton_codes_pairs(
            triangles, aabb_min, aabb_max)
    else:
        codes, values = lbvh.generate_morton_codes(
            triangles, aabb_min, aabb_max)
        num_leaves = triangles.shape[0]
    sc, sv = lbvh.sort_codes(codes, values)
    pairs = lbvh.generate_triangles(sv, triangles)
    return sc, pack_pairs(pairs).rows, sv, jnp.int32(num_leaves)


@pytest.mark.quick
@pytest.mark.parametrize("enable_pairs", [False, True])
@pytest.mark.parametrize("n", [37, 640, 641])
def test_fused_front_matches_legacy(enable_pairs, n):
    scene = procedural.random_triangle_soup(n, seed=3)
    tris = jnp.asarray(scene.triangles)
    aabb_min, aabb_max = lbvh.scene_aabb(tris)
    fc, frows, fv, fn = jax.jit(
        lambda t: lbvh.fused_sorted_pairs(t, aabb_min, aabb_max,
                                          enable_pairs))(tris)
    lc, lrows, lv, ln = _legacy(tris, enable_pairs)
    assert int(fn) == int(ln)
    nl = int(ln)
    np.testing.assert_array_equal(np.asarray(fc)[:nl], np.asarray(lc)[:nl])
    np.testing.assert_array_equal(np.asarray(fv)[:nl], np.asarray(lv)[:nl])
    np.testing.assert_array_equal(
        np.asarray(frows)[:nl], np.asarray(lrows)[:nl])
