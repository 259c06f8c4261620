"""path_trace with the uniform grid as the bounce structure must match
the single-structure render (same geometry, exact tracers — only
traversal order differs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh.grid import build_grid, check_grid_capacity
from tpu_raytracing.bvh.lbvh import build_lbvh
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.scene.types import scene_to_device
from tpu_raytracing.trace.grid_trace import make_grid_tracer
from tpu_raytracing.trace.pathtrace import path_trace
from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs


@pytest.mark.quick
def test_grid_bounce_matches_bvh_bounce():
    scene = procedural.sphere_scene(3)
    dev_scene = scene_to_device(scene)
    camera = cam.camera_to_device(
        cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    tris = jnp.asarray(scene.triangles)
    bvh, pairs = build_lbvh(tris)
    trav, packed = pack_bvh(bvh), pack_pairs(pairs)

    grid = build_grid(packed.rows, jnp.int32(packed.rows.shape[0]))
    check_grid_capacity(grid)

    img_a, rays_a = path_trace(
        trav, packed, dev_scene, camera, 32, 32, num_bounces=2,
        key=jax.random.PRNGKey(11))
    img_b, rays_b = path_trace(
        trav, packed, dev_scene, camera, 32, 32, num_bounces=2,
        key=jax.random.PRNGKey(11),
        bounce_tracer=make_grid_tracer(),
        shadow_tracer_bounce=make_grid_tracer(any_hit=True),
        bounce_trav=grid)
    assert int(rays_a) == int(rays_b)
    np.testing.assert_allclose(
        np.asarray(img_a), np.asarray(img_b), rtol=1e-4, atol=1e-4)
