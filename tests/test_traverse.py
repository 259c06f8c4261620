"""BVH traversal vs brute-force oracle: hits, depths, primitive ids."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracing.bvh import lbvh
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs, trace_rays

_build = jax.jit(lbvh.build_lbvh, static_argnames="enable_pairs")
_trace = jax.jit(trace_rays)
_brute = jax.jit(brute_force_trace)


def _camera_rays(scene, width=64, height=64):
    camera = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    return generate_primary_rays(cam.camera_to_device(camera), width, height)


def _check_scene(scene, enable_pairs=False, width=64, height=64):
    tris = jnp.asarray(scene.triangles)
    rays = _camera_rays(scene, width, height)
    bvh, pairs = _build(tris, enable_pairs=enable_pairs)
    rec, stats = _trace(pack_bvh(bvh), pack_pairs(pairs), rays)
    ref = _brute(tris, rays)

    hit = np.asarray(rec.hit)
    np.testing.assert_array_equal(hit, np.asarray(ref.hit))
    # Depth must match exactly where the same triangle wins; allow fp32
    # round-off where pairing rotated the winning triangle's vertex order.
    np.testing.assert_allclose(
        np.asarray(rec.t)[hit], np.asarray(ref.t)[hit], rtol=1e-5, atol=1e-6
    )
    if not enable_pairs:
        np.testing.assert_array_equal(
            np.asarray(rec.prim_id)[hit], np.asarray(ref.prim_id)[hit]
        )
    return rec, stats


def test_cornell_matches_brute_force(cornell):
    rec, stats = _check_scene(cornell)
    assert np.asarray(rec.hit).mean() > 0.9  # camera inside the box
    assert int(np.asarray(stats.box_tests).max()) > 0


def test_sphere_scene_matches_brute_force(sphere):
    _check_scene(sphere)


def test_soup_matches_brute_force(soup):
    _check_scene(soup, width=32, height=32)


def test_paired_traversal_matches_brute_force(cornell):
    _check_scene(cornell, enable_pairs=True)


def test_paired_sphere(sphere):
    _check_scene(sphere, enable_pairs=True, width=32, height=32)


def test_counters_are_reasonable(cornell):
    rec, stats = _check_scene(cornell)
    box = np.asarray(stats.box_tests)
    tri = np.asarray(stats.tri_tests)
    # Traversal must do far fewer triangle tests than brute force (30/tri).
    assert tri.mean() < 30
    assert box.mean() > 0
