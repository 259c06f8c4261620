"""BFS wavefront tracer (trace/wavefront_bfs.py): brute-force equivalence
+ capacity-overflow flag + active masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import bucket
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.wavefront_bfs import prep_bfs_views, trace_rays_bfs


def _trace(scene, enable_pairs, res=(16, 8), active=None, lw=16, **kw):
    camera = cam.camera_to_device(
        cam.update_camera(cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
    tris = jnp.asarray(scene.triangles)
    split, packed = jax.jit(
        lambda t: bucket.build_bucket_split(t, enable_pairs, leaf_width=lw)
    )(tris)
    views = prep_bfs_views(split, packed)
    rays = generate_primary_rays(camera, res[0], res[1])
    rec, stats, overflow = trace_rays_bfs(views, packed, rays, active=active,
                                          **kw)
    assert not bool(overflow)
    ref = brute_force_trace(tris, rays)
    return rec, ref, stats


def _assert_matches(rec, ref, prim=True):
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    both = np.asarray(rec.hit) & np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.where(both, np.asarray(rec.t), 0.0),
        np.where(both, np.asarray(ref.t), 0.0), rtol=1e-5)
    if prim:
        np.testing.assert_array_equal(
            np.where(both, np.asarray(rec.prim_id), 0),
            np.where(both, np.asarray(ref.prim_id), 0))


def test_bfs_cornell_matches_brute():
    rec, ref, stats = _trace(procedural.cornell_box(), False)
    _assert_matches(rec, ref)
    assert int(jnp.sum(stats.box_tests)) > 0


def test_bfs_sphere_matches_brute():
    rec, ref, _ = _trace(procedural.sphere_scene(3), False)
    _assert_matches(rec, ref)


def test_bfs_sphere_pairs_matches_brute():
    rec, ref, _ = _trace(procedural.sphere_scene(3), True, lw=16)
    _assert_matches(rec, ref)


def test_bfs_soup_matches_brute():
    rec, ref, _ = _trace(procedural.random_triangle_soup(800, seed=2), False)
    _assert_matches(rec, ref)


def test_bfs_duplicate_geometry():
    # Identical stacked triangles produce exact distance ties; hit/t must
    # still match the oracle (winner id is tie-rule-dependent).
    base = procedural.random_triangle_soup(50, seed=5)
    tris = np.tile(base.triangles[:10], (30, 1, 1))
    scene = base.replace(triangles=tris) if hasattr(base, "replace") else base
    import dataclasses

    scene = dataclasses.replace(base, triangles=tris)
    rec, ref, _ = _trace(scene, False)
    _assert_matches(rec, ref, prim=False)


def test_bfs_active_mask():
    scene = procedural.sphere_scene(2)
    camera = cam.camera_to_device(
        cam.update_camera(cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
    tris = jnp.asarray(scene.triangles)
    split, packed = jax.jit(
        lambda t: bucket.build_bucket_split(t, False)
    )(tris)
    views = prep_bfs_views(split, packed)
    rays = generate_primary_rays(camera, 16, 8)
    active = (jnp.arange(16 * 8) % 3) != 0
    rec, _, overflow = trace_rays_bfs(views, packed, rays, active=active)
    assert not bool(overflow)
    assert not np.asarray(rec.hit)[~np.asarray(active)].any()


def test_bfs_overflow_flag_fires():
    scene = procedural.sphere_scene(3)
    camera = cam.camera_to_device(
        cam.update_camera(cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
    tris = jnp.asarray(scene.triangles)
    split, packed = jax.jit(
        lambda t: bucket.build_bucket_split(t, False)
    )(tris)
    views = prep_bfs_views(split, packed)
    rays = generate_primary_rays(camera, 16, 8)
    _, _, overflow = trace_rays_bfs(views, packed, rays,
                                    cap_factor=0.05, leaf_factor=0.02,
                                    cap_floor=8)
    assert bool(overflow)


def test_bfs_any_hit_matches_closest_hit_flags():
    scene = procedural.sphere_scene(3)
    camera = cam.camera_to_device(
        cam.update_camera(cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
    tris = jnp.asarray(scene.triangles)
    split, packed = jax.jit(
        lambda t: bucket.build_bucket_split(t, False)
    )(tris)
    views = prep_bfs_views(split, packed)
    rays = generate_primary_rays(camera, 16, 8)
    closest, _, _ = trace_rays_bfs(views, packed, rays)
    occl, _, overflow = trace_rays_bfs(views, packed, rays, any_hit=True)
    assert not bool(overflow)
    np.testing.assert_array_equal(np.asarray(occl.hit),
                                  np.asarray(closest.hit))
