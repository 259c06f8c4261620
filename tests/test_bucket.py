"""Morton-bucket wide builder: brute-force equivalence + edge cases."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracing.bvh import bucket
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace import wide_fat
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.ray import Rays, generate_primary_rays


def _check_matches_brute(scene, enable_pairs, res=64):
    camera = cam.camera_to_device(
        cam.update_camera(cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    )
    tris = jnp.asarray(scene.triangles)
    fat, packed = jax.jit(
        lambda t: bucket.build_bucket_fat(t, enable_pairs=enable_pairs)
    )(tris)
    rays = generate_primary_rays(camera, res, res)
    rec, _ = wide_fat.trace_rays_wide_fat(fat, packed, rays, packet_size=64)
    ref = brute_force_trace(tris, rays)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    both = np.asarray(rec.hit) & np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.where(both, np.asarray(rec.t), 0.0),
        np.where(both, np.asarray(ref.t), 0.0), rtol=1e-5,
    )
    np.testing.assert_array_equal(
        np.where(both, np.asarray(rec.prim_id), 0),
        np.where(both, np.asarray(ref.prim_id), 0),
    )
    return fat


def test_bucket_sphere_matches_brute(sphere):
    _check_matches_brute(sphere, False)


def test_bucket_sphere_pairs_matches_brute(sphere):
    _check_matches_brute(sphere, True)


def test_bucket_cornell_matches_brute(cornell):
    fat = _check_matches_brute(cornell, True)
    # pairing should compress the cornell quads
    assert int(fat.num_nodes) < 12


def test_bucket_soup_matches_brute(soup):
    _check_matches_brute(soup, False)


def test_bucket_duplicate_centroids():
    """All-identical Morton codes force the chunk levels to split runs."""
    rng = np.random.default_rng(0)
    num = 100
    # tiny triangles all centred at the same point: identical centroids
    offs = rng.normal(size=(num, 3, 3)).astype(np.float32) * 1e-7
    base = np.array([[0.0, 0.0, 0.0], [1e-6, 0.0, 0.0], [0.0, 1e-6, 0.0]],
                    np.float32)
    tris = jnp.asarray(base[None] + offs + np.array([5.0, 5.0, 5.0], np.float32))
    # one big triangle elsewhere so the scene AABB is non-degenerate
    big = jnp.asarray([[[0, 0, 0], [10, 0, 0], [0, 10, 0]]], jnp.float32)
    tris = jnp.concatenate([tris, big], axis=0)
    fat, packed = jax.jit(bucket.build_bucket_fat)(tris)
    # a ray through the duplicate cluster must still hit
    rays = Rays(
        origin=jnp.asarray([[5.0, 5.0, 9.0]] * 64, jnp.float32),
        direction=jnp.asarray([[0.0, 0.0, -1.0]] * 64, jnp.float32),
        tmin=jnp.zeros((64,), jnp.float32),
        tmax=jnp.full((64,), 100.0, jnp.float32),
    )
    rec, _ = wide_fat.trace_rays_wide_fat(fat, packed, rays, packet_size=64)
    ref = brute_force_trace(tris, rays)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(rec.t), np.asarray(ref.t), rtol=1e-4)


def test_bucket_phased_trace(sphere):
    camera = cam.camera_to_device(
        cam.update_camera(cam.initialise_camera(sphere.aabb_min, sphere.aabb_max))
    )
    tris = jnp.asarray(sphere.triangles)
    fat, packed = jax.jit(bucket.build_bucket_fat)(tris)
    rays = generate_primary_rays(camera, 64, 64)
    ref, _ = wide_fat.trace_rays_wide_fat(fat, packed, rays, packet_size=64)
    got, _ = wide_fat.trace_rays_wide_fat_phased(
        fat, packed, rays, packet_size=64, min_packets=8
    )
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
