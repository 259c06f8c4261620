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


def test_emit_split_views_bit_identical(sphere, soup):
    """The fused view emit (rebuild trim: entry scatter straight into the
    padded kernel layouts) must be bit-identical to the unfused
    prep_split_views(*emit_split(front)) pipeline on every output."""
    from tpu_raytracing.trace import split_pallas as sp

    for scene, lw in [(sphere, 16), (soup, 32)]:
        tris = jnp.asarray(scene.triangles)
        front = jax.jit(
            lambda t: bucket.split_front(t, enable_pairs=True))(tris)
        split_u, packed_u = jax.jit(
            lambda f, lw=lw: bucket.emit_split(f, leaf_width=lw))(front)
        views_u = sp.prep_split_views(split_u, packed_u)
        views_f, packed_f, split_f = jax.jit(
            lambda f, lw=lw: bucket.emit_split_views(f, leaf_width=lw))(front)
        for a, b, name in zip(views_u, views_f,
                              ("inner_i", "inner_v", "pairs_f")):
            np.testing.assert_array_equal(
                np.asarray(a).view(np.int32), np.asarray(b).view(np.int32),
                err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(packed_u.rows), np.asarray(packed_f.rows))
        np.testing.assert_array_equal(
            np.asarray(split_u.inner), np.asarray(split_f.inner))
        np.testing.assert_array_equal(
            np.asarray(split_u.e_ranges), np.asarray(split_f.e_ranges))
        assert int(split_u.num_inner) == int(split_f.num_inner)
        assert int(split_u.max_slot) == int(split_f.max_slot)
