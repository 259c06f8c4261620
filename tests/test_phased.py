"""Phased (packet-compaction) fat tracer equals the single-phase tracer."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracing.bvh import lbvh, wide
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.trace import wide_fat
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.traverse import pack_pairs


def _setup(scene, res):
    camera = cam.camera_to_device(
        cam.update_camera(cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    )
    tris = jnp.asarray(scene.triangles)
    bvh, prs = lbvh.build_lbvh(tris)
    packed = pack_pairs(prs)
    fat = wide.build_wide_fat(bvh, packed.rows)
    rays = generate_primary_rays(camera, res, res)
    return fat, packed, rays


def test_phased_matches_single_phase(sphere):
    fat, packed, rays = _setup(sphere, 64)
    ref = jax.jit(
        lambda: wide_fat.trace_rays_wide_fat(fat, packed, rays, packet_size=64)
    )()[0]
    got = wide_fat.trace_rays_wide_fat_phased(
        fat, packed, rays, packet_size=64, min_packets=8
    )[0]
    for f in ("hit", "t", "prim_id", "tri_id", "bary_u", "bary_v"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f)), np.asarray(getattr(got, f)), err_msg=f
        )


def test_phased_respects_active_mask(sphere):
    fat, packed, rays = _setup(sphere, 64)
    active = (jnp.arange(64 * 64) % 3) != 0
    ref = jax.jit(
        lambda: wide_fat.trace_rays_wide_fat(
            fat, packed, rays, packet_size=64, active=active
        )
    )()[0]
    got = wide_fat.trace_rays_wide_fat_phased(
        fat, packed, rays, packet_size=64, active=active, min_packets=8
    )[0]
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))


def test_phased_tiled_tracer_in_path_tracer(sphere):
    """The host-staged tracer plugs into path_trace via the host escape."""
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace.pathtrace import path_trace

    camera = cam.camera_to_device(
        cam.update_camera(cam.initialise_camera(sphere.aabb_min, sphere.aabb_max))
    )
    tris = jnp.asarray(sphere.triangles)
    bvh, prs = lbvh.build_lbvh(tris)
    packed = pack_pairs(prs)
    fat = wide.build_wide_fat(bvh, packed.rows)
    dev_scene = scene_to_device(sphere)
    res = 32
    base = wide_fat.make_tiled_fat_tracer(None, res, res, 8, 8, phased=False)
    phased = wide_fat.make_tiled_fat_tracer(None, res, res, 8, 8, phased=True)
    img0, n0 = path_trace(fat, packed, dev_scene, camera, res, res,
                          num_bounces=1, tracer=base)
    img1, n1 = path_trace(fat, packed, dev_scene, camera, res, res,
                          num_bounces=1, tracer=phased)
    assert int(n0) == int(n1)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1), atol=1e-5)
