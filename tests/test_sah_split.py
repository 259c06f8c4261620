"""SAH -> SplitBVH converter (bvh/split_convert.py): the flagship split
format built from the binned-SAH tree, validated against brute force
through BOTH split-format consumers (BFS tracer + Pallas kernel)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh.bucket import check_split_capacity
from tpu_raytracing.bvh.split_convert import build_sah_split
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.wavefront_bfs import prep_bfs_views, trace_rays_bfs


def _build(scene, enable_pairs, lw):
    tris = jnp.asarray(scene.triangles)
    split, packed = jax.jit(
        functools.partial(build_sah_split, enable_pairs=enable_pairs,
                          leaf_width=lw))(tris)
    check_split_capacity(split, tris.shape[0])
    camera = cam.camera_to_device(
        cam.update_camera(cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
    rays = generate_primary_rays(camera, 16, 8)
    return tris, split, packed, rays


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


@pytest.mark.parametrize("pairs,lw", [(False, 16), (True, 16), (False, 64)])
def test_sah_split_sphere_bfs_matches_brute(sphere, pairs, lw):
    tris, split, packed, rays = _build(sphere, pairs, lw)
    rec, _, overflow = trace_rays_bfs(
        prep_bfs_views(split, packed), packed, rays)
    assert not bool(overflow)
    _assert_matches(rec, brute_force_trace(tris, rays))


def test_sah_split_cornell_bfs(cornell):
    tris, split, packed, rays = _build(cornell, False, 16)
    rec, _, overflow = trace_rays_bfs(
        prep_bfs_views(split, packed), packed, rays)
    assert not bool(overflow)
    _assert_matches(rec, brute_force_trace(tris, rays))


def test_sah_split_pallas_kernel_matches_brute(sphere):
    from jax.experimental import pallas as pl

    from tpu_raytracing.trace import split_pallas as sp

    tris, split, packed, rays = _build(sphere, False, 16)
    views = sp.prep_split_views(split, packed)
    rec, _ = sp.trace_rays_split_pallas(views, packed, rays, leafw=16)
    _assert_matches(rec, brute_force_trace(tris, rays))
