"""Implicit (complete-heap) LBVH builder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import implicit, lbvh
from tpu_raytracing.bvh.verify import leaf_primitive_ids, verify_hierarchy
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs, trace_rays
from tpu_raytracing.trace.wide_fat import trace_rays_wide_fat

_build = jax.jit(implicit.build_implicit)
_build_wide = jax.jit(implicit.build_implicit_wide_fat)
_scalar = jax.jit(trace_rays)


@pytest.mark.parametrize("num", [2, 3, 33, 1000])
def test_implicit_valid_tree(num):
    rng = np.random.default_rng(num)
    tris = jnp.asarray(rng.random((num, 3, 3), np.float32) * 10)
    bvh, pairs = _build(tris)
    assert verify_hierarchy(bvh) == []
    np.testing.assert_array_equal(leaf_primitive_ids(bvh, pairs), np.arange(num))


def test_implicit_matches_karras_hits(sphere):
    tris = jnp.asarray(sphere.triangles)
    camera = cam.camera_to_device(cam.initialise_camera(sphere.aabb_min, sphere.aabb_max))
    rays = generate_primary_rays(camera, 48, 48)
    bvh_i, pairs_i = _build(tris)
    rec_i, _ = _scalar(pack_bvh(bvh_i), pack_pairs(pairs_i), rays)
    bvh_k, pairs_k = jax.jit(lbvh.build_lbvh)(tris)
    rec_k, _ = _scalar(pack_bvh(bvh_k), pack_pairs(pairs_k), rays)
    hi, hk = np.asarray(rec_i.hit), np.asarray(rec_k.hit)
    np.testing.assert_array_equal(hi, hk)
    np.testing.assert_allclose(
        np.asarray(rec_i.t)[hi], np.asarray(rec_k.t)[hi], rtol=1e-6
    )


def test_implicit_wide_fat_matches_scalar(cornell):
    tris = jnp.asarray(cornell.triangles)
    fat, pairs, bvh = _build_wide(tris)
    camera = cam.camera_to_device(
        cam.initialise_camera(cornell.aabb_min, cornell.aabb_max)
    )
    rays = generate_primary_rays(camera, 64, 64)
    rec_f, _ = jax.jit(trace_rays_wide_fat, static_argnames="packet_size")(
        fat, pack_pairs(pairs), rays, packet_size=64
    )
    rec_s, _ = _scalar(pack_bvh(bvh), pack_pairs(pairs), rays)
    hit = np.asarray(rec_f.hit)
    np.testing.assert_array_equal(hit, np.asarray(rec_s.hit))
    np.testing.assert_allclose(
        np.asarray(rec_f.t)[hit], np.asarray(rec_s.t)[hit], rtol=1e-6
    )


def test_implicit_non_power_of_two_padding():
    # 33 leaves -> cap 64: padding leaves must be unreachable.
    rng = np.random.default_rng(1)
    tris = jnp.asarray(rng.random((33, 3, 3), np.float32))
    bvh, pairs = _build(tris)
    ntype = np.asarray(bvh.type)
    cap = 64
    leaf_slots = np.arange(cap, 2 * cap)
    from tpu_raytracing.bvh.types import CHILD_NONE, CHILD_TRI

    assert (ntype[leaf_slots[:33]] == CHILD_TRI).all()
    assert (ntype[leaf_slots[33:]] == CHILD_NONE).all()
