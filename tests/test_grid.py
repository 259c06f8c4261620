"""Uniform-grid DDA tracer vs the brute-force oracle: identical hit sets
on every scene family (soup, terrain, cornell's grid-spanning walls via
the big list), both hit kinds, with and without pairing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh.grid import (
    build_grid_from_triangles,
    check_grid_capacity,
)
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace.brute import make_brute_tracer
from tpu_raytracing.trace.grid_trace import trace_rays_grid
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.traverse import pack_pairs
from tpu_raytracing.bvh.pairing import identity_pairs


def _scene_rays(scene, n=24):
    camera = cam.camera_to_device(
        cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    rays = jax.jit(generate_primary_rays,
                   static_argnames=("width", "height"))(camera, n, n)
    return rays


def _check(scene, enable_pairs, res=None, bounce=False):
    tris = jnp.asarray(scene.triangles)
    grid, packed = jax.jit(
        lambda t: build_grid_from_triangles(t, enable_pairs, res=res))(tris)
    check_grid_capacity(grid)
    rays = _scene_rays(scene)
    if bounce:
        # scatter ray origins/directions around the scene interior
        rng = np.random.default_rng(3)
        num = rays.origin.shape[0]
        span = np.asarray(scene.aabb_max - scene.aabb_min)
        orig = (np.asarray(scene.aabb_min) + rng.uniform(0.1, 0.9, (num, 3))
                * span).astype(np.float32)
        dirs = rng.normal(size=(num, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        rays = rays.replace(origin=jnp.asarray(orig),
                            direction=jnp.asarray(dirs))

    rec, stats = jax.jit(lambda g, p, r: trace_rays_grid(g, p, r))(
        grid, packed, rays)

    brute = make_brute_tracer(tris)
    brec, _ = brute(None, pack_pairs(identity_pairs(tris)), rays)

    rec_t = np.asarray(rec.t)
    brec_t = np.asarray(brec.t)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(brec.hit))
    np.testing.assert_allclose(rec_t, brec_t, rtol=1e-4, atol=1e-5)
    hits = np.asarray(rec.hit)
    np.testing.assert_array_equal(
        np.asarray(rec.prim_id)[hits], np.asarray(brec.prim_id)[hits])
    assert int(np.asarray(stats.tri_tests).sum()) > 0

    # any-hit: occluded iff the closest-hit oracle hit
    arec, _ = jax.jit(
        lambda g, p, r: trace_rays_grid(g, p, r, any_hit=True))(
        grid, packed, rays)
    np.testing.assert_array_equal(np.asarray(arec.hit),
                                  np.asarray(brec.hit))


@pytest.mark.quick
@pytest.mark.parametrize("enable_pairs", [False, True])
def test_grid_soup(enable_pairs):
    _check(procedural.random_triangle_soup(600, seed=5), enable_pairs)


@pytest.mark.parametrize("enable_pairs", [False, True])
def test_grid_terrain(enable_pairs):
    _check(procedural.terrain(2000), enable_pairs)


def test_grid_cornell_big_list():
    scene = procedural.cornell_box()
    tris = jnp.asarray(scene.triangles)
    grid, _ = build_grid_from_triangles(tris, False)
    # cornell's walls span the whole grid -> must ride the big list
    assert int(grid.num_big) > 0
    _check(scene, False)


def test_grid_interior_scattered_rays():
    _check(procedural.terrain(2000), True, bounce=True)


def test_grid_tiny_and_coarse():
    _check(procedural.random_triangle_soup(5, seed=1), False, res=8)
