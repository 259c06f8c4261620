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


# --- spatial splits through the flagship split format (--type sah
# --splits --tracer split end-to-end; reference quality win:
# src/Multiblock.cu:200-288) ---


def _beam_scene():
    """Floor of small quads + long thin diagonal beams whose unsplit
    AABBs are huge cubes; spatial splits clip them per grid cell."""
    rng = np.random.default_rng(7)
    tris = []
    for i in range(10):
        for j in range(10):
            x, z = i * 0.1, j * 0.1
            y = 0.0
            tris.append([[x, y, z], [x + 0.09, y, z], [x, y, z + 0.09]])
            tris.append([[x + 0.09, y, z], [x + 0.09, y, z + 0.09],
                         [x, y, z + 0.09]])
    for b in range(8):
        # diagonal beam across the whole scene, slightly above the floor
        y = 0.3 + 0.02 * b
        w = 0.004
        tris.append([[0.0, y, 0.0], [1.0, y + w, 1.0], [0.0, y + w, 0.0]])
    arr = np.asarray(tris, np.float32)

    class S:
        triangles = arr
        aabb_min = arr.reshape(-1, 3).min(0)
        aabb_max = arr.reshape(-1, 3).max(0)

    return S()


@pytest.mark.parametrize("pairs", [False, True])
def test_sah_splits_flagship_matches_brute(pairs):
    """Splits build traced by the Pallas split kernel == brute force
    (duplicate window rows are legal closest-hit candidates)."""
    from tpu_raytracing.bvh.split_convert import build_sah_split_auto
    from tpu_raytracing.trace import split_pallas as sp_mod

    scene = _beam_scene()
    tris = jnp.asarray(scene.triangles)
    split, packed = build_sah_split_auto(
        tris, enable_pairs=pairs, leaf_width=16, enable_splits=True)
    check_split_capacity(split, tris.shape[0])
    camera = cam.camera_to_device(
        cam.update_camera(
            cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
    rays = generate_primary_rays(camera, 16, 8)
    views = sp_mod.prep_split_views(split, packed)
    if jax.devices()[0].platform != "tpu":
        from jax.experimental import pallas as pl

        orig = pl.pallas_call
        pl.pallas_call = functools.partial(orig, interpret=True)
        try:
            rec, _ = sp_mod.trace_rays_split_pallas(
                views, packed, rays, leafw=16)
        finally:
            pl.pallas_call = orig
    else:
        rec, _ = sp_mod.trace_rays_split_pallas(views, packed, rays, leafw=16)
    ref = brute_force_trace(tris, rays)
    # prim ids: a duplicated reference reconstructs the same primitive
    _assert_matches(rec, ref, prim=True)


def test_sah_splits_reduce_box_tests():
    """The quality win: clipped beam references cut traversal work on
    the long-thin-triangle scene (BFS tracer reports exact per-ray box
    tests; reference win: src/Multiblock.cu:200-288)."""
    scene = _beam_scene()
    tris = jnp.asarray(scene.triangles)
    camera = cam.camera_to_device(
        cam.update_camera(
            cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
    rays = generate_primary_rays(camera, 16, 16)
    totals = {}
    for splits in (False, True):
        split, packed = jax.jit(functools.partial(
            build_sah_split, enable_pairs=False, leaf_width=16,
            enable_splits=splits))(tris)
        rec, stats, overflow = trace_rays_bfs(
            prep_bfs_views(split, packed), packed, rays)
        assert not bool(overflow)
        ref = brute_force_trace(tris, rays)
        _assert_matches(rec, ref, prim=True)
        totals[splits] = int(jnp.sum(stats.box_tests))
    assert totals[True] < totals[False], totals
