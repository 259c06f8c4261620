"""Hybrid builder, spatial splits, and build-dispatcher tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import hybrid, sah
from tpu_raytracing.bvh.build import bu_memory_requirements, build, sah_memory_requirements
from tpu_raytracing.bvh.verify import leaf_primitive_ids, verify_hierarchy
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.modes import BuildType
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs, trace_rays

_hybrid = jax.jit(hybrid.build_hybrid, static_argnames="enable_pairs")
_sah_splits = jax.jit(
    sah.build_sah, static_argnames=("enable_pairs", "enable_splits")
)
_trace = jax.jit(trace_rays)
_brute = jax.jit(brute_force_trace)


def _check_vs_brute(scene, bvh, pairs, res=48):
    tris = jnp.asarray(scene.triangles)
    camera = cam.camera_to_device(cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    rays = generate_primary_rays(camera, res, res)
    rec, _ = _trace(pack_bvh(bvh), pack_pairs(pairs), rays)
    ref = _brute(tris, rays)
    hit = np.asarray(rec.hit)
    np.testing.assert_array_equal(hit, np.asarray(ref.hit))
    np.testing.assert_allclose(
        np.asarray(rec.t)[hit], np.asarray(ref.t)[hit], rtol=1e-5, atol=1e-6
    )


def test_hybrid_valid_and_matches_brute(soup):
    tris = jnp.asarray(soup.triangles)
    bvh, pairs = _hybrid(tris)
    assert verify_hierarchy(bvh) == []
    np.testing.assert_array_equal(
        leaf_primitive_ids(bvh, pairs), np.arange(tris.shape[0])
    )
    _check_vs_brute(soup, bvh, pairs)


def test_hybrid_paired(sphere):
    tris = jnp.asarray(sphere.triangles)
    bvh, pairs = _hybrid(tris, enable_pairs=True)
    assert verify_hierarchy(bvh) == []
    _check_vs_brute(sphere, bvh, pairs, res=32)


def test_hybrid_small_scene(cornell):
    tris = jnp.asarray(cornell.triangles)
    bvh, pairs = _hybrid(tris)
    assert verify_hierarchy(bvh) == []
    _check_vs_brute(cornell, bvh, pairs)


def test_splits_cover_all_primitives(soup):
    # Large triangles spanning grid cells get split references; every source
    # primitive must still be reachable, possibly multiple times.
    tris = jnp.asarray(soup.triangles)
    bvh, pairs = _sah_splits(tris, enable_splits=True)
    assert verify_hierarchy(bvh) == []
    ids = np.unique(leaf_primitive_ids(bvh, pairs))
    np.testing.assert_array_equal(ids, np.arange(tris.shape[0]))
    _check_vs_brute(soup, bvh, pairs)


def test_splits_emit_extra_references():
    # Skinny triangles spanning ~2 x-cells each: cheap split requests that
    # fit the num/5 extra-leaf budget (a triangle whose footprint alone
    # exceeds the whole budget is refused, as in the reference's
    # atomic-budget check, src/Multiblock.cu:225-227).
    from tpu_raytracing.bvh.splits import setup_split_leaves

    rng = np.random.default_rng(0)
    num = 100
    base = rng.random((num, 3, 3), np.float32) * 0.2
    # Spread centres over the scene in all axes so small triangles sit in one
    # y/z cell, then stretch x so each spans ~2 x-cells.
    base += rng.uniform(0, 14, (num, 1, 3)).astype(np.float32)
    base[:, 1, 0] += 6.0
    tris = jnp.asarray(base)
    leaves, _ = jax.jit(setup_split_leaves, static_argnums=1)(tris, False)
    assert int(leaves.num_leaves) > num  # extra references emitted
    assert int(leaves.num_leaves) <= num + max(num // 5, 1)


def test_splits_with_pairs(sphere):
    tris = jnp.asarray(sphere.triangles)
    bvh, pairs = _sah_splits(tris, enable_pairs=True, enable_splits=True)
    assert verify_hierarchy(bvh) == []
    _check_vs_brute(sphere, bvh, pairs, res=32)


@pytest.mark.parametrize("bt", list(BuildType))
def test_build_dispatcher(bt, cornell):
    tris = jnp.asarray(cornell.triangles)
    bvh, pairs = build(tris, bt)
    assert verify_hierarchy(bvh) == []


def test_memory_requirements_positive():
    assert sah_memory_requirements(1000) > bu_memory_requirements(1000) > 0
