"""Binned-SAH builder tests: structure, coverage, traversal equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import sah
from tpu_raytracing.bvh.verify import count_nodes, leaf_primitive_ids, verify_hierarchy
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs, trace_rays

_build = jax.jit(sah.build_sah, static_argnames=("enable_pairs", "enable_splits"))
_trace = jax.jit(trace_rays)
_brute = jax.jit(brute_force_trace)


@pytest.mark.parametrize("num", [1, 2, 3, 5, 33, 1000])
def test_sah_valid_tree_and_coverage(num):
    rng = np.random.default_rng(num)
    tris = jnp.asarray(rng.random((num, 3, 3), np.float32) * 10)
    bvh, pairs = _build(tris)
    assert int(bvh.root) == 0 and int(bvh.root_count) == 1
    assert verify_hierarchy(bvh) == []
    ids = leaf_primitive_ids(bvh, pairs)
    np.testing.assert_array_equal(ids, np.arange(num))


def test_sah_duplicate_positions_midpoint_fallback():
    # All triangles identical -> degenerate centroid bounds everywhere.
    tris = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (37, 1, 1)))
    bvh, pairs = _build(tris)
    assert verify_hierarchy(bvh) == []
    np.testing.assert_array_equal(leaf_primitive_ids(bvh, pairs), np.arange(37))


def test_sah_paired(sphere):
    tris = jnp.asarray(sphere.triangles)
    bvh, pairs = _build(tris, enable_pairs=True)
    assert verify_hierarchy(bvh) == []
    ids = leaf_primitive_ids(bvh, pairs)
    np.testing.assert_array_equal(ids, np.arange(tris.shape[0]))
    # Pairing must reduce leaves (sphere mesh has many shared edges).
    stats = count_nodes(bvh)
    assert stats.num_leaf_nodes < tris.shape[0]


def _check_traversal(scene, **kwargs):
    tris = jnp.asarray(scene.triangles)
    bvh, pairs = _build(tris, **kwargs)
    camera = cam.camera_to_device(cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    rays = generate_primary_rays(camera, 48, 48)
    rec, stats = _trace(pack_bvh(bvh), pack_pairs(pairs), rays)
    ref = _brute(tris, rays)
    hit = np.asarray(rec.hit)
    np.testing.assert_array_equal(hit, np.asarray(ref.hit))
    np.testing.assert_allclose(
        np.asarray(rec.t)[hit], np.asarray(ref.t)[hit], rtol=1e-5, atol=1e-6
    )
    return stats


def test_sah_traversal_matches_brute(cornell):
    _check_traversal(cornell)


def test_sah_traversal_matches_brute_soup(soup):
    _check_traversal(soup)


def test_sah_traversal_paired(cornell):
    _check_traversal(cornell, enable_pairs=True)


def test_sah_tree_quality_beats_worst_case(soup):
    # SAH tree should need far fewer box tests than a random-order LBVH
    # over-split would: sanity bound on mean traversal cost.
    stats = _check_traversal(soup)
    assert float(np.asarray(stats.box_tests).mean()) < 200.0
