"""LBVH pipeline tests: Morton/sort, Karras topology, refit, pairing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import lbvh
from tpu_raytracing.bvh.pairing import can_form_pair, create_pairs, identity_pairs
from tpu_raytracing.bvh.types import CHILD_BOX, CHILD_TRI
from tpu_raytracing.bvh.verify import count_nodes, leaf_primitive_ids, verify_hierarchy


def _tris(scene):
    return jnp.asarray(scene.triangles)


# Eager (op-by-op) builds are ~20x slower than compiled ones; always jit.
_build = jax.jit(lbvh.build_lbvh, static_argnames="enable_pairs")


def test_sort_matches_numpy(soup):
    tris = _tris(soup)
    lo, hi = lbvh.scene_aabb(tris)
    codes, values = lbvh.generate_morton_codes(tris, lo, hi)
    sc, sv = lbvh.sort_codes(codes, values)
    np_codes = np.asarray(codes)
    order = np.argsort(np_codes, kind="stable")
    np.testing.assert_array_equal(np.asarray(sc), np_codes[order])
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(values)[order])


@pytest.mark.parametrize("num", [2, 3, 7, 64, 1000])
def test_hierarchy_is_valid_tree(num):
    rng = np.random.default_rng(num)
    tris = jnp.asarray(rng.random((num, 3, 3), np.float32) * 10)
    bvh, pairs = _build(tris)
    stats = count_nodes(bvh)
    # CountNodes (like the reference) descends only Box slots of the root
    # group, so leaves sitting directly in the root pair are not counted.
    ntype = np.asarray(bvh.type)
    root_leaves = int(np.sum(ntype[0:2] == CHILD_TRI))
    assert stats.num_leaf_nodes + root_leaves == num
    assert verify_hierarchy(bvh) == []
    # Every primitive appears in exactly one leaf.
    ids = leaf_primitive_ids(bvh, pairs)
    np.testing.assert_array_equal(ids, np.arange(num))


def test_hierarchy_with_duplicate_positions():
    # All-equal Morton codes exercise the index tie-break path (cpl on i^j).
    tris = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (33, 1, 1)))
    bvh, pairs = _build(tris)
    assert verify_hierarchy(bvh) == []
    ids = leaf_primitive_ids(bvh, pairs)
    np.testing.assert_array_equal(ids, np.arange(33))


def test_refit_root_covers_scene(soup):
    tris = _tris(soup)
    bvh, _ = _build(tris)
    lo, hi = lbvh.scene_aabb(tris)
    root_min = np.minimum(np.asarray(bvh.node_min[0]), np.asarray(bvh.node_min[1]))
    root_max = np.maximum(np.asarray(bvh.node_max[0]), np.asarray(bvh.node_max[1]))
    np.testing.assert_allclose(root_min, np.asarray(lo), rtol=1e-6)
    np.testing.assert_allclose(root_max, np.asarray(hi), rtol=1e-6)


def test_build_is_jittable(soup):
    tris = _tris(soup)
    jitted = jax.jit(lbvh.build_lbvh)
    bvh, _ = jitted(tris)
    assert verify_hierarchy(bvh) == []


def test_pairing_shared_edge_detection():
    # Two triangles sharing edge (1,0,0)-(0,1,0).
    a = jnp.asarray(np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32))
    b = jnp.asarray(np.array([[[1, 0, 0], [1, 1, 0], [0, 1, 0]]], np.float32))
    can, rot_a, rot_b = can_form_pair(a, b)
    assert bool(can[0])
    # Shared edge must become A's (v1, v2) after rotation; reconstruct:
    pairs = create_pairs(a, b, jnp.array([0]), jnp.array([1]), can)
    quad = np.asarray(
        jnp.stack([pairs.v0[0], pairs.v1[0], pairs.v2[0], pairs.v3[0]])
    )
    # Triangle A = (v0,v1,v2) must be a rotation of a; B = (v2,v1,v3) of b.
    def same_tri(t, ref):
        ref = np.asarray(ref)
        return any(
            np.array_equal(t, np.roll(ref, -r, axis=0)) for r in range(3)
        )

    assert same_tri(quad[[0, 1, 2]], np.asarray(a[0]))
    assert same_tri(quad[[2, 1, 3]], np.asarray(b[0]))


def test_pairing_no_shared_edge():
    a = jnp.asarray(np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32))
    b = jnp.asarray(np.array([[[5, 0, 0], [6, 0, 0], [5, 1, 0]]], np.float32))
    can, _, _ = can_form_pair(a, b)
    assert not bool(can[0])


def test_identity_pairs_degenerate_second():
    tris = jnp.asarray(np.random.default_rng(0).random((5, 3, 3), np.float32))
    pairs = identity_pairs(tris)
    np.testing.assert_array_equal(np.asarray(pairs.v3), np.asarray(pairs.v2))
    np.testing.assert_array_equal(np.asarray(pairs.rot_0), 0)


def test_paired_build_covers_all_primitives():
    # A grid of quads (adjacent triangle pairs share edges) -> pairing merges.
    quads = []
    for i in range(8):
        for j in range(8):
            x, y = float(i), float(j)
            quads.append([[x, y, 0], [x + 1, y, 0], [x + 1, y + 1, 0]])
            quads.append([[x, y, 0], [x + 1, y + 1, 0], [x, y + 1, 0]])
    tris = jnp.asarray(np.asarray(quads, np.float32))
    bvh, pairs = _build(tris, enable_pairs=True)
    assert verify_hierarchy(bvh) == []
    ids = leaf_primitive_ids(bvh, pairs)
    np.testing.assert_array_equal(ids, np.arange(128))
    # Pairing must reduce the leaf count below the triangle count.
    assert count_nodes(bvh).num_leaf_nodes < 128


def test_paired_build_odd_count():
    rng = np.random.default_rng(3)
    tris = jnp.asarray(rng.random((17, 3, 3), np.float32))
    bvh, pairs = _build(tris, enable_pairs=True)
    assert verify_hierarchy(bvh) == []
    ids = leaf_primitive_ids(bvh, pairs)
    np.testing.assert_array_equal(ids, np.arange(17))
