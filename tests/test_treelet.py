"""TreeletBVH structure (bvh/treelet.py): the per-lane kernel's treelet
tables validated independently of the kernel — a pure-NumPy reference
walker over the tables must match brute force on every test scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import bucket, treelet
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.ray import generate_primary_rays


def _build(scene, enable_pairs, lw=16, tcap=None):
    tris = jnp.asarray(scene.triangles)
    front = jax.jit(
        lambda t: bucket.split_front(t, enable_pairs=enable_pairs))(tris)
    if tcap is None:
        tcap = treelet.treelet_capacity(front, lw) + 8
    tb, packed = jax.jit(
        lambda f: treelet.build_treelet(f, tcap, leaf_width=lw))(front)
    treelet.check_treelet_capacity(tb)
    return tris, tb, packed


def _rays(scene, w=16, h=8):
    camera = cam.camera_to_device(
        cam.update_camera(
            cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
    return generate_primary_rays(camera, w, h)


def _walk_matches_brute(scene, enable_pairs, lw=16, tcap=None):
    tris, tb, packed = _build(scene, enable_pairs, lw, tcap)
    rays = _rays(scene)
    t, tri = treelet.reference_walk(
        tb, np.asarray(rays.origin), np.asarray(rays.direction),
        np.asarray(rays.tmin), np.asarray(rays.tmax))
    ref = brute_force_trace(tris, rays)
    hit = tri >= 0
    np.testing.assert_array_equal(hit, np.asarray(ref.hit))
    both = hit & np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.where(both, t, 0.0), np.where(both, np.asarray(ref.t), 0.0),
        rtol=1e-5)
    # the winning pair row must reconstruct the same primitive
    rows = np.asarray(packed.rows)
    second = (tri & 1).astype(bool)
    prow = rows[np.clip(tri >> 1, 0, rows.shape[0] - 1)]
    prim = np.where(second, prow[:, 13], prow[:, 12])
    np.testing.assert_array_equal(
        np.where(both, prim, 0), np.where(both, np.asarray(ref.prim_id), 0))
    return tb


def test_treelet_cornell(cornell):
    _walk_matches_brute(cornell, False)


def test_treelet_sphere(sphere):
    tb = _walk_matches_brute(sphere, False)
    assert int(tb.num_treelets) >= 1


def test_treelet_sphere_pairs(sphere):
    _walk_matches_brute(sphere, True)


def test_treelet_soup_multi(soup):
    # 2000-tri soup with a small capacity forces many treelets + portals
    tb = _walk_matches_brute(soup, True)
    assert int(tb.num_treelets) > 1  # portals actually exercised


def test_treelet_small_window(sphere):
    _walk_matches_brute(sphere, True, lw=8)


def test_treelet_capacity_guard(sphere):
    tris = jnp.asarray(sphere.triangles)
    front = jax.jit(lambda t: bucket.split_front(t, enable_pairs=False))(
        tris)
    need = treelet.treelet_capacity(front, 16)
    if need <= 1:
        pytest.skip("scene too small to overflow")
    tb, _ = jax.jit(
        lambda f: treelet.build_treelet(f, need - 1, leaf_width=16))(front)
    with pytest.raises(RuntimeError):
        treelet.check_treelet_capacity(tb)


def test_treelet_multi_round_cut(soup):
    # A tiny element budget forces the residue re-cut rounds (at 1M tris
    # the real ECAP=128 residue overflows without them): the final top
    # residue must fit and the walk must still match brute force.
    tris = jnp.asarray(soup.triangles)
    front = jax.jit(lambda t: bucket.split_front(t, enable_pairs=True))(
        tris)
    ecap = 16
    tcap = treelet.treelet_capacity(front, 8, ecap=ecap) + 8
    tb, packed = jax.jit(lambda f: treelet.build_treelet(
        f, tcap, leaf_width=8, ecap=ecap))(front)
    treelet.check_treelet_capacity(tb)
    assert int(tb.max_col) < ecap
    assert int(tb.num_treelets) > 8  # many small treelets => portals deep
    rays = _rays(soup)
    t, tri = treelet.reference_walk(
        tb, np.asarray(rays.origin), np.asarray(rays.direction),
        np.asarray(rays.tmin), np.asarray(rays.tmax))
    from tpu_raytracing.trace.brute import brute_force_trace
    ref = brute_force_trace(tris, rays)
    np.testing.assert_array_equal(tri >= 0, np.asarray(ref.hit))
    both = (tri >= 0) & np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.where(both, t, 0.0), np.where(both, np.asarray(ref.t), 0.0),
        rtol=1e-5)


def test_build_pair_tid_matches_full_build(soup):
    # the classification-only pair->treelet mapping (bench's tid-sort
    # path without the table build) must equal the full build's pair_tid
    tris = jnp.asarray(soup.triangles)
    front = jax.jit(lambda t: bucket.split_front(t, enable_pairs=True))(
        tris)
    ecap = 16  # force many treelets at soup scale
    tcap = treelet.treelet_capacity(front, 8, ecap=ecap) + 8
    tb, _ = jax.jit(lambda f: treelet.build_treelet(
        f, tcap, leaf_width=8, ecap=ecap))(front)
    pt = jax.jit(lambda f: treelet.build_pair_tid(
        f, leaf_width=8, ecap=ecap))(front)
    np.testing.assert_array_equal(np.asarray(pt), np.asarray(tb.pair_tid))


def test_capacity_error_type(sphere):
    # capacity overflows raise the DEDICATED type (so backend errors
    # like device OOM never enter build_treelet_auto's retry handler)
    tris = jnp.asarray(sphere.triangles)
    front = jax.jit(lambda t: bucket.split_front(t, enable_pairs=False))(
        tris)
    need = treelet.treelet_capacity(front, 16)
    if need <= 1:
        pytest.skip("scene too small to overflow")
    tb, _ = jax.jit(
        lambda f: treelet.build_treelet(f, need - 1, leaf_width=16))(front)
    with pytest.raises(treelet.TreeletCapacityError) as ei:
        treelet.check_treelet_capacity(tb)
    # a tcap overflow is the retryable kind
    assert not ei.value.column_overflow
    assert not isinstance(ei.value, jax.errors.JaxRuntimeError)
