"""8-wide BVH collapse + wide packet traversal vs the scalar tracer."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracing.bvh import lbvh, sah, wide
from tpu_raytracing.bvh.types import CHILD_BOX, CHILD_NONE, CHILD_TRI
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs, trace_rays
from tpu_raytracing.trace.wide_packet import trace_rays_wide

_lbvh = jax.jit(lbvh.build_lbvh)
_wide = jax.jit(wide.build_wide)
_scalar = jax.jit(trace_rays)
_tw = jax.jit(trace_rays_wide, static_argnames="packet_size")


def _leaf_pairs_of_wide(w, num_pairs):
    """Collect (pair index, count) of every Tri entry reachable from root 0."""
    rows = np.asarray(w.rows).reshape(-1, wide.WIDE, 8)
    seen = []
    stack = [0]
    visited = set()
    while stack:
        nid = stack.pop()
        if nid in visited:
            continue
        visited.add(nid)
        for e in range(wide.WIDE):
            meta = rows[nid, e, 6]
            ntype = meta & 3
            child = meta >> 5
            if ntype == CHILD_TRI:
                seen.append(child)
            elif ntype == CHILD_BOX:
                stack.append(child)
    return np.sort(np.asarray(seen))


def test_wide_collapse_preserves_leaves(soup):
    tris = jnp.asarray(soup.triangles)
    bvh, pairs = _lbvh(tris)
    w = _wide(bvh)
    leaf_pairs = _leaf_pairs_of_wide(w, pairs.v0.shape[0])
    # Every pair appears exactly once.
    np.testing.assert_array_equal(leaf_pairs, np.arange(tris.shape[0]))


def test_wide_collapse_sah(cornell):
    tris = jnp.asarray(cornell.triangles)
    bvh, pairs = jax.jit(sah.build_sah)(tris)
    w = _wide(bvh)
    leaf_pairs = _leaf_pairs_of_wide(w, pairs.v0.shape[0])
    np.testing.assert_array_equal(np.unique(leaf_pairs), np.arange(tris.shape[0]))


def _compare(scene, width=64, height=64, packet=64, enable_pairs=False):
    tris = jnp.asarray(scene.triangles)
    bvh, pairs = jax.jit(lbvh.build_lbvh, static_argnames="enable_pairs")(
        tris, enable_pairs=enable_pairs
    )
    w = _wide(bvh)
    packed = pack_pairs(pairs)
    camera = cam.camera_to_device(cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    rays = generate_primary_rays(camera, width, height)
    rec_w, stats_w = _tw(w, packed, rays, packet_size=packet)
    rec_s, _ = _scalar(pack_bvh(bvh), packed, rays)
    hit = np.asarray(rec_w.hit)
    np.testing.assert_array_equal(hit, np.asarray(rec_s.hit))
    np.testing.assert_allclose(
        np.asarray(rec_w.t)[hit], np.asarray(rec_s.t)[hit], rtol=1e-6
    )
    same = np.asarray(rec_w.prim_id) == np.asarray(rec_s.prim_id)
    assert same[hit].mean() > 0.999


def test_wide_trace_matches_scalar(cornell):
    _compare(cornell)


def test_wide_trace_matches_scalar_sphere(sphere):
    _compare(sphere, width=32, height=32)


def test_wide_trace_paired(sphere):
    _compare(sphere, width=32, height=32, enable_pairs=True)


def test_wide_trace_tiny_scene():
    # Single triangle: root group itself is a leaf.
    tris = jnp.asarray(np.array([[[0, 0, 5], [1, 0, 5], [0, 1, 5]],
                                 [[0, 0, 6], [1, 0, 6], [0, 1, 6]]], np.float32))
    bvh, pairs = _lbvh(tris)
    w = _wide(bvh)
    from tpu_raytracing.trace.ray import Rays

    rays = Rays(
        origin=jnp.zeros((64, 3)),
        direction=jnp.tile(jnp.array([[0.05, 0.05, 1.0]]), (64, 1)),
        tmin=jnp.full((64,), 1e-5),
        tmax=jnp.full((64,), 100.0),
    )
    rec, _ = _tw(w, pack_pairs(pairs), rays, packet_size=64)
    assert bool(np.asarray(rec.hit).all())
    # Unnormalized direction with dir.z == 1: the z=5 plane is hit at t == 5.
    np.testing.assert_allclose(np.asarray(rec.t), 5.0, atol=1e-5)
