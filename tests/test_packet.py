"""Packet tracer vs scalar tracer equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracing.bvh import lbvh, sah
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.trace.packet import (
    make_tiled_packet_tracer,
    tile_permutation,
    trace_rays_packet,
)
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs, trace_rays

_lbvh = jax.jit(lbvh.build_lbvh)
_scalar = jax.jit(trace_rays)


def _compare(scene, build_fn, width=64, height=64, packet=64):
    tris = jnp.asarray(scene.triangles)
    bvh, pairs = build_fn(tris)
    trav, packed = pack_bvh(bvh), pack_pairs(pairs)
    camera = cam.camera_to_device(cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    rays = generate_primary_rays(camera, width, height)
    rec_p, stats_p = jax.jit(
        trace_rays_packet, static_argnames=("packet_size", "max_width")
    )(trav, packed, rays, packet_size=packet)
    rec_s, _ = _scalar(trav, packed, rays)
    hit_p = np.asarray(rec_p.hit)
    np.testing.assert_array_equal(hit_p, np.asarray(rec_s.hit))
    np.testing.assert_allclose(
        np.asarray(rec_p.t)[hit_p], np.asarray(rec_s.t)[hit_p], rtol=1e-6
    )
    # Same winning primitive except at exact distance ties (ordering differs).
    same = np.asarray(rec_p.prim_id) == np.asarray(rec_s.prim_id)
    assert same[hit_p].mean() > 0.999
    assert int(np.asarray(stats_p.box_tests).sum()) > 0


def test_packet_matches_scalar_lbvh(cornell):
    _compare(cornell, _lbvh)


def test_packet_matches_scalar_sah(sphere):
    _compare(sphere, jax.jit(sah.build_sah))


def test_packet_with_active_mask(cornell):
    tris = jnp.asarray(cornell.triangles)
    bvh, pairs = _lbvh(tris)
    trav, packed = pack_bvh(bvh), pack_pairs(pairs)
    camera = cam.camera_to_device(
        cam.initialise_camera(cornell.aabb_min, cornell.aabb_max)
    )
    rays = generate_primary_rays(camera, 32, 32)
    active = (jnp.arange(32 * 32) % 2) == 0
    rec, _ = trace_rays_packet(trav, packed, rays, active=active, packet_size=64)
    hit = np.asarray(rec.hit)
    assert not hit[1::2].any()  # inactive rays never hit
    assert hit[0::2].any()


def test_tile_permutation_roundtrip():
    perm, inv = tile_permutation(32, 16, tile_w=16, tile_h=8)
    x = np.arange(32 * 16)
    np.testing.assert_array_equal(np.asarray(perm)[np.asarray(inv)], x)
    # First packet covers a 16x8 block of the image.
    first = np.asarray(perm)[: 16 * 8]
    ys, xs = first // 32, first % 32
    assert ys.max() == 7 and xs.max() == 15


def test_tiled_tracer_in_render(cornell):
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace.modes import RenderType
    from tpu_raytracing.trace.render import render_frame

    tris = jnp.asarray(cornell.triangles)
    bvh, pairs = _lbvh(tris)
    trav, packed = pack_bvh(bvh), pack_pairs(pairs)
    dev = scene_to_device(cornell)
    camera = cam.camera_to_device(
        cam.initialise_camera(cornell.aabb_min, cornell.aabb_max)
    )
    tracer = make_tiled_packet_tracer(64, 64)
    img_p, _ = render_frame(trav, packed, dev, camera, 64, 64,
                            RenderType.DEPTH, tracer=tracer)
    img_s, _ = render_frame(trav, packed, dev, camera, 64, 64, RenderType.DEPTH)
    np.testing.assert_array_equal(np.asarray(img_p), np.asarray(img_s))
