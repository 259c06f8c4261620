"""Sharded flagship path: split-Pallas kernel under shard_map on the
virtual 8-device CPU mesh, checked against the single-chip result."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracing.bvh.bucket import build_bucket_split
from tpu_raytracing.parallel.flagship import (
    path_trace_sharded,
    render_frame_sharded_split,
)
from tpu_raytracing.parallel.render import make_mesh
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.scene.types import scene_to_device
from tpu_raytracing.trace import split_pallas as sp
from tpu_raytracing.trace.modes import RenderType
from tpu_raytracing.trace.render import render_frame


def _setup(scene, lw=16):
    dev_scene = scene_to_device(scene)
    camera = cam.camera_to_device(
        cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    split, packed = jax.jit(
        lambda t: build_bucket_split(t, leaf_width=lw)
    )(jnp.asarray(scene.triangles))
    views = jax.jit(sp.prep_split_views)(split, packed)
    return dev_scene, camera, views, packed


def test_sharded_split_render_matches_single_chip(sphere):
    mesh = make_mesh(jax.devices()[:8])
    dev_scene, camera, views, packed = _setup(sphere)
    width, height = 32, 64  # 8 bands of 8 rows = one 16x8 packet per band
    img_sh, tests_sh = render_frame_sharded_split(
        mesh, views, packed, dev_scene, camera, width, height,
        RenderType.TEXTURE_LIT_SHADOWS, k=128)
    tracer = sp.make_split_pallas_tracer(None, None, width, height, k=128)
    img_1, tests_1 = render_frame(
        views, packed, dev_scene, camera, width, height,
        RenderType.TEXTURE_LIT_SHADOWS, tracer=tracer)
    assert np.array_equal(np.asarray(img_sh), np.asarray(img_1))
    assert int(tests_sh) > 0


def test_sharded_path_trace_matches_single_chip(sphere):
    from tpu_raytracing.trace.pathtrace import path_trace

    mesh = make_mesh(jax.devices()[:8])
    dev_scene, camera, views, packed = _setup(sphere)
    width, height = 32, 64
    img, rays_traced = path_trace_sharded(
        mesh, views, packed, dev_scene, camera, width, height,
        num_bounces=1, key=jax.random.PRNGKey(1), k=128)
    img = np.asarray(img)
    assert img.shape == (height, width, 3)
    assert np.isfinite(img).all()
    tracer = sp.make_split_pallas_tracer(None, None, width, height, k=128)
    img1, rt1 = path_trace(views, packed, dev_scene, camera, width, height,
                           num_bounces=1, key=jax.random.PRNGKey(1),
                           tracer=tracer)
    np.testing.assert_allclose(img, np.asarray(img1), rtol=1e-5, atol=1e-7)
    assert int(rays_traced) == int(rt1)


def test_sharded_instanced_matches_single_chip(sphere):
    from tpu_raytracing.bvh.lbvh import build_lbvh
    from tpu_raytracing.bvh.tlas import build_instanced
    from tpu_raytracing.parallel.flagship import trace_instanced_sharded
    from tpu_raytracing.trace.instanced import trace_rays_instanced
    from tpu_raytracing.trace.ray import generate_primary_rays
    from tpu_raytracing.trace.traverse import pack_pairs

    mesh = make_mesh(jax.devices()[:8])
    tris = jnp.asarray(sphere.triangles)
    blas, pairs = jax.jit(build_lbvh)(tris)
    packed = pack_pairs(pairs)
    n_inst = 4
    transforms = jnp.stack([
        jnp.concatenate(
            [jnp.eye(3), jnp.array([[2.5 * i], [0.0], [0.0]])], axis=1)
        for i in range(n_inst)
    ])
    inst = jax.jit(build_instanced)(blas, transforms)
    camera = cam.camera_to_device(cam.initialise_camera(
        sphere.aabb_min, sphere.aabb_max + jnp.array([2.5 * n_inst, 0, 0])))
    rays = generate_primary_rays(camera, 32, 16)
    rec_s, inst_s, _ = trace_instanced_sharded(mesh, inst, packed, rays)
    rec_1, inst_1, _ = jax.jit(trace_rays_instanced)(inst, packed, rays)
    np.testing.assert_array_equal(np.asarray(rec_s.hit), np.asarray(rec_1.hit))
    np.testing.assert_allclose(np.asarray(rec_s.t), np.asarray(rec_1.t),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(inst_s), np.asarray(inst_1))


def test_presorted_bounce_tracer_matches_tile_tracer(sphere):
    """bench.py's fused-sort config: the bounce compaction sorts rays by
    cell+octant and hands them to 'presorted' tracers; per-ray results
    must be identical to the tile-packet tracers (packet grouping cannot
    change any individual ray's hit)."""
    from tpu_raytracing.trace.pathtrace import path_trace

    dev_scene, camera, views, packed = _setup(sphere)
    width, height = 32, 64
    tracer = sp.make_split_pallas_tracer(None, None, width, height, k=128)
    base, rt0 = path_trace(views, packed, dev_scene, camera, width, height,
                           num_bounces=1, key=jax.random.PRNGKey(1),
                           tracer=tracer)
    bounce = sp.make_split_pallas_tracer(None, None, width, height, k=128,
                                         sort_mode="presorted")
    shadow_b = sp.make_split_pallas_tracer(None, None, width, height, k=128,
                                           any_hit=True,
                                           sort_mode="presorted")
    fused, rt1 = path_trace(views, packed, dev_scene, camera, width, height,
                            num_bounces=1, key=jax.random.PRNGKey(1),
                            tracer=tracer, bounce_tracer=bounce,
                            shadow_tracer_bounce=shadow_b)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=1e-5, atol=1e-7)
    assert int(rt0) == int(rt1)


def test_sharded_grid_path_trace_matches_single_chip(sphere):
    """Sharded wavefront path trace with the uniform grid (replicated)
    as the traversal structure on every band."""
    from tpu_raytracing.bvh.grid import build_grid
    from tpu_raytracing.trace.grid_trace import make_grid_tracer
    from tpu_raytracing.trace.pathtrace import path_trace

    mesh = make_mesh(jax.devices()[:8])
    dev_scene, camera, _views, packed = _setup(sphere)
    grid = build_grid(packed.rows, jnp.int32(packed.rows.shape[0]))
    width, height = 32, 64
    img, rays_traced = path_trace_sharded(
        mesh, grid, packed, dev_scene, camera, width, height,
        num_bounces=1, key=jax.random.PRNGKey(1), k=128,
        tracer_kind="grid")
    img = np.asarray(img)
    assert img.shape == (height, width, 3)
    assert np.isfinite(img).all()
    img1, rt1 = path_trace(
        grid, packed, dev_scene, camera, width, height, num_bounces=1,
        key=jax.random.PRNGKey(1), tracer=make_grid_tracer(),
        shadow_tracer=make_grid_tracer(any_hit=True))
    np.testing.assert_allclose(img, np.asarray(img1), rtol=1e-5, atol=1e-7)
    assert int(rays_traced) == int(rt1)
