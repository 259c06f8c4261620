"""End-to-end pipeline tests: path tracer, multi-chip sharding, app shell,
graft entry points."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracing.bvh import lbvh
from tpu_raytracing.parallel.render import make_mesh, render_frame_sharded
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene.types import scene_to_device
from tpu_raytracing.trace.modes import RenderType
from tpu_raytracing.trace.pathtrace import path_trace
from tpu_raytracing.trace.render import render_frame
from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs

_build = jax.jit(lbvh.build_lbvh)


def _setup(scene):
    bvh, pairs = _build(jnp.asarray(scene.triangles))
    camera = cam.camera_to_device(cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    return pack_bvh(bvh), pack_pairs(pairs), scene_to_device(scene), camera


def test_path_trace_produces_radiance(cornell):
    trav, pairs, dev, camera = _setup(cornell)
    img, rays = path_trace(trav, pairs, dev, camera, 32, 32, num_bounces=2,
                           key=jax.random.PRNGKey(0))
    img = np.asarray(img)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.01
    # Primary + shadow per bounce: at least 2 * pixels rays traced.
    assert int(rays) >= 2 * 32 * 32


def test_path_trace_compaction_matches_uncompacted(cornell):
    trav, pairs, dev, camera = _setup(cornell)
    a, _ = path_trace(trav, pairs, dev, camera, 16, 16, num_bounces=1,
                      key=jax.random.PRNGKey(1), compaction=True)
    b, _ = path_trace(trav, pairs, dev, camera, 16, 16, num_bounces=1,
                      key=jax.random.PRNGKey(1), compaction=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_render_matches_single_chip(cornell):
    trav, pairs, dev, camera = _setup(cornell)
    mesh = make_mesh()
    n = mesh.shape[mesh.axis_names[0]]
    assert n == 8  # conftest forces 8 virtual devices
    height = 32
    img_sharded, tests_sharded = render_frame_sharded(
        mesh, trav, pairs, dev, camera, 32, height, RenderType.TEXTURE_LIT
    )
    img_single, tests_single = render_frame(
        trav, pairs, dev, camera, 32, height, RenderType.TEXTURE_LIT
    )
    np.testing.assert_array_equal(np.asarray(img_sharded), np.asarray(img_single))
    assert int(tests_sharded) == int(tests_single)


def test_graft_entry_single_chip():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    img, tests = jax.jit(fn)(*example_args)
    assert np.asarray(img).shape == (64, 64, 4)
    assert int(tests) > 0


def test_graft_entry_multichip():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_app_shell_smoke(tmp_path):
    from tpu_raytracing.app.main import main

    main([
        "--scene", "cornell", "--type", "bottom-up", "--width", "32",
        "--height", "32", "--frames", "1", "--output", str(tmp_path),
    ])
    assert any(f.endswith(".png") for f in os.listdir(tmp_path))
