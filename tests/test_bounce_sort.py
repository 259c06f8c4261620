"""Bounce compaction sort kinds must not change the rendered image —
the sort only permutes live rays (finalize un-permutes by pixel id)."""

import os

import jax
import numpy as np
import pytest

from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.scene.types import scene_to_device
from tpu_raytracing.trace import pathtrace as pt


@pytest.mark.quick
def test_leaf_sort_kind_matches_cell():
    scene = procedural.sphere_scene(3)
    dev_scene = scene_to_device(scene)
    camera = cam.camera_to_device(
        cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    from tpu_raytracing.bvh.lbvh import build_lbvh
    from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs
    import jax.numpy as jnp

    bvh, pairs = build_lbvh(jnp.asarray(scene.triangles))
    trav, packed = pack_bvh(bvh), pack_pairs(pairs)

    imgs = {}
    for kind in ("cell", "leaf"):
        os.environ["TPURT_BOUNCE_SORT"] = kind
        try:
            img, _ = pt.path_trace(
                trav, packed, dev_scene, camera, 32, 32, num_bounces=2,
                key=jax.random.PRNGKey(7))
            imgs[kind] = np.asarray(img)
        finally:
            del os.environ["TPURT_BOUNCE_SORT"]
    np.testing.assert_allclose(imgs["leaf"], imgs["cell"], atol=1e-6)


@pytest.mark.quick
def test_tid_sort_kinds_match_cell():
    # 'tid' / 'tid_cell' (pair_loc-keyed) permute live rays only; the
    # finalize un-permute must give the identical image.
    scene = procedural.sphere_scene(3)
    dev_scene = scene_to_device(scene)
    camera = cam.camera_to_device(
        cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    import jax.numpy as jnp

    from tpu_raytracing.bvh import bucket, treelet
    from tpu_raytracing.trace import split_pallas as sp

    tris = jnp.asarray(scene.triangles)
    front = jax.jit(lambda t: bucket.split_front(t, enable_pairs=True))(
        tris)
    split, packed = jax.jit(
        lambda f: bucket.emit_split(f, leaf_width=sp.LEAFW))(front)
    views = jax.jit(sp.prep_split_views)(split, packed)
    pair_loc = jax.jit(treelet.build_pair_tid)(front)
    tracer = sp.make_split_pallas_tracer(None, None, 32, 32)

    imgs = {}
    for kind in ("cell", "tid", "tid_cell"):
        os.environ["TPURT_BOUNCE_SORT"] = kind
        try:
            img, _ = pt.path_trace(
                views, packed, dev_scene, camera, 32, 32, num_bounces=2,
                key=jax.random.PRNGKey(7), tracer=tracer,
                pair_loc=pair_loc)
            imgs[kind] = np.asarray(img)
        finally:
            del os.environ["TPURT_BOUNCE_SORT"]
    np.testing.assert_allclose(imgs["tid"], imgs["cell"], atol=1e-6)
    np.testing.assert_allclose(imgs["tid_cell"], imgs["cell"], atol=1e-6)
