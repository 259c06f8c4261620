"""Render-mode tests: all nine modes, BVH vs brute-force golden images."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import lbvh
from tpu_raytracing.bvh.pairing import identity_pairs
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene.types import scene_to_device
from tpu_raytracing.trace.brute import make_brute_tracer
from tpu_raytracing.trace.modes import RenderType
from tpu_raytracing.trace.render import render_frame
from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs
from tpu_raytracing.utils.compare import psnr

W = H = 64
_build = jax.jit(lbvh.build_lbvh, static_argnames="enable_pairs")


def _setup(scene):
    tris = jnp.asarray(scene.triangles)
    bvh, pairs = _build(tris)
    camera = cam.camera_to_device(cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    return tris, pack_bvh(bvh), pack_pairs(pairs), scene_to_device(scene), camera


@pytest.mark.parametrize("mode", list(RenderType)[:-1])
def test_all_modes_produce_images(cornell, mode):
    _, trav, pairs, dev, camera = _setup(cornell)
    img, tests = render_frame(trav, pairs, dev, camera, W, H, mode)
    img = np.asarray(img)
    assert img.shape == (H, W, 4)
    assert img.dtype == np.uint8
    if mode != RenderType.LODS:
        assert np.all(img[..., 3] == 255)
    # Something must be visible in every mode on the Cornell interior.
    assert img[..., 0:3].any()
    assert int(tests) > 0


@pytest.mark.parametrize(
    "mode", [RenderType.DEPTH, RenderType.MATERIAL_ID, RenderType.DIFFUSE]
)
def test_bvh_matches_brute_force_image(cornell, mode):
    tris, trav, _, dev, camera = _setup(cornell)
    img_bvh, _ = render_frame(trav, pack_pairs(identity_pairs(tris)), dev, camera,
                              W, H, mode, tracer=make_brute_tracer(tris))
    img_ref, _ = render_frame(trav, _setup(cornell)[2], dev, camera, W, H, mode)
    # Same intersection semantics -> (near-)identical images; allow 1 LSB for
    # pairing-order fp differences.
    assert psnr(np.asarray(img_bvh), np.asarray(img_ref)) > 45.0


def test_shadow_mode_darkens():
    # Ground plane + a floating occluder directly between light and ground:
    # some visible pixels must lose their diffuse/specular terms.
    import numpy as np

    from tpu_raytracing.scene.procedural import _finish
    from tpu_raytracing.scene.types import Library

    lib = Library()
    lib.add_material("m")
    lib.materials[-1].diffuse = np.array([0.8, 0.8, 0.8], np.float32)
    lib.materials[-1].ambient = np.array([0.2, 0.2, 0.2], np.float32)
    g = 4.0
    tris = np.array(
        [
            [[-g, 0, -g], [-g, 0, g], [g, 0, g]],
            [[-g, 0, -g], [g, 0, g], [g, 0, -g]],
            # occluder quad at y=2
            [[-1, 2, -1], [-1, 2, 1], [1, 2, 1]],
            [[-1, 2, -1], [1, 2, 1], [1, 2, -1]],
        ],
        np.float32,
    )
    scene = _finish(tris, np.zeros(4, np.int32), lib,
                    light=np.array([0.0, 6.0, 0.0], np.float32))
    _, trav, pairs, dev, camera = _setup(scene)
    lit, _ = render_frame(trav, pairs, dev, camera, W, H, RenderType.TEXTURE_LIT)
    shadowed, _ = render_frame(
        trav, pairs, dev, camera, W, H, RenderType.TEXTURE_LIT_SHADOWS
    )
    lit = np.asarray(lit).astype(np.int32)
    shadowed = np.asarray(shadowed).astype(np.int32)
    assert (shadowed[..., 0:3] <= lit[..., 0:3]).all()
    assert (shadowed[..., 0:3] < lit[..., 0:3]).any()


def test_depth_mode_range(cornell):
    _, trav, pairs, dev, camera = _setup(cornell)
    img, _ = render_frame(trav, pairs, dev, camera, W, H, RenderType.DEPTH)
    img = np.asarray(img)
    # Greyscale, non-constant, channels equal.
    assert np.array_equal(img[..., 0], img[..., 1])
    assert np.array_equal(img[..., 0], img[..., 2])
    assert img[..., 0].std() > 0
