"""Real file-based asset through the FULL pipeline: generated bunny-class
OBJ (+MTL +texture +light.txt) -> loader (python & native) -> build ->
all-mode render -> PSNR vs the brute-force oracle (VERDICT round-1 gap:
every test scene was procedural arrays; no .obj exercised the pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.scene.genasset import generate_rock
from tpu_raytracing.scene.objio import load_obj


@pytest.fixture(scope="module")
def rock_path(tmp_path_factory):
    out = tmp_path_factory.mktemp("asset")
    return generate_rock(str(out), subdivisions=3, seed=7, tex_size=64)


@pytest.fixture(scope="module")
def rock_scene(rock_path):
    return load_obj(rock_path)


def test_asset_loads_with_materials_and_texture(rock_scene):
    s = rock_scene
    assert s.num_triangles == 20 * 4 ** 3 + 2  # sphere + fan-split quad
    assert len(s.library.materials) == 2
    assert len(s.library.textures) >= 1
    assert s.library.textures[0].mips[0].shape[0] == 64
    # light.txt was picked up (not the AABB-centre fallback)
    assert abs(float(s.light[1]) - 3.999) < 1e-3


def test_native_loader_matches_python(rock_path, monkeypatch):
    from tpu_raytracing.scene import native_loader, objio

    try:
        native_loader._load_lib()
    except Exception as e:  # toolchain unavailable
        pytest.skip(f"native loader unavailable: {e}")
    ns = load_obj(rock_path)  # auto-native fast path
    monkeypatch.setattr(objio, "_try_native_parse", lambda _: None)
    ps = load_obj(rock_path)  # pure-python parser
    assert ns.num_triangles == ps.num_triangles
    np.testing.assert_allclose(ns.triangles, ps.triangles, rtol=1e-6)
    np.testing.assert_allclose(ns.aabb_min, ps.aabb_min, rtol=1e-5)
    assert len(ns.library.materials) == len(ps.library.materials)


def test_asset_renders_all_key_modes(rock_scene):
    from tpu_raytracing.bvh.lbvh import build_lbvh
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace.modes import RenderType
    from tpu_raytracing.trace.render import render_frame
    from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs

    s = rock_scene
    dev = scene_to_device(s)
    camera = cam.camera_to_device(cam.initialise_camera(s.aabb_min, s.aabb_max))
    bvh, pairs = jax.jit(build_lbvh)(jnp.asarray(s.triangles))
    trav, packed = pack_bvh(bvh), pack_pairs(pairs)
    for mode in (RenderType.DEPTH, RenderType.TEXTURE,
                 RenderType.TEXTURE_LIT_SHADOWS):
        img, tests = render_frame(trav, packed, dev, camera, 32, 32, mode)
        img = np.asarray(img)
        assert img.shape == (32, 32, 4)
        assert (img[..., :3] > 0).any(), mode


def test_asset_matches_brute_force_psnr(rock_scene):
    from tpu_raytracing.bvh.lbvh import build_lbvh
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace.brute import make_brute_tracer
    from tpu_raytracing.trace.modes import RenderType
    from tpu_raytracing.trace.ray import generate_primary_rays, ray_spread
    from tpu_raytracing.trace.render import shade_rays
    from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs
    from tpu_raytracing.utils.compare import psnr

    s = rock_scene
    dev = scene_to_device(s)
    camera = cam.camera_to_device(cam.initialise_camera(s.aabb_min, s.aabb_max))
    bvh, pairs = jax.jit(build_lbvh)(jnp.asarray(s.triangles))
    trav, packed = pack_bvh(bvh), pack_pairs(pairs)
    rays = generate_primary_rays(camera, 32, 32)
    img_bvh, _ = shade_rays(trav, packed, dev, camera, rays, ray_spread(32),
                            RenderType.TEXTURE_LIT_SHADOWS)
    img_ref, _ = shade_rays(trav, packed, dev, camera, rays, ray_spread(32),
                            RenderType.TEXTURE_LIT_SHADOWS,
                            tracer=make_brute_tracer(
                                jnp.asarray(s.triangles)))
    value = psnr(np.asarray(img_bvh)[..., :3], np.asarray(img_ref)[..., :3])
    assert value >= 40.0, value
