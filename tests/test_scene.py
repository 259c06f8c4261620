"""Scene layer tests: OBJ/MTL loader semantics, procedural scenes, camera."""

import math
import os
import textwrap

import numpy as np

from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.scene.objio import load_obj
from tpu_raytracing.scene.types import Texture, build_texture_pool, scene_to_device


def _write(tmp_path, name, content):
    path = os.path.join(tmp_path, name)
    with open(path, "w") as fp:
        fp.write(textwrap.dedent(content))
    return path


def test_obj_fan_triangulation_and_negative_indices(tmp_path):
    # A quad becomes 2 fan triangles; negative indices are relative.
    path = _write(
        tmp_path,
        "quad.obj",
        """\
        v 0 0 0
        v 1 0 0
        v 1 1 0
        v 0 1 0
        f -4 -3 -2 -1
        """,
    )
    scene = load_obj(path)
    assert scene.num_triangles == 2
    np.testing.assert_allclose(scene.triangles[0], [[0, 0, 0], [1, 0, 0], [1, 1, 0]])
    np.testing.assert_allclose(scene.triangles[1], [[0, 0, 0], [1, 1, 0], [0, 1, 0]])
    # Flat normals generated (normalize(cross(v1-v0, v2-v1)) == +z here).
    np.testing.assert_allclose(scene.normals[0], [[0, 0, 1]] * 3, atol=1e-6)


def test_obj_indices_with_uv_and_normals(tmp_path):
    path = _write(
        tmp_path,
        "tri.obj",
        """\
        v 0 0 0
        v 2 0 0
        v 0 2 0
        vt 0 0
        vt 1 0
        vt 0 1
        vn 0 0 1
        f 1/1/1 2/2/1 3/3/1
        """,
    )
    scene = load_obj(path)
    assert scene.num_triangles == 1
    np.testing.assert_allclose(scene.uvs[0], [[0, 0], [1, 0], [0, 1]])
    np.testing.assert_allclose(scene.normals[0], [[0, 0, 1]] * 3)
    np.testing.assert_allclose(scene.aabb_min, [0, 0, 0])
    np.testing.assert_allclose(scene.aabb_max, [2, 2, 0])
    # Light defaults to the AABB centre.
    np.testing.assert_allclose(scene.light, [1, 1, 0])


def test_obj_light_txt_and_mtl(tmp_path):
    _write(tmp_path, "light.txt", "5 6 7\n")
    _write(
        tmp_path,
        "scene.mtl",
        """\
        newmtl red
        Ka 0.1 0.2 0.3
        Kd 0.9 0 0
        Ks 0.5
        Ns 32
        """,
    )
    path = _write(
        tmp_path,
        "scene.obj",
        """\
        mtllib scene.mtl
        usemtl red
        v 0 0 0
        v 1 0 0
        v 0 1 0
        f 1 2 3
        """,
    )
    scene = load_obj(path)
    np.testing.assert_allclose(scene.light, [5, 6, 7])
    assert scene.material_ids[0] == 0
    mat = scene.library.materials[0]
    np.testing.assert_allclose(mat.diffuse, [0.9, 0, 0])
    np.testing.assert_allclose(mat.specular, [0.5, 0.5, 0.5])
    assert mat.specular_exp == 32.0


def test_mip_chain_matches_box_filter():
    # 4x4 -> 2x2 -> 1x1 with exact box-filter averages.
    base = np.arange(4 * 4 * 4, dtype=np.uint8).reshape(4, 4, 4)
    tex = Texture(name="t", mips=[base])
    tex.generate_lods()
    assert tex.max_lod == 2
    assert tex.mips[1].shape == (2, 2, 4)
    expected = (
        base[0::2, 0::2].astype(np.float32)
        + base[0::2, 1::2]
        + base[1::2, 0::2]
        + base[1::2, 1::2]
    ) * 0.25
    np.testing.assert_array_equal(tex.mips[1], expected.astype(np.uint8))


def test_mip_chain_non_power_of_two():
    base = np.zeros((5, 3, 4), np.uint8)
    tex = Texture(name="t", mips=[base])
    tex.generate_lods()
    sizes = [(m.shape[0], m.shape[1]) for m in tex.mips]
    assert sizes == [(5, 3), (3, 2), (2, 1), (1, 1)]


def test_texture_pool_roundtrip():
    a = np.random.default_rng(0).integers(0, 255, (8, 4, 4), dtype=np.uint8)
    tex = Texture(name="a", mips=[a])
    tex.generate_lods()
    pool = build_texture_pool([tex])
    off = int(pool.offset[0, 0])
    w = int(pool.width[0, 0])
    got = np.asarray(pool.texels[off : off + 8 * 4]).reshape(8, 4, 4)
    np.testing.assert_array_equal(got, a)
    assert w == 4
    assert int(pool.max_lod[0]) == tex.max_lod


def test_camera_init_frames_scene():
    camera = cam.initialise_camera(np.zeros(3), np.array([2.0, 4.0, 6.0]))
    np.testing.assert_allclose(camera.position, [1, 2, 3])
    assert camera.max_depth == 6.0 * 1.5
    assert camera.scale == 6.0 / 10.0
    assert camera.yaw == math.pi / 2
    # yaw=pi/2, pitch=0 -> w = (-1, 0, 0)
    np.testing.assert_allclose(camera.w, [-1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(camera.u, [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(camera.v, [0, -1, 0], atol=1e-6)


def test_camera_pitch_clamp_and_motion():
    camera = cam.initialise_camera(np.zeros(3), np.ones(3))
    camera.pitch = 10.0
    camera = cam.update_camera(camera)
    assert camera.pitch < math.pi / 2
    pos0 = camera.position.copy()
    camera = cam.update_camera_position(camera, {"w"})
    np.testing.assert_allclose(
        camera.position, pos0 + camera.w * camera.scale * 0.25, rtol=1e-6
    )


def test_procedural_scene_shapes(cornell, sphere, soup):
    assert cornell.num_triangles == 30
    assert sphere.num_triangles == 20 * 4**3 + 2
    assert soup.num_triangles == 2000
    dev = scene_to_device(cornell)
    assert dev.normals.shape == (30, 3, 3)
    assert int(dev.num_materials) == 3
