"""Native C++ OBJ loader vs the pure-Python parser."""

import os
import textwrap

import numpy as np
import pytest

from tpu_raytracing.scene import objio


def _write(tmp_path, name, content):
    path = os.path.join(tmp_path, name)
    with open(path, "w") as fp:
        fp.write(textwrap.dedent(content))
    return path


@pytest.fixture(scope="module")
def native():
    try:
        from tpu_raytracing.scene import native_loader

        native_loader._load_lib()
        return native_loader
    except Exception as e:  # toolchain unavailable
        pytest.skip(f"native loader unavailable: {e}")


def test_native_matches_python(tmp_path, native):
    _write(
        tmp_path,
        "scene.mtl",
        """\
        newmtl red
        Kd 1 0 0
        newmtl blue
        Kd 0 0 1
        """,
    )
    path = _write(
        tmp_path,
        "scene.obj",
        """\
        mtllib scene.mtl
        v 0 0 0
        v 1 0 0
        v 1 1 0
        v 0 1 0
        vt 0 0
        vt 1 0
        vt 1 1
        vn 0 0 1
        usemtl red
        f 1/1/1 2/2/1 3/3/1 4//1
        usemtl blue
        f -4 -3 -2
        """,
    )
    native_scene = objio.load_obj(str(path))

    # Force the pure-Python path for comparison.
    orig = objio._try_native_parse
    objio._try_native_parse = lambda f: None
    try:
        py_scene = objio.load_obj(str(path))
    finally:
        objio._try_native_parse = orig

    assert native_scene.num_triangles == py_scene.num_triangles == 3
    np.testing.assert_allclose(native_scene.triangles, py_scene.triangles)
    np.testing.assert_allclose(native_scene.uvs, py_scene.uvs)
    np.testing.assert_allclose(native_scene.normals, py_scene.normals)
    np.testing.assert_array_equal(native_scene.material_ids, py_scene.material_ids)
    np.testing.assert_array_equal(native_scene.material_ids, [0, 0, 1])


def test_native_loader_speed(tmp_path, native):
    # Big synthetic OBJ: the native parser must win by a wide margin.
    import time

    rng = np.random.default_rng(0)
    num = 40000
    with open(os.path.join(tmp_path, "big.obj"), "w") as fp:
        pts = rng.random((num * 3, 3))
        for p in pts:
            fp.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for i in range(num):
            fp.write(f"f {3*i+1} {3*i+2} {3*i+3}\n")
    path = os.path.join(tmp_path, "big.obj")

    t0 = time.perf_counter()
    scene_native = objio.load_obj(path)
    t_native = time.perf_counter() - t0

    orig = objio._try_native_parse
    objio._try_native_parse = lambda f: None
    try:
        t0 = time.perf_counter()
        scene_py = objio.load_obj(path)
        t_py = time.perf_counter() - t0
    finally:
        objio._try_native_parse = orig

    assert scene_native.num_triangles == scene_py.num_triangles == num
    np.testing.assert_allclose(scene_native.triangles, scene_py.triangles, atol=1e-6)
    assert t_native < t_py  # native must be faster
