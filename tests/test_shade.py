"""Shading-stack unit tests: HSV, rotation, sampling, LOD, TBN."""

import jax.numpy as jnp
import numpy as np

from tpu_raytracing.scene.types import Texture, build_texture_pool
from tpu_raytracing.trace import shade


def _pool_from(arr):
    tex = Texture(name="t", mips=[np.asarray(arr, np.uint8)])
    tex.generate_lods()
    return build_texture_pool([tex])


def test_hsv_to_rgb_primaries():
    h = jnp.array([0.0, 1 / 3, 2 / 3])
    rgb = np.asarray(shade.hsv_to_rgb(h, jnp.ones(3), jnp.ones(3)))
    np.testing.assert_allclose(rgb[0], [255, 0, 0], atol=1)
    np.testing.assert_allclose(rgb[1], [0, 255, 0], atol=1)
    np.testing.assert_allclose(rgb[2], [0, 0, 255], atol=1)


def test_rotate_attributes_permutations():
    normals = jnp.arange(18, dtype=jnp.float32).reshape(2, 3, 3)
    uvs = jnp.arange(12, dtype=jnp.float32).reshape(2, 3, 2)
    rot = jnp.array([1, 2])
    n, u = shade.rotate_attributes(normals, uvs, rot)
    # rot 1 -> (2, 0, 1); rot 2 -> (1, 2, 0)  (src/Tracer.cu:57-82)
    np.testing.assert_array_equal(np.asarray(n[0]), np.asarray(normals[0])[[2, 0, 1]])
    np.testing.assert_array_equal(np.asarray(u[1]), np.asarray(uvs[1])[[1, 2, 0]])


def test_bilinear_sample_texel_centers():
    # 2x2 texture; sampling at texel centers must return the exact texel.
    tex = np.zeros((2, 2, 4), np.uint8)
    tex[0, 0] = (10, 0, 0, 255)   # top-left in image space
    tex[0, 1] = (20, 0, 0, 255)
    tex[1, 0] = (30, 0, 0, 255)
    tex[1, 1] = (40, 0, 0, 255)
    pool = _pool_from(tex)
    t0 = jnp.zeros((4,), jnp.int32)
    # Reference BilinearSample flips v: uv (0.25, 0.25) lands on image row 1.
    uv = jnp.array([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]])
    smp = np.asarray(shade.bilinear_sample(pool, t0, uv, jnp.zeros((4,), jnp.int32)))
    np.testing.assert_array_equal(smp[:, 0], [30, 40, 10, 20])


def test_trilinear_blends_mips():
    tex = np.full((4, 4, 4), 100, np.uint8)
    tex[:2] = 200  # asymmetric so mip1 differs from mip0 regions
    pool = _pool_from(tex)
    t0 = jnp.zeros((1,), jnp.int32)
    uv = jnp.array([[0.5, 0.75]])
    s_lod0 = np.asarray(shade.trilinear_sample(pool, t0, uv, jnp.array([0.0])))
    s_lod1 = np.asarray(shade.trilinear_sample(pool, t0, uv, jnp.array([1.0])))
    s_half = np.asarray(shade.trilinear_sample(pool, t0, uv, jnp.array([0.5])))
    lo = np.minimum(s_lod0[0, 0], s_lod1[0, 0])
    hi = np.maximum(s_lod0[0, 0], s_lod1[0, 0])
    assert lo <= s_half[0, 0] <= hi


def test_compute_lod_increases_with_distance():
    tex = np.zeros((256, 256, 4), np.uint8)
    pool = _pool_from(tex)
    t0 = jnp.zeros((2,), jnp.int32)
    v0 = jnp.tile(jnp.array([[-1.0, -1.0, 0.0]]), (2, 1))
    v1 = jnp.tile(jnp.array([[1.0, -1.0, 0.0]]), (2, 1))
    v2 = jnp.tile(jnp.array([[-1.0, 1.0, 0.0]]), (2, 1))
    uvs3 = jnp.tile(jnp.array([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]]), (2, 1, 1))
    origin = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -40.0]])
    direction = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))
    t = jnp.array([1.0, 40.0])
    lod = np.asarray(
        shade.compute_lod(pool, t0, v0, v1, v2, uvs3,
                          # Barycentrics of the rays' true hit point (0,0).
                          jnp.array([0.5, 0.5]), jnp.array([0.5, 0.5]),
                          origin, direction, t, 2.0 / 256)
    )
    assert lod[1] > lod[0]
    assert lod[0] >= 0.0


def test_tangent_matrix_orthonormal_for_axis_quad():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    uvs3 = jnp.array([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])
    tbn = np.asarray(shade.tangent_matrix(v0, v1, v2, uvs3))[0]
    # tangent = +x, bitangent = +y, normal = +z; world = tbn @ n_ts.
    n_world = tbn @ np.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(n_world, [0, 0, 1], atol=1e-6)
    t_world = tbn @ np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(t_world, [1, 0, 0], atol=1e-6)


def test_textured_render_end_to_end(tmp_path):
    """Quad with a checkerboard texture: kTexture mode must show both colors."""
    import jax

    from tpu_raytracing.bvh import lbvh
    from tpu_raytracing.scene.procedural import _finish
    from tpu_raytracing.scene.types import Library, scene_to_device
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.trace.modes import RenderType
    from tpu_raytracing.trace.render import render_frame
    from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs

    checker = np.zeros((8, 8, 4), np.uint8)
    checker[::2, ::2] = (255, 0, 0, 255)
    checker[1::2, 1::2] = (255, 0, 0, 255)
    checker[..., 3] = 255

    lib = Library()
    lib.add_material("m")
    lib.materials[-1].diffuse = np.array([1, 1, 1], np.float32)
    lib.materials[-1].texture = lib.add_texture("checker", checker)

    g = 1.0
    tris = np.array(
        [[[-g, -g, 2], [g, -g, 2], [g, g, 2]], [[-g, -g, 2], [g, g, 2], [-g, g, 2]]],
        np.float32,
    )
    scene = _finish(tris, np.zeros(2, np.int32), lib)
    # UVs spanning the quad.
    scene.uvs = np.array(
        [[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]], np.float32
    )
    dev = scene_to_device(scene)
    # Explicit camera at the origin looking +z (the flat quad breaks the
    # scene-framing heuristic, which would sit the camera on the quad).
    camera = {
        "position": jnp.zeros(3),
        "u": jnp.array([-1.0, 0.0, 0.0]),
        "v": jnp.array([0.0, -1.0, 0.0]),
        "w": jnp.array([0.0, 0.0, 1.0]),
        "max_depth": jnp.float32(10.0),
    }
    bvh, pairs = jax.jit(lbvh.build_lbvh)(jnp.asarray(scene.triangles))
    img, _ = render_frame(pack_bvh(bvh), pack_pairs(pairs), dev, camera, 64, 64,
                          RenderType.TEXTURE)
    img = np.asarray(img)
    reds = (img[..., 0] > 200) & (img[..., 1] < 50)
    blacks = (img[..., 0] < 50) & (img[..., 3] == 255)
    assert reds.any() and blacks.any()
