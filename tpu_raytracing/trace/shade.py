"""Shading stack: attribute rotation, texturing, LOD, bump/displacement,
Phong lighting (reference: src/Tracer.cu:15-185, 202-254, 376-469).

Everything is a wide, branch-free jnp op over the ray batch; the reference's
per-thread branches become masked selects. Conversions mirror CUDA exactly:
float->uchar casts truncate toward zero, bilinear weights are computed on
truncated integer coords, and bilinear results are quantized to uint8
*before* the trilinear mix, as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_raytracing.scene.types import NUM_LODS, DeviceScene, TexturePool


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(a):
    return a / jnp.linalg.norm(a, axis=-1, keepdims=True)


def _trunc_u8(x):
    """CUDA float->uchar conversion: truncate toward zero."""
    return jnp.trunc(x).astype(jnp.uint8)


def hsv_to_rgb(h, s, v):
    """HsvToRgb (src/Tracer.cu:15-40); returns float RGB in [0, 255]."""
    h = jnp.clip(h, 0.0, 1.0) * 360.0
    s = jnp.clip(s, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    c = s * v
    x = c * (1.0 - jnp.abs((h.astype(jnp.int32) % 120).astype(jnp.float32) / 60.0 - 1.0))
    m = v - c
    zero = jnp.zeros_like(c)
    sextant = jnp.clip((h / 60.0).astype(jnp.int32), 0, 5)
    r = jnp.select(
        [sextant == 0, sextant == 1, sextant == 2, sextant == 3, sextant == 4],
        [c, x, zero, zero, x],
        c,
    )
    g = jnp.select(
        [sextant == 0, sextant == 1, sextant == 2, sextant == 3, sextant == 4],
        [x, c, c, x, zero],
        zero,
    )
    b = jnp.select(
        [sextant == 0, sextant == 1, sextant == 2, sextant == 3, sextant == 4],
        [zero, zero, x, c, c],
        x,
    )
    return (jnp.stack([r, g, b], axis=-1) + m[..., None]) * 255.0


def rotate_attributes(normals, uvs, rot):
    """Undo pairing rotation at shade time (src/Tracer.cu:57-82).

    rot 1 -> corners (2, 0, 1); rot 2 -> corners (1, 2, 0).
    normals: [R, 3, 3], uvs: [R, 3, 2], rot: [R].
    """
    perm1 = jnp.array([2, 0, 1])
    perm2 = jnp.array([1, 2, 0])
    r = rot[:, None, None]
    n = jnp.where(r == 1, normals[:, perm1], jnp.where(r == 2, normals[:, perm2], normals))
    u = jnp.where(r == 1, uvs[:, perm1], jnp.where(r == 2, uvs[:, perm2], uvs))
    return n, u


def interpolate(corner_vals, bary_u, bary_v):
    """Barycentric interpolation over [R, 3, C] corner values
    (src/Tracer.cu:42-55)."""
    w0 = (1.0 - bary_u - bary_v)[:, None]
    return (
        corner_vals[:, 0] * w0
        + corner_vals[:, 1] * bary_u[:, None]
        + corner_vals[:, 2] * bary_v[:, None]
    )


# ---------------------------------------------------------------------------
# Texture sampling from the flat pool
# ---------------------------------------------------------------------------


def _tex_table(pool: TexturePool, tex, lod):
    """Gather (offset, w, h) for per-ray texture/lod indices."""
    num_tex = pool.offset.shape[0]
    tex_safe = jnp.clip(tex, 0, num_tex - 1)
    lod_safe = jnp.clip(lod, 0, NUM_LODS - 1)
    flat = tex_safe * NUM_LODS + lod_safe
    off = pool.offset.reshape(-1)[flat]
    w = pool.width.reshape(-1)[flat]
    h = pool.height.reshape(-1)[flat]
    return off, w, h


def _read_texel(pool: TexturePool, off, w, h, x, y):
    """Clamped integer texel read -> float4 (src/Tracer.cu:103-108)."""
    x = jnp.clip(x, 0, jnp.maximum(w - 1, 0))
    y = jnp.clip(y, 0, jnp.maximum(h - 1, 0))
    idx = jnp.clip(off, 0, None) + y * w + x
    return pool.texels[idx].astype(jnp.float32)


def sample_point(pool: TexturePool, tex, uv, lod):
    """Nearest sample with the reference's coord mapping
    (src/Tracer.cu:110-120): coord = frac(uv) * (size-1), y flipped; missing
    mips sample magenta."""
    off, w, h = _tex_table(pool, tex, lod)
    fw = (w - 1).astype(jnp.float32)
    fh = (h - 1).astype(jnp.float32)
    frac = uv - jnp.floor(uv)
    cx = frac[..., 0] * fw
    cy = frac[..., 1] * fh
    ix = jnp.trunc(cx).astype(jnp.int32)
    iy = jnp.trunc(h.astype(jnp.float32) - cy - 1.0).astype(jnp.int32)
    texel = _read_texel(pool, off, w, h, ix, iy)
    magenta = jnp.array([255.0, 0.0, 255.0, 255.0])
    return jnp.where((off < 0)[..., None], magenta, texel)


def bilinear_sample(pool: TexturePool, tex, uv, lod):
    """BilinearSample (src/Tracer.cu:122-140) -> uint8-quantized float4."""
    off, w, h = _tex_table(pool, tex, lod)
    fw = w.astype(jnp.float32)
    fh = h.astype(jnp.float32)
    frac = uv - jnp.floor(uv)
    cx = frac[..., 0] * fw - 0.5
    cy = frac[..., 1] * fh - 0.5
    cy = fh - cy  # y flip (src/Tracer.cu:125)
    ix = jnp.trunc(cx).astype(jnp.int32)
    iy = jnp.trunc(cy).astype(jnp.int32)
    dx = cx - jnp.trunc(cx)
    dy = cy - jnp.trunc(cy)
    s0 = _read_texel(pool, off, w, h, ix, iy)
    s1 = _read_texel(pool, off, w, h, ix + 1, iy)
    s2 = _read_texel(pool, off, w, h, ix, iy - 1)
    s3 = _read_texel(pool, off, w, h, ix + 1, iy - 1)
    w0 = ((1.0 - dx) * dy)[..., None]
    w1 = (dx * dy)[..., None]
    w2 = ((1.0 - dx) * (1.0 - dy))[..., None]
    w3 = (dx * (1.0 - dy))[..., None]
    out = s0 * w0 + s1 * w1 + s2 * w2 + s3 * w3
    return jnp.trunc(out)  # uchar4 quantization


def trilinear_sample(pool: TexturePool, tex, uv, lod):
    """TrilinearSample (src/Tracer.cu:142-155): mixes two uint8-quantized
    bilinear taps."""
    max_lod = pool.max_lod[jnp.clip(tex, 0, pool.max_lod.shape[0] - 1)]
    lo = jnp.clip(jnp.floor(lod).astype(jnp.int32), 0, max_lod)
    hi = jnp.clip(jnp.floor(lod).astype(jnp.int32) + 1, 0, max_lod)
    s1 = bilinear_sample(pool, tex, uv, lo)
    s2 = bilinear_sample(pool, tex, uv, hi)
    frac = (lod - jnp.floor(lod))[..., None]
    return jnp.trunc(s1 * (1.0 - frac) + s2 * frac)


# ---------------------------------------------------------------------------
# Ray-differential LOD
# ---------------------------------------------------------------------------


def ray_triangle_gradients(v0, v1, v2, origin, direction, t, spread):
    """Barycentrics of two rays offset by the pixel footprint
    (src/Tracer.cu:202-235)."""
    edge1 = v1 - v0
    edge2 = v2 - v0
    s = origin - v0
    q = jnp.cross(s, edge1)

    up = jnp.array([0.0, 1.0, 0.0])
    x = _normalize(jnp.cross(direction, up)) * (t * spread)[..., None]
    y = _normalize(jnp.cross(direction, x)) * (t * spread)[..., None]
    hit_point = origin + direction * t[..., None]
    dirx = _normalize(hit_point + x - origin)
    diry = _normalize(hit_point + y - origin)

    def barys(d):
        hh = jnp.cross(d, edge2)
        a = _dot(edge1, hh)
        f = 1.0 / a
        bu = f * _dot(s, hh)
        bv = f * _dot(d, q)
        return bu, bv

    bu0, bv0 = barys(dirx)
    bu1, bv1 = barys(diry)
    return bu0, bv0, bu1, bv1


def compute_lod(pool, tex, v0, v1, v2, uvs3, bary_u, bary_v, origin, direction, t, spread):
    """ComputeLOD (src/Tracer.cu:237-254): log2 of the max texel-space
    footprint, clamped to [0, max_lod]."""
    bu0, bv0, bu1, bv1 = ray_triangle_gradients(v0, v1, v2, origin, direction, t, spread)
    uvs = interpolate(uvs3, bary_u, bary_v)
    uvs_x = interpolate(uvs3, bu0, bv0)
    uvs_y = interpolate(uvs3, bu1, bv1)
    _, w0, h0 = _tex_table(pool, tex, jnp.zeros_like(tex))
    size0 = jnp.stack([w0.astype(jnp.float32), h0.astype(jnp.float32)], axis=-1)
    dtdx = jnp.abs(uvs_x - uvs) * size0
    dtdy = jnp.abs(uvs_y - uvs) * size0
    max_change = jnp.maximum(
        jnp.linalg.norm(dtdx, axis=-1), jnp.linalg.norm(dtdy, axis=-1)
    )
    max_lod = pool.max_lod[jnp.clip(tex, 0, pool.max_lod.shape[0] - 1)]
    return jnp.clip(jnp.log2(max_change), 0.0, max_lod.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Bump / displacement mapping
# ---------------------------------------------------------------------------


def tangent_matrix(v0, v1, v2, uvs3):
    """TangentMatrix (src/Tracer.cu:84-101): returns rows of the TBN matrix
    such that world = rows . n_tangent_space."""
    e1 = v1 - v0
    e2 = v2 - v0
    duv1 = uvs3[:, 1] - uvs3[:, 0]
    duv2 = uvs3[:, 2] - uvs3[:, 0]
    f = 1.0 / (duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0])
    normal = _normalize(jnp.cross(e1, e2))
    tangent = _normalize(f[..., None] * (e1 * duv2[..., 1:2] - e2 * duv1[..., 1:2]))
    bitangent = _normalize(f[..., None] * (e2 * duv1[..., 0:1] - e1 * duv2[..., 0:1]))
    # Row i = (tangent[i], bitangent[i], normal[i]) — row-major transform.
    return jnp.stack([tangent, bitangent, normal], axis=-1)  # [R, 3, 3]


def _tbn_apply(tbn, n):
    return jnp.einsum("rij,rj->ri", tbn, n)


def bump_to_normal(pool, tex, tbn, uv, lod):
    """Bump2Normal (src/Tracer.cu:157-185): finite-difference height
    gradients -> tangent-space normal -> world."""
    texel_step = jnp.power(2.0, lod)
    _, w0, h0 = _tex_table(pool, tex, jnp.zeros_like(tex))
    size0 = jnp.stack([w0.astype(jnp.float32), h0.astype(jnp.float32)], axis=-1)
    step = texel_step[..., None] / size0
    a = trilinear_sample(pool, tex, uv - step * 0.5, lod)[..., 0]
    b = trilinear_sample(
        pool, tex, uv + jnp.stack([step[..., 0] * 0.5, jnp.zeros_like(lod)], -1), lod
    )[..., 0]
    c = trilinear_sample(
        pool, tex, uv + jnp.stack([jnp.zeros_like(lod), step[..., 1] * 0.5], -1), lod
    )[..., 0]
    gx = b - a
    gy = c - a
    d = 4.0
    denom = texel_step * 256.0
    px = d * gx / denom
    py = d * gy / denom
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    n = _normalize(jnp.cross(jnp.stack([one, zero, px], -1), jnp.stack([zero, one, py], -1)))
    return _normalize(_tbn_apply(tbn, n))


# ---------------------------------------------------------------------------
# Phong ambient shader
# ---------------------------------------------------------------------------

# Tuple, not a module-level jnp array: device-resident captured constants
# are re-staged per call on this backend.
LIGHT_COLOUR_RGB = (1.0, 0.9, 0.8)


def light_colour():
    return jnp.array(LIGHT_COLOUR_RGB, jnp.float32)


def ambient_shader(
    scene: DeviceScene,
    origin,
    direction,
    t,
    bary_u,
    bary_v,
    normals3,
    uvs3,
    tri_v0,
    tri_v1,
    tri_v2,
    mat_ambient,
    mat_diffuse,
    mat_specular,
    mat_specular_exp,
    mat_texture,
    mat_bump,
    mat_disp,
    spread,
    use_textures: bool,
    use_shadows: bool,
    use_bump: bool,
    shadow_hit=None,
):
    """AmbientShader (src/Tracer.cu:376-469) over a ray batch.

    All per-ray material fields are pre-gathered; the shadow trace (a second
    full traversal in the reference, src/Tracer.cu:446-462) is run by the
    caller and passed in as ``shadow_hit``.
    """
    pool = scene.textures
    light_pos = scene.light
    lc = light_colour()
    hit_pos = origin + direction * t[..., None]
    normal = interpolate(normals3, bary_u, bary_v)

    if use_bump:
        tbn = tangent_matrix(tri_v0, tri_v1, tri_v2, uvs3)
        uvs = interpolate(uvs3, bary_u, bary_v)
        # Displacement map: normal straight from the texture (tangent space).
        disp_lod = compute_lod(
            pool, mat_disp, tri_v0, tri_v1, tri_v2, uvs3, bary_u, bary_v,
            origin, direction, t, spread,
        )
        disp_smp = trilinear_sample(pool, mat_disp, uvs, disp_lod)[..., 0:3] / 255.0
        disp_n = _normalize(_tbn_apply(tbn, _normalize(disp_smp * 2.0 - 1.0)))
        # Bump map: height-gradient normal.
        bump_lod = compute_lod(
            pool, mat_bump, tri_v0, tri_v1, tri_v2, uvs3, bary_u, bary_v,
            origin, direction, t, spread,
        )
        bump_n = bump_to_normal(pool, mat_bump, tbn, uvs, bump_lod)
        normal = jnp.where(
            (mat_disp != -1)[..., None],
            disp_n,
            jnp.where((mat_bump != -1)[..., None], bump_n, normal),
        )

    light_dir = _normalize(light_pos - hit_pos)
    ambient = 0.2 * lc
    ndotl = jnp.maximum(_dot(normal, light_dir), 0.0)
    diffuse = ndotl[..., None] * lc

    def reflect(i, n):
        return i - 2.0 * n * _dot(n, i)[..., None]

    spec_base = jnp.maximum(_dot(-direction, reflect(-light_dir, normal)), 0.0)
    specular = jnp.power(spec_base, mat_specular_exp)[..., None] * lc

    object_diffuse = mat_diffuse
    if use_textures:
        lod = compute_lod(
            pool, mat_texture, tri_v0, tri_v1, tri_v2, uvs3, bary_u, bary_v,
            origin, direction, t, spread,
        )
        uvs = interpolate(uvs3, bary_u, bary_v)
        smp = bilinear_sample(pool, mat_texture, uvs, jnp.floor(lod).astype(jnp.int32))
        object_diffuse = jnp.where(
            (mat_texture != -1)[..., None], smp[..., 0:3] / 255.0, object_diffuse
        )

    if use_shadows and shadow_hit is not None:
        diffuse = jnp.where(shadow_hit[..., None], 0.0, diffuse)
        specular = jnp.where(shadow_hit[..., None], 0.0, specular)

    colour = diffuse * object_diffuse + ambient * mat_ambient + specular * mat_specular
    colour = jnp.clip(colour, 0.0, 1.0)
    return colour * 255.0
