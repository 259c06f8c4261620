"""Frame rendering: ray gen -> trace -> shade, all nine render modes
(reference: TraceRays, src/Tracer.cu:471-596).

The reference megakernel becomes a wavefront: primary trace, optional shadow
trace (a second traversal pass over the whole batch instead of a nested
per-thread call), then pure-jnp shading and uint8 framebuffer packing. The
render mode is a static argument, so each mode jit-compiles its own lean
program.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_raytracing.scene.types import DeviceScene
from tpu_raytracing.trace import shade
from tpu_raytracing.trace.modes import RenderType
from tpu_raytracing.trace.ray import Rays, generate_primary_rays, ray_spread
from tpu_raytracing.trace.traverse import PackedPairs, TraversalBVH, trace_rays

# Shadow-ray epsilon (reference: src/Tracer.cu:453).
SHADOW_TMIN = 1e-3


def _gather_hit_context(scene: DeviceScene, pairs: PackedPairs, rec):
    """Per-ray gathers of attributes, rotations and triangle vertices for the
    hit pair (reference: src/Tracer.cu:505-509 and the per-mode pair reads).
    """
    from tpu_raytracing.ops.gather import take_rows

    second = (rec.tri_id & 1).astype(bool)
    pair_idx = jnp.clip(rec.tri_id >> 1, 0, pairs.rows.shape[0] - 1)
    prow = take_rows(pairs.rows, pair_idx)
    i2f = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)  # noqa: E731
    v0, v1, v2, v3 = (
        i2f(prow[:, 0:3]),
        i2f(prow[:, 3:6]),
        i2f(prow[:, 6:9]),
        i2f(prow[:, 9:12]),
    )
    rot = jnp.where(second, prow[:, 15], prow[:, 14])

    # Triangle A = (v0, v1, v2); B = (v2, v1, v3) (src/Tracer.cu:297-298).
    tri_v0 = jnp.where(second[:, None], v2, v0)
    tri_v1 = v1
    tri_v2 = jnp.where(second[:, None], v3, v2)

    prim = jnp.clip(rec.prim_id, 0, scene.normals.shape[0] - 1)
    normals3, uvs3 = shade.rotate_attributes(
        take_rows(scene.normals, prim), take_rows(scene.uvs, prim), rot
    )
    material_id = scene.material_ids[prim]
    num_mats = scene.materials.ambient.shape[0]  # includes default slot
    mat_idx = jnp.where(material_id < 0, num_mats - 1, material_id)
    mat_idx = jnp.clip(mat_idx, 0, num_mats - 1)
    mats = scene.materials
    return dict(
        second=second,
        normals3=normals3,
        uvs3=uvs3,
        tri_v0=tri_v0,
        tri_v1=tri_v1,
        tri_v2=tri_v2,
        material_id=material_id,
        mat_ambient=mats.ambient[mat_idx],
        mat_diffuse=mats.diffuse[mat_idx],
        mat_specular=mats.specular[mat_idx],
        mat_specular_exp=mats.specular_exp[mat_idx],
        mat_texture=mats.texture[mat_idx],
        mat_bump=mats.bump[mat_idx],
        mat_disp=mats.disp[mat_idx],
    )


def _shadow_rays(scene: DeviceScene, rays: Rays, rec) -> Rays:
    """Shadow rays from hit points toward the light (src/Tracer.cu:446-456)."""
    hit_pos = rays.origin + rays.direction * rec.t[:, None]
    to_light = scene.light - hit_pos
    dist = jnp.linalg.norm(to_light, axis=-1)
    direction = to_light / jnp.maximum(dist, 1e-30)[:, None]
    return Rays(
        origin=hit_pos,
        direction=direction,
        tmin=jnp.full_like(dist, SHADOW_TMIN),
        tmax=dist,
    )


def _ambient(scene, ctx, rays, rec, spread, use_textures, use_shadows, use_bump,
             shadow_hit=None):
    return shade.ambient_shader(
        scene,
        rays.origin,
        rays.direction,
        rec.t,
        rec.bary_u,
        rec.bary_v,
        ctx["normals3"],
        ctx["uvs3"],
        ctx["tri_v0"],
        ctx["tri_v1"],
        ctx["tri_v2"],
        ctx["mat_ambient"],
        ctx["mat_diffuse"],
        ctx["mat_specular"],
        ctx["mat_specular_exp"],
        ctx["mat_texture"],
        ctx["mat_bump"],
        ctx["mat_disp"],
        spread,
        use_textures,
        use_shadows,
        use_bump,
        shadow_hit,
    )


@partial(jax.jit, static_argnames=("width", "height", "render_type", "tracer"))
def render_frame(
    trav: TraversalBVH,
    pairs: PackedPairs,
    scene: DeviceScene,
    camera: dict,
    width: int,
    height: int,
    render_type: RenderType = RenderType.DEPTH,
    tracer=trace_rays,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one frame; returns ([H, W, 4] uint8, total box tests).

    Per-mode colour formulas replicate src/Tracer.cu:511-593 exactly,
    including the truncating float->uchar casts.
    """
    rays = generate_primary_rays(camera, width, height)
    flat, tests = shade_rays(
        trav, pairs, scene, camera, rays, ray_spread(width), render_type, tracer
    )
    return flat.reshape(height, width, 4), tests


def shade_rays(
    trav: TraversalBVH,
    pairs: PackedPairs,
    scene: DeviceScene,
    camera: dict,
    rays: Rays,
    spread: float,
    render_type: RenderType = RenderType.DEPTH,
    tracer=trace_rays,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trace + shade an arbitrary ray batch; returns ([R, 4] uint8, tests).

    This is the band-level kernel the multi-chip path shards over the mesh.
    """
    rec, stats = tracer(trav, pairs, rays)
    hit = rec.hit
    depth = jnp.where(hit, rec.t, 0.0)
    max_depth = camera["max_depth"]

    ctx = _gather_hit_context(scene, pairs, rec)
    u8 = shade._trunc_u8
    num = rays.origin.shape[0]
    alpha = jnp.full((num, 1), 255, jnp.uint8)
    black = jnp.zeros((num, 3), jnp.uint8)

    if render_type == RenderType.DEPTH:
        grey = u8(jnp.minimum(1.0, depth / max_depth) * 255.0)
        rgb = jnp.stack([grey, grey, grey], axis=-1)
    elif render_type == RenderType.BOX_TESTS:
        heat = u8(jnp.minimum(stats.box_tests / 180.0, 1.0) * 255.0)
        rgb = jnp.stack([jnp.zeros_like(heat), heat, heat], axis=-1)
    elif render_type == RenderType.TRIANGLE_TESTS:
        frac = jnp.minimum(stats.tri_tests / 32.0, 1.0)
        rgb = jnp.stack([u8(frac * 100.0), u8(frac * 255.0), u8(frac * 100.0)], axis=-1)
    elif render_type == RenderType.MATERIAL_ID:
        h = ctx["material_id"].astype(jnp.float32) / scene.num_materials.astype(jnp.float32)
        rgb = u8(shade.hsv_to_rgb(h, jnp.ones_like(h), jnp.ones_like(h)))
        rgb = jnp.where(hit[:, None], rgb, black)
    elif render_type == RenderType.DIFFUSE:
        col = _ambient(scene, ctx, rays, rec, spread, False, False, False)
        rgb = jnp.where(hit[:, None], u8(col), black)
    elif render_type == RenderType.LODS:
        lod = shade.compute_lod(
            scene.textures, ctx["mat_texture"], ctx["tri_v0"], ctx["tri_v1"],
            ctx["tri_v2"], ctx["uvs3"], rec.bary_u, rec.bary_v,
            rays.origin, rays.direction, rec.t, spread,
        )
        # make_uchar4(int(lod) * 20) wraps mod 256 and fills all channels.
        grey = (lod.astype(jnp.int32) * 20).astype(jnp.uint8)
        valid = hit & (ctx["mat_texture"] != -1)
        magenta = jnp.tile(jnp.array([[255, 0, 255]], jnp.uint8), (num, 1))
        rgb = jnp.where(valid[:, None], jnp.stack([grey] * 3, -1), magenta)
        img = jnp.concatenate(
            [rgb, jnp.where(valid[:, None], grey[:, None], jnp.uint8(255))], axis=1
        )
        return img, jnp.sum(stats.box_tests)
    elif render_type == RenderType.TEXTURE:
        lod = shade.compute_lod(
            scene.textures, ctx["mat_texture"], ctx["tri_v0"], ctx["tri_v1"],
            ctx["tri_v2"], ctx["uvs3"], rec.bary_u, rec.bary_v,
            rays.origin, rays.direction, rec.t, spread,
        )
        uvs = shade.interpolate(ctx["uvs3"], rec.bary_u, rec.bary_v)
        smp = shade.trilinear_sample(scene.textures, ctx["mat_texture"], uvs, lod)
        flat = u8(ctx["mat_diffuse"] * 255.0)
        rgb = jnp.where((ctx["mat_texture"] != -1)[:, None], u8(smp[:, 0:3]), flat)
        rgb = jnp.where(hit[:, None], rgb, black)
    elif render_type == RenderType.TEXTURE_LIT:
        col = _ambient(scene, ctx, rays, rec, spread, True, False, True)
        rgb = jnp.where(hit[:, None], u8(col), black)
    elif render_type == RenderType.TEXTURE_LIT_SHADOWS:
        srec, _ = tracer(trav, pairs, _shadow_rays(scene, rays, rec))
        col = _ambient(
            scene, ctx, rays, rec, spread, True, True, True, shadow_hit=srec.hit
        )
        rgb = jnp.where(hit[:, None], u8(col), black)
    else:
        raise ValueError(f"unknown render type {render_type}")

    img = jnp.concatenate([rgb, alpha], axis=1)
    return img, jnp.sum(stats.box_tests)


def render_frame_host(trav, pairs, scene, camera, width, height, render_type,
                      tracer=trace_rays):
    """Convenience wrapper returning a numpy image."""
    import numpy as np

    img, tests = render_frame(
        trav, pairs, scene, camera, width, height, render_type, tracer
    )
    return np.asarray(img), int(tests)
