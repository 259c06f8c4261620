"""Wavefront diffuse path tracer with ray compaction (BASELINE configs 3/5).

The reference's megakernel handles one bounce (primary + shadow); multi-
bounce path tracing is the wavefront generalization promised by the north
star: bounce loop at the Python level, each bounce a full-batch traversal,
with dead rays carrying empty stacks and a stable sort compacting live rays
to the front so the batch's while_loop drains coherently.

Lighting model: Lambertian surfaces (material diffuse albedo), cosine-
weighted hemisphere bounces, sky radiance on miss, plus next-event direct
light toward the scene point light with a shadow trace per bounce.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_raytracing.scene.types import DeviceScene
from tpu_raytracing.trace import shade
from tpu_raytracing.trace.ray import Rays, generate_primary_rays
from tpu_raytracing.trace.render import SHADOW_TMIN, _gather_hit_context, _shadow_rays
from tpu_raytracing.trace.traverse import PackedPairs, TraversalBVH, trace_rays

SKY_HORIZON = jnp.array([1.0, 1.0, 1.0], jnp.float32)
SKY_ZENITH = jnp.array([0.5, 0.7, 1.0], jnp.float32)


def _sky(direction):
    t = 0.5 * (direction[:, 1] + 1.0)
    return SKY_HORIZON[None, :] * (1.0 - t[:, None]) + SKY_ZENITH[None, :] * t[:, None]


def _cosine_sample(normal, u):
    """Cosine-weighted hemisphere directions around per-ray normals; ``u`` is
    [R, 2] uniforms indexed by *pixel*, so results are invariant under the
    compaction permutation."""
    r = jnp.sqrt(u[:, 0])
    phi = 2.0 * jnp.pi * u[:, 1]
    local = jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(jnp.maximum(1.0 - u[:, 0], 0.0))],
        axis=-1,
    )
    # Orthonormal basis around the normal.
    n = normal
    sign = jnp.where(n[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t = jnp.stack([1.0 + sign * n[:, 0] ** 2 * a, sign * b, -sign * n[:, 0]], axis=-1)
    bt = jnp.stack([b, sign + n[:, 1] ** 2 * a, -n[:, 1]], axis=-1)
    return (
        t * local[:, 0:1] + bt * local[:, 1:2] + n * local[:, 2:3]
    )


@partial(
    jax.jit,
    static_argnames=("width", "height", "num_bounces", "compaction", "tracer"),
)
def path_trace(
    trav: TraversalBVH,
    pairs: PackedPairs,
    scene: DeviceScene,
    camera: dict,
    width: int,
    height: int,
    num_bounces: int = 4,
    key: jnp.ndarray = None,
    compaction: bool = True,
    tracer=trace_rays,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ([H, W, 3] float32 radiance, total rays traced)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    rays = generate_primary_rays(camera, width, height)
    num = width * height
    pixel = jnp.arange(num, dtype=jnp.int32)
    throughput = jnp.ones((num, 3), jnp.float32)
    radiance = jnp.zeros((num, 3), jnp.float32)
    alive = jnp.ones((num,), bool)
    rays_traced = jnp.int32(0)
    max_t = camera["max_depth"]
    light_colour = shade.LIGHT_COLOUR

    for bounce in range(num_bounces + 1):
        key, k_dir = jax.random.split(key)
        rec, stats = tracer(trav, pairs, rays, active=alive)
        rays_traced = rays_traced + jnp.sum(alive.astype(jnp.int32))

        miss = alive & ~rec.hit
        radiance = radiance + jnp.where(
            miss[:, None], throughput * _sky(rays.direction), 0.0
        )
        alive = alive & rec.hit

        ctx = _gather_hit_context(scene, pairs, rec)
        albedo = ctx["mat_diffuse"]
        normal = shade.interpolate(ctx["normals3"], rec.bary_u, rec.bary_v)
        norm_len = jnp.linalg.norm(normal, axis=-1, keepdims=True)
        normal = normal / jnp.maximum(norm_len, 1e-20)
        # Face-forward against the incoming ray.
        normal = jnp.where(
            (jnp.sum(normal * rays.direction, axis=-1) > 0.0)[:, None], -normal, normal
        )
        hit_pos = rays.origin + rays.direction * rec.t[:, None]

        # Next-event estimation: one shadow ray toward the point light.
        srays = _shadow_rays(scene, rays, rec)
        srec, _ = tracer(trav, pairs, srays, active=alive)
        rays_traced = rays_traced + jnp.sum(alive.astype(jnp.int32))
        ndotl = jnp.maximum(jnp.sum(normal * srays.direction, axis=-1), 0.0)
        direct = jnp.where(
            (alive & ~srec.hit)[:, None],
            throughput * albedo * ndotl[:, None] * light_colour[None, :],
            0.0,
        )
        radiance = radiance + direct

        if bounce == num_bounces:
            break

        throughput = throughput * albedo
        u_frame = jax.random.uniform(k_dir, (num, 2))
        new_dir = _cosine_sample(normal, u_frame[pixel])
        rays = Rays(
            origin=hit_pos + normal * 1e-4,
            direction=new_dir,
            tmin=jnp.full((num,), SHADOW_TMIN, jnp.float32),
            tmax=jnp.full((num,), max_t, jnp.float32),
        )

        if compaction:
            # Stable sort: live rays to the front so the traversal batch
            # drains coherently; pixel ids ride along for the final scatter.
            order_key = (~alive).astype(jnp.int32)
            perm = jnp.argsort(order_key, stable=True)
            rays = jax.tree.map(lambda a: a[perm], rays)
            throughput = throughput[perm]
            radiance = radiance[perm]
            alive = alive[perm]
            pixel = pixel[perm]

    img = jnp.zeros((num, 3), jnp.float32).at[pixel].set(radiance)
    return img.reshape(height, width, 3), rays_traced
