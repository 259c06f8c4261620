"""Camera ray generation (reference: src/Tracer.cu:475-494).

Pure jnp: rays for the whole frame are produced as one dense [H*W] batch
(the reference's one-thread-per-pixel launch becomes the batch axis).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

# Primary-ray tmin (reference: src/Tracer.cu:493).
PRIMARY_TMIN = 1e-5


@flax.struct.dataclass
class Rays:
    origin: jnp.ndarray  # [R, 3] float32
    direction: jnp.ndarray  # [R, 3] float32
    tmin: jnp.ndarray  # [R] float32
    tmax: jnp.ndarray  # [R] float32


def generate_primary_rays(camera: dict, width: int, height: int) -> Rays:
    """One ray per pixel, row-major (pixel (x, y) -> ray y*width + x).

    NDC mapping and basis combination match src/Tracer.cu:482-494: the ray
    passes through the pixel centre, p = ndc.x*u + ndc.y*v + w, normalized.
    """
    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    ndc_x = 2.0 * ((x + 0.5) / width) - 1.0
    ndc_y = 2.0 * ((y + 0.5) / height) - 1.0
    gx, gy = jnp.meshgrid(ndc_x, ndc_y)  # [H, W]
    p = (
        gx[..., None] * camera["u"][None, None, :]
        + gy[..., None] * camera["v"][None, None, :]
        + camera["w"][None, None, :]
    )
    direction = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    direction = direction.reshape(-1, 3).astype(jnp.float32)
    num = width * height
    origin = jnp.broadcast_to(camera["position"][None, :], (num, 3)).astype(jnp.float32)
    tmin = jnp.full((num,), PRIMARY_TMIN, jnp.float32)
    tmax = jnp.full((num,), camera["max_depth"], jnp.float32)
    return Rays(origin=origin, direction=direction, tmin=tmin, tmax=tmax)


def ray_spread(width: int) -> float:
    """Footprint spread for ray-differential LOD (src/Tracer.cu:486)."""
    return 2.0 / width
