"""30-bit Morton codes (reference: src/BottomUpBuilder.cu:10-32).

Bit expansion is identical to the reference's multiply-mask sequence, run as
wide uint32 VPU ops over the whole primitive axis at once instead of one
thread per primitive.
"""

from __future__ import annotations

import jax.numpy as jnp


def expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Insert two zeros after each of the low 10 bits (src/BottomUpBuilder.cu:12-19)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(xyz: jnp.ndarray) -> jnp.ndarray:
    """Morton code of points in the unit cube, [..., 3] -> [...] uint32
    (src/BottomUpBuilder.cu:23-32)."""
    q = jnp.clip(xyz * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    xx = expand_bits(q[..., 0])
    yy = expand_bits(q[..., 1])
    zz = expand_bits(q[..., 2])
    return xx * jnp.uint32(4) + yy * jnp.uint32(2) + zz
