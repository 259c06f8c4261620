"""Vectorized ray-AABB slab and Möller-Trumbore ray-triangle tests.

These are the innermost tracer ops (reference: src/Tracer.cu:187-306),
written as wide, branch-free fp32 jnp ops so XLA maps them onto the VPU over
whole ray batches at once instead of one thread per ray. Epsilons and
comparison directions match the reference exactly (fp32 determinism is what
makes PSNR parity possible — see SURVEY.md §7 "hard parts").

All functions broadcast over leading batch dimensions; vectors are packed in
the trailing axis of size 3.
"""

from __future__ import annotations

import jax.numpy as jnp

# Möller-Trumbore determinant epsilon (reference: src/Tracer.cu:260).
TRI_EPSILON = 1e-9


def intersect_ray_aabb(box_min, box_max, origin, direction, tmin, tmax):
    """Slab test (reference: src/Tracer.cu:187-200).

    Returns (hit, front) where ``front`` is the entry distance used for
    near-child ordering. A zero direction component must NOT divide to
    inf here: the reference relies on CUDA fminf/fmaxf IGNORING the
    resulting 0*inf NaNs (src/Tracer.cu:187-200), but XLA's min/max
    PROPAGATE NaN — an axis-aligned ray would silently prune every box
    whose face touches its origin coordinate (round-4 bug, caught by
    straight-down rays). The tiny-epsilon substitute keeps the interval
    finite with the same accept set.
    """
    inv_dir = 1.0 / jnp.where(
        jnp.abs(direction) < 1e-30,
        jnp.where(direction < 0, -1e-30, 1e-30), direction)
    t1 = (box_min - origin) * inv_dir
    t2 = (box_max - origin) * inv_dir
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    front = jnp.max(lo, axis=-1)
    back = jnp.min(hi, axis=-1)
    hit = (back >= front) & (front <= tmax) & (back >= tmin)
    return hit, front


def intersect_ray_triangle(v0, v1, v2, origin, direction, tmin, tmax):
    """Möller-Trumbore (reference: src/Tracer.cu:256-291).

    Returns (accept, t, u, v). ``accept`` means the hit is strictly inside
    (tmin, tmax] — note the reference accepts t == tmax (later equal hits
    overwrite earlier ones), which we preserve for exact tie behaviour.
    """
    edge1 = v1 - v0
    edge2 = v2 - v0
    h = jnp.cross(direction, edge2)
    a = jnp.sum(edge1 * h, axis=-1)
    degenerate = (a > -TRI_EPSILON) & (a < TRI_EPSILON)

    f = 1.0 / a
    s = origin - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, edge1)
    v = f * jnp.sum(direction * q, axis=-1)
    t = f * jnp.sum(edge2 * q, axis=-1)

    accept = (
        ~degenerate
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= tmin)
        & (t <= tmax)
    )
    return accept, t, u, v


def triangle_aabb(v0, v1, v2):
    """Triangle bounding box (reference: src/Common.cuh:263-267)."""
    lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    return lo, hi


def aabb_surface_area(box_min, box_max):
    """Surface-area metric used by SAH and pairing (src/Common.cuh:293-297)."""
    length = box_max - box_min
    return 2.0 * (
        length[..., 0] * length[..., 1]
        + length[..., 0] * length[..., 2]
        + length[..., 1] * length[..., 2]
    )
