"""Triangle pairing: shared-edge detection, rotations, quad assembly.

Vectorized re-design of the reference's per-thread pair test
(src/Pairing.cuh:1-78): exact float vertex equality, edge matching in the
reference's iteration order, the SAH-style merge heuristic
``sa(pair) * 0.5 < sa(a) + sa(b)`` and quad assembly with rotation encoding.
Rotations are undone at shading time (src/Tracer.cu:57-82).

All functions broadcast over a leading batch axis; triangles are [..., 3, 3].
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from tpu_raytracing.bvh.types import TrianglePairs
from tpu_raytracing.ops.intersect import aabb_surface_area


def _vertex_equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact equality of two vertex sets: [..., 3, 3] x2 -> [..., 3, 3] bool
    where out[i, j] = (a vertex i == b vertex j), matching the reference's
    exact float3 compare (src/Common.cuh:25-28)."""
    return jnp.all(a[..., :, None, :] == b[..., None, :, :], axis=-1)


def _find_shared_edge(eq: jnp.ndarray, x: int, y: int) -> jnp.ndarray:
    """FindSharedEdge (src/Pairing.cuh:26-33) for A-edge (vertex x -> vertex y):
    returns B's rotation in {0, 1, 2} or -1."""
    r0 = eq[..., x, 0] & eq[..., y, 1]
    r2 = eq[..., x, 1] & eq[..., y, 2]
    r1 = eq[..., x, 2] & eq[..., y, 0]
    out = jnp.full(eq.shape[:-2], -1, jnp.int32)
    out = jnp.where(r1, 1, out)
    out = jnp.where(r2, 2, out)
    out = jnp.where(r0, 0, out)
    return out


def can_form_pair(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CanFormTrianglePair (src/Pairing.cuh:42-58).

    Probes A's edges in the reference's order — (v0,v2) with rot_a=2,
    (v1,v0) with rot_a=1, (v2,v1) with rot_a=0 — taking the first match.
    Returns (can, rot_a, rot_b).
    """
    eq = _vertex_equal(a, b)
    probes = [(0, 2, 2), (1, 0, 1), (2, 1, 0)]
    can = jnp.zeros(a.shape[:-2], bool)
    rot_a = jnp.zeros(a.shape[:-2], jnp.int32)
    rot_b = jnp.zeros(a.shape[:-2], jnp.int32)
    for x, y, ra in probes:
        r = _find_shared_edge(eq, x, y)
        found = r >= 0
        take = found & ~can
        rot_a = jnp.where(take, ra, rot_a)
        rot_b = jnp.where(take, r, rot_b)
        can = can | found
    return can, rot_a, rot_b


def should_form_pair(a_min, a_max, b_min, b_max, p_min, p_max) -> jnp.ndarray:
    """Merge heuristic (src/Pairing.cuh:35-39)."""
    return aabb_surface_area(p_min, p_max) * 0.5 < (
        aabb_surface_area(a_min, a_max) + aabb_surface_area(b_min, b_max)
    )


def _rotate_triangle(tri: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """RotateTriangle (src/Pairing.cuh:9-21): rot 1 -> (v2, v0, v1),
    rot 2 -> (v1, v2, v0)."""
    rot1 = tri[..., jnp.array([2, 0, 1]), :]
    rot2 = tri[..., jnp.array([1, 2, 0]), :]
    r = rot[..., None, None]
    return jnp.where(r == 1, rot1, jnp.where(r == 2, rot2, tri))


def create_pairs(
    a: jnp.ndarray,
    b: jnp.ndarray,
    a_id: jnp.ndarray,
    b_id: jnp.ndarray,
    is_pair: jnp.ndarray,
) -> TrianglePairs:
    """CreateTrianglePair (src/Pairing.cuh:60-78), vectorized.

    Paired: A is rotated so the shared edge is (v1, v2); v3 is B's vertex
    opposite that edge (rot_b == 2 -> b.v0, 1 -> b.v1, else b.v2). Unpaired:
    v3 = v2 (degenerate second triangle) and both ids point at A — the
    reference leaves id_1 uninitialised there (src/BottomUpBuilder.cu:299-309);
    an in-bounds defined value is safer and unreachable either way.
    """
    can, rot_a, rot_b = can_form_pair(a, b)
    rot_a = jnp.where(is_pair, rot_a, 0)
    rot_b = jnp.where(is_pair, rot_b, 0)
    a_rot = _rotate_triangle(a, rot_a)
    v3_pair = jnp.where(
        (rot_b == 2)[..., None],
        b[..., 0, :],
        jnp.where((rot_b == 1)[..., None], b[..., 1, :], b[..., 2, :]),
    )
    v3 = jnp.where(is_pair[..., None], v3_pair, a_rot[..., 2, :])
    return TrianglePairs(
        v0=a_rot[..., 0, :],
        v1=a_rot[..., 1, :],
        v2=a_rot[..., 2, :],
        v3=v3,
        prim_id_0=a_id.astype(jnp.int32),
        prim_id_1=jnp.where(is_pair, b_id, a_id).astype(jnp.int32),
        rot_0=rot_a.astype(jnp.int32),
        rot_1=rot_b.astype(jnp.int32),
    )


def identity_pairs(triangles: jnp.ndarray) -> TrianglePairs:
    """Pair i == triangle i, unpaired; used by the brute-force path and by
    builders that don't pair."""
    num = triangles.shape[0]
    idx = jnp.arange(num, dtype=jnp.int32)
    false = jnp.zeros((num,), bool)
    return create_pairs(triangles, triangles, idx, idx, false)
