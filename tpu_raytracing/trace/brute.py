"""Brute-force O(rays x triangles) reference intersector.

The golden oracle from SURVEY.md §4: BVH traversal must pixel-match this on
small scenes, because it shares the exact Möller-Trumbore semantics
(src/Tracer.cu:256-291) but needs no acceleration structure. Tie behaviour
matches the reference's sequential loop: a later triangle with t equal to
the current closest hit overwrites it.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from tpu_raytracing.ops.intersect import intersect_ray_triangle
from tpu_raytracing.trace.ray import Rays


@flax.struct.dataclass
class HitRecord:
    hit: jnp.ndarray  # [R] bool
    t: jnp.ndarray  # [R] float32 — updated ray tmax
    prim_id: jnp.ndarray  # [R] int32 — attribute/primitive index
    tri_id: jnp.ndarray  # [R] int32 — (pair_id << 1) | second_tri for BVH tracers
    bary_u: jnp.ndarray  # [R] float32
    bary_v: jnp.ndarray  # [R] float32


def make_brute_tracer(triangles: jnp.ndarray, chunk: int = 4096):
    """Adapter with the BVH tracer's (trav, pairs, rays) signature so the
    render pipeline can swap in the no-BVH oracle (use with identity_pairs)."""
    from tpu_raytracing.trace.traverse import TraceStats

    def tracer(trav, pairs, rays):
        rec = brute_force_trace(triangles, rays, chunk=chunk)
        zeros = jnp.zeros_like(rec.prim_id)
        return rec, TraceStats(box_tests=zeros, tri_tests=zeros)

    return tracer


def brute_force_trace(triangles: jnp.ndarray, rays: Rays, chunk: int = 4096) -> HitRecord:
    """Intersect every ray against every triangle.

    triangles: [T, 3, 3] float32. Rays are processed in scan chunks to bound
    the [chunk, T] live intermediate. The winner per ray is the minimum t;
    equal-t ties go to the *highest* triangle index (sequential-overwrite
    semantics of the reference loop).
    """
    num_rays = rays.origin.shape[0]
    pad = (-num_rays) % chunk
    origin = jnp.pad(rays.origin, ((0, pad), (0, 0)))
    direction = jnp.pad(rays.direction, ((0, pad), (0, 0)), constant_values=1.0)
    tmin = jnp.pad(rays.tmin, (0, pad))
    tmax = jnp.pad(rays.tmax, (0, pad))
    v0 = triangles[:, 0]
    v1 = triangles[:, 1]
    v2 = triangles[:, 2]
    num_tris = triangles.shape[0]

    def body(_, chunk_rays):
        o, d, lo, hi = chunk_rays
        accept, t, u, v = intersect_ray_triangle(
            v0[None, :, :],
            v1[None, :, :],
            v2[None, :, :],
            o[:, None, :],
            d[:, None, :],
            lo[:, None],
            hi[:, None],
        )  # all [chunk, T]
        big = float(jnp.finfo(jnp.float32).max)
        t_masked = jnp.where(accept, t, big)
        best_t = jnp.min(t_masked, axis=1)
        hit = jnp.any(accept, axis=1)
        # Highest index among equal-t winners (later overwrites earlier).
        is_best = accept & (t_masked == best_t[:, None])
        idx = jnp.arange(num_tris, dtype=jnp.int32)[None, :]
        win = jnp.max(jnp.where(is_best, idx, -1), axis=1)
        win_safe = jnp.maximum(win, 0)
        u_best = jnp.take_along_axis(u, win_safe[:, None], axis=1)[:, 0]
        v_best = jnp.take_along_axis(v, win_safe[:, None], axis=1)[:, 0]
        out = (
            hit,
            jnp.where(hit, best_t, hi),
            jnp.where(hit, win, 0),
            # tri_id uses the (pair_id << 1 | second) convention with
            # identity pairs (pair i == triangle i, no second triangle).
            jnp.where(hit, win << 1, 0),
            jnp.where(hit, u_best, 0.0),
            jnp.where(hit, v_best, 0.0),
        )
        return _, out

    chunks = (
        origin.reshape(-1, chunk, 3),
        direction.reshape(-1, chunk, 3),
        tmin.reshape(-1, chunk),
        tmax.reshape(-1, chunk),
    )
    _, (hit, t, prim, tri, bu, bv) = jax.lax.scan(body, None, chunks)
    sl = slice(0, num_rays)
    flat = lambda a: a.reshape(-1)[sl]  # noqa: E731
    return HitRecord(
        hit=flat(hit),
        t=flat(t),
        prim_id=flat(prim).astype(jnp.int32),
        tri_id=flat(tri).astype(jnp.int32),
        bary_u=flat(bu),
        bary_v=flat(bv),
    )
