"""Wavefront BVH traversal (reference: TraceRay, src/Tracer.cu:308-374).

The reference's per-thread megakernel loop becomes a batched while_loop: all
rays advance in lockstep, each popping one (index, count) stack entry per
iteration with finished rays masked out. Semantics match the reference
exactly — near-child ordering with the equal-distance/higher-index
tie-break (src/Tracer.cu:346-347), sequential pair intersection (triangle A
then B so B sees A's updated tmax), the 64-entry stack, and per-ray
box-test/tri-test counters — so depth images are bit-comparable.

Data layout: nodes and pairs are packed into gather-friendly rows
([N, 8] and [P, 16] float32 with bit-cast int fields) so each step costs one
row gather per node/pair instead of five scattered field gathers.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from tpu_raytracing.bvh.types import BVH, CHILD_BOX, CHILD_NONE, CHILD_TRI, STACK_DEPTH, TrianglePairs
from tpu_raytracing.ops.intersect import intersect_ray_aabb, intersect_ray_triangle
from tpu_raytracing.trace.brute import HitRecord
from tpu_raytracing.trace.ray import Rays

# Stack entries pack (index << 3) | count, mirroring the reference's
# 29/3-bit Node bitfields (src/Common.cuh:152-159).
_ENTRY_SHIFT = 3
_COUNT_MASK = 7
# Node meta word: child << 5 | count << 2 | type.
_META_TYPE_MASK = 3
_META_COUNT_SHIFT = 2
_META_COUNT_MASK = 7
_META_CHILD_SHIFT = 5


@flax.struct.dataclass
class TraversalBVH:
    """Packed traversal view: one 32-byte row per node slot.

    Rows are int32 with float fields bit-cast in (never the other way round:
    small integers bit-cast to float32 are denormals, which TPU/CPU float
    paths flush to zero).
    """

    rows: jnp.ndarray  # [N, 8] int32: min xyz, max xyz (bitcast f32), meta, pad
    root: jnp.ndarray  # [] int32
    root_count: jnp.ndarray  # [] int32


@flax.struct.dataclass
class PackedPairs:
    rows: jnp.ndarray  # [P, 16] i32: v0..v3 xyz (bitcast), prim0, prim1, rot0, rot1


@flax.struct.dataclass
class TraceStats:
    box_tests: jnp.ndarray  # [R] int32
    tri_tests: jnp.ndarray  # [R] int32


def pack_bvh(bvh: BVH) -> TraversalBVH:
    meta = (
        (bvh.child << _META_CHILD_SHIFT)
        | (jnp.clip(bvh.count, 0, _META_COUNT_MASK) << _META_COUNT_SHIFT)
        | jnp.clip(bvh.type, 0, _META_TYPE_MASK)
    ).astype(jnp.int32)
    f2i = lambda a: jax.lax.bitcast_convert_type(a.astype(jnp.float32), jnp.int32)  # noqa: E731
    rows = jnp.concatenate(
        [
            f2i(bvh.node_min),
            f2i(bvh.node_max),
            meta[:, None],
            jnp.zeros((bvh.num_slots, 1), jnp.int32),
        ],
        axis=1,
    )
    return TraversalBVH(rows=rows, root=bvh.root, root_count=bvh.root_count)


def pack_pairs(pairs: TrianglePairs) -> PackedPairs:
    f2i = lambda a: jax.lax.bitcast_convert_type(a.astype(jnp.float32), jnp.int32)  # noqa: E731
    rows = jnp.concatenate(
        [
            f2i(pairs.v0),
            f2i(pairs.v1),
            f2i(pairs.v2),
            f2i(pairs.v3),
            pairs.prim_id_0.astype(jnp.int32)[:, None],
            pairs.prim_id_1.astype(jnp.int32)[:, None],
            pairs.rot_0.astype(jnp.int32)[:, None],
            pairs.rot_1.astype(jnp.int32)[:, None],
        ],
        axis=1,
    )
    return PackedPairs(rows=rows)


def trace_rays(
    trav: TraversalBVH,
    pairs: PackedPairs,
    rays: Rays,
    max_width: int = 2,
    active=None,
) -> Tuple[HitRecord, TraceStats]:
    """Closest-hit trace of a ray batch against the BVH.

    max_width is the static bound on a node group's child count (2 for the
    binary builders; the SAH top-of-tree stitch can use wider roots).
    ``active`` (optional [R] bool) starts dead lanes with an empty stack so
    retired wavefront rays cost nothing (used by the path tracer).
    """
    num_rays = rays.origin.shape[0]
    num_slots = trav.rows.shape[0]
    num_pairs = pairs.rows.shape[0]
    ridx = jnp.arange(num_rays, dtype=jnp.int32)

    stack = jnp.zeros((num_rays, STACK_DEPTH), jnp.int32)
    root_entry = (trav.root.astype(jnp.int32) << _ENTRY_SHIFT) | trav.root_count.astype(
        jnp.int32
    )
    stack = stack.at[:, 0].set(root_entry)
    size0 = (
        jnp.ones((num_rays,), jnp.int32)
        if active is None
        else active.astype(jnp.int32)
    )

    state = dict(
        stack=stack,
        size=size0,
        tmax=rays.tmax,
        hit=jnp.zeros((num_rays,), bool),
        prim_id=jnp.zeros((num_rays,), jnp.int32),
        tri_id=jnp.zeros((num_rays,), jnp.int32),
        bary_u=jnp.zeros((num_rays,), jnp.float32),
        bary_v=jnp.zeros((num_rays,), jnp.float32),
        box_tests=jnp.zeros((num_rays,), jnp.int32),
        tri_tests=jnp.zeros((num_rays,), jnp.int32),
    )

    def cond(s):
        return jnp.any(s["size"] > 0)

    def body(s):
        active = s["size"] > 0
        pos = jnp.maximum(s["size"] - 1, 0)
        entry = jnp.take_along_axis(s["stack"], pos[:, None], axis=1)[:, 0]
        size = jnp.where(active, s["size"] - 1, 0)
        index = entry >> _ENTRY_SHIFT
        count = entry & _COUNT_MASK

        stack_arr = s["stack"]
        tmax = s["tmax"]
        hit = s["hit"]
        prim_id = s["prim_id"]
        tri_id = s["tri_id"]
        bary_u = s["bary_u"]
        bary_v = s["bary_v"]
        box_tests = s["box_tests"]
        tri_tests = s["tri_tests"]

        have_buf = jnp.zeros((num_rays,), bool)
        buf_entry = jnp.zeros((num_rays,), jnp.int32)
        buf_dist = jnp.zeros((num_rays,), jnp.float32)

        for i in range(max_width):
            valid = active & (i < count)
            slot = jnp.clip(index + i, 0, num_slots - 1)
            row = trav.rows[slot]  # [R, 8] gather
            nmin = jax.lax.bitcast_convert_type(row[:, 0:3], jnp.float32)
            nmax = jax.lax.bitcast_convert_type(row[:, 3:6], jnp.float32)
            meta = row[:, 6]
            child = meta >> _META_CHILD_SHIFT
            ccount = (meta >> _META_COUNT_SHIFT) & _META_COUNT_MASK
            ntype = meta & _META_TYPE_MASK
            valid = valid & (ntype != CHILD_NONE)

            box_hit, dist = intersect_ray_aabb(
                nmin, nmax, rays.origin, rays.direction, rays.tmin, tmax
            )
            box_tests = box_tests + valid.astype(jnp.int32)

            # --- leaf: TrianglePair intersection (src/Tracer.cu:293-306) ---
            do_leaf = valid & box_hit & (ntype == CHILD_TRI)
            prow = pairs.rows[jnp.clip(child, 0, num_pairs - 1)]  # [R, 16]
            i2f = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)  # noqa: E731
            v0, v1, v2, v3 = (
                i2f(prow[:, 0:3]),
                i2f(prow[:, 3:6]),
                i2f(prow[:, 6:9]),
                i2f(prow[:, 9:12]),
            )
            p0 = prow[:, 12]
            p1 = prow[:, 13]
            tri_tests = tri_tests + do_leaf.astype(jnp.int32)

            acc_a, t_a, u_a, v_a = intersect_ray_triangle(
                v0, v1, v2, rays.origin, rays.direction, rays.tmin, tmax
            )
            take_a = do_leaf & acc_a
            tmax = jnp.where(take_a, t_a, tmax)
            hit = hit | take_a
            prim_id = jnp.where(take_a, p0, prim_id)
            tri_id = jnp.where(take_a, child << 1, tri_id)
            bary_u = jnp.where(take_a, u_a, bary_u)
            bary_v = jnp.where(take_a, v_a, bary_v)

            # Second triangle tested when node.count > 0 (always for the
            # builders here; v3 == v2 keeps unpaired leaves degenerate).
            pair_flag = ccount > 0
            acc_b, t_b, u_b, v_b = intersect_ray_triangle(
                v2, v1, v3, rays.origin, rays.direction, rays.tmin, tmax
            )
            take_b = do_leaf & pair_flag & acc_b
            tmax = jnp.where(take_b, t_b, tmax)
            hit = hit | take_b
            prim_id = jnp.where(take_b, p1, prim_id)
            tri_id = jnp.where(take_b, (child << 1) + 1, tri_id)
            bary_u = jnp.where(take_b, u_b, bary_u)
            bary_v = jnp.where(take_b, v_b, bary_v)

            # --- interior: near-child buffering (src/Tracer.cu:341-362) ---
            do_box = valid & box_hit & (ntype == CHILD_BOX)
            new_entry = (child << _ENTRY_SHIFT) | ccount
            first = do_box & ~have_buf
            buf_entry = jnp.where(first, new_entry, buf_entry)
            buf_dist = jnp.where(first, dist, buf_dist)

            second = do_box & have_buf
            closer = (dist < buf_dist) | (
                (dist == buf_dist) & (child > (buf_entry >> _ENTRY_SHIFT))
            )
            push_entry = jnp.where(closer, buf_entry, new_entry)
            buf_entry = jnp.where(second & closer, new_entry, buf_entry)
            buf_dist = jnp.where(second & closer, dist, buf_dist)

            push_pos = jnp.where(second, jnp.minimum(size, STACK_DEPTH - 1), STACK_DEPTH)
            stack_arr = stack_arr.at[ridx, push_pos].set(push_entry, mode="drop")
            size = size + second.astype(jnp.int32)
            have_buf = have_buf | do_box

        push_pos = jnp.where(have_buf, jnp.minimum(size, STACK_DEPTH - 1), STACK_DEPTH)
        stack_arr = stack_arr.at[ridx, push_pos].set(buf_entry, mode="drop")
        size = size + have_buf.astype(jnp.int32)

        return dict(
            stack=stack_arr,
            size=size,
            tmax=tmax,
            hit=hit,
            prim_id=prim_id,
            tri_id=tri_id,
            bary_u=bary_u,
            bary_v=bary_v,
            box_tests=box_tests,
            tri_tests=tri_tests,
        )

    out = jax.lax.while_loop(cond, body, state)
    rec = HitRecord(
        hit=out["hit"],
        t=out["tmax"],
        prim_id=out["prim_id"],
        tri_id=out["tri_id"],
        bary_u=out["bary_u"],
        bary_v=out["bary_v"],
    )
    stats = TraceStats(box_tests=out["box_tests"], tri_tests=out["tri_tests"])
    return rec, stats
