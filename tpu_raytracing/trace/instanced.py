"""Two-level (TLAS/BLAS) wavefront traversal.

Extends the single-level tracer (trace/traverse.py) with an instance word
per stack entry: entries tagged 0 trace in world space, entries tagged i+1
trace instance i's BLAS with the ray mapped through the instance's inverse
transform. Hitting a ChildType_Inst leaf pushes the (rebased) BLAS root
entry tagged with that instance. The hit t stays parameterized on the world
ray because the object-space direction is left unnormalized.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_raytracing.bvh.tlas import InstancedAS
from tpu_raytracing.bvh.types import CHILD_BOX, CHILD_INST, CHILD_NONE, CHILD_TRI, STACK_DEPTH
from tpu_raytracing.ops.intersect import intersect_ray_aabb, intersect_ray_triangle
from tpu_raytracing.trace.brute import HitRecord
from tpu_raytracing.trace.ray import Rays
from tpu_raytracing.trace.traverse import (
    _COUNT_MASK,
    _ENTRY_SHIFT,
    _META_CHILD_SHIFT,
    _META_COUNT_MASK,
    _META_COUNT_SHIFT,
    _META_TYPE_MASK,
    PackedPairs,
    TraceStats,
)


def trace_rays_instanced(
    inst_as: InstancedAS,
    pairs: PackedPairs,
    rays: Rays,
    max_width: int = 2,
) -> Tuple[HitRecord, jnp.ndarray, TraceStats]:
    """Closest-hit over the two-level structure.

    Returns (HitRecord, hit_instance [R] int32 (-1 = none/world), stats).
    """
    trav = inst_as.trav
    num_rays = rays.origin.shape[0]
    num_slots = trav.rows.shape[0]
    num_pairs = pairs.rows.shape[0]
    ridx = jnp.arange(num_rays, dtype=jnp.int32)

    stack = jnp.zeros((num_rays, STACK_DEPTH), jnp.int32)
    stack_inst = jnp.zeros((num_rays, STACK_DEPTH), jnp.int32)
    root_entry = (trav.root.astype(jnp.int32) << _ENTRY_SHIFT) | trav.root_count.astype(
        jnp.int32
    )
    stack = stack.at[:, 0].set(root_entry)

    state = dict(
        stack=stack,
        stack_inst=stack_inst,
        size=jnp.ones((num_rays,), jnp.int32),
        tmax=rays.tmax,
        hit=jnp.zeros((num_rays,), bool),
        prim_id=jnp.zeros((num_rays,), jnp.int32),
        tri_id=jnp.zeros((num_rays,), jnp.int32),
        inst_id=jnp.full((num_rays,), -1, jnp.int32),
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
        inst = jnp.take_along_axis(s["stack_inst"], pos[:, None], axis=1)[:, 0]
        size = jnp.where(active, s["size"] - 1, 0)
        index = entry >> _ENTRY_SHIFT
        count = entry & _COUNT_MASK

        # Map the ray through the entry's instance inverse transform
        # (row 0 is identity for world-space entries).
        tf = inst_as.inv_transforms[inst]  # [R, 3, 4]
        origin = jnp.einsum("rjk,rk->rj", tf[:, :, :3], rays.origin) + tf[:, :, 3]
        direction = jnp.einsum("rjk,rk->rj", tf[:, :, :3], rays.direction)

        stack_arr, inst_arr = s["stack"], s["stack_inst"]
        tmax = s["tmax"]
        hit, prim_id, tri_id, inst_id = s["hit"], s["prim_id"], s["tri_id"], s["inst_id"]
        bary_u, bary_v = s["bary_u"], s["bary_v"]
        box_tests, tri_tests = s["box_tests"], s["tri_tests"]

        have_buf = jnp.zeros((num_rays,), bool)
        buf_entry = jnp.zeros((num_rays,), jnp.int32)
        buf_inst = jnp.zeros((num_rays,), jnp.int32)
        buf_dist = jnp.zeros((num_rays,), jnp.float32)

        def push(stack_arr, inst_arr, size, mask, entry_vals, inst_vals):
            p = jnp.where(mask, jnp.minimum(size, STACK_DEPTH - 1), STACK_DEPTH)
            stack_arr = stack_arr.at[ridx, p].set(entry_vals, mode="drop")
            inst_arr = inst_arr.at[ridx, p].set(inst_vals, mode="drop")
            return stack_arr, inst_arr, size + mask.astype(jnp.int32)

        for i in range(max_width):
            valid = active & (i < count)
            slot = jnp.clip(index + i, 0, num_slots - 1)
            row = trav.rows[slot]
            nmin = jax.lax.bitcast_convert_type(row[:, 0:3], jnp.float32)
            nmax = jax.lax.bitcast_convert_type(row[:, 3:6], jnp.float32)
            meta = row[:, 6]
            child = meta >> _META_CHILD_SHIFT
            ccount = (meta >> _META_COUNT_SHIFT) & _META_COUNT_MASK
            ntype = meta & _META_TYPE_MASK
            valid = valid & (ntype != CHILD_NONE)

            box_hit, dist = intersect_ray_aabb(
                nmin, nmax, origin, direction, rays.tmin, tmax
            )
            box_tests = box_tests + valid.astype(jnp.int32)

            # Triangle leaf (in object space of the entry's instance).
            do_leaf = valid & box_hit & (ntype == CHILD_TRI)
            prow = pairs.rows[jnp.clip(child, 0, num_pairs - 1)]
            i2f = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)  # noqa: E731
            v0, v1, v2, v3 = (
                i2f(prow[:, 0:3]), i2f(prow[:, 3:6]), i2f(prow[:, 6:9]), i2f(prow[:, 9:12])
            )
            p0 = prow[:, 12]
            p1 = prow[:, 13]
            tri_tests = tri_tests + do_leaf.astype(jnp.int32)

            for (a, b, c, pid, second) in (
                (v0, v1, v2, p0, 0),
                (v2, v1, v3, p1, 1),
            ):
                acc, t, u, v = intersect_ray_triangle(
                    a, b, c, origin, direction, rays.tmin, tmax
                )
                take = do_leaf & acc if second == 0 else do_leaf & (ccount > 0) & acc
                tmax = jnp.where(take, t, tmax)
                hit = hit | take
                prim_id = jnp.where(take, pid, prim_id)
                tri_id = jnp.where(take, (child << 1) + second, tri_id)
                inst_id = jnp.where(take, inst - 1, inst_id)
                bary_u = jnp.where(take, u, bary_u)
                bary_v = jnp.where(take, v, bary_v)

            # Interior boxes and instance leaves both become stack pushes
            # with near-child ordering; instance entries swap to the BLAS
            # root tagged with the instance.
            is_inst = ntype == CHILD_INST
            do_push = valid & box_hit & ((ntype == CHILD_BOX) | is_inst)
            new_entry = jnp.where(
                is_inst, inst_as.blas_entry, (child << _ENTRY_SHIFT) | ccount
            )
            new_inst = jnp.where(is_inst, child + 1, inst)

            first = do_push & ~have_buf
            buf_entry = jnp.where(first, new_entry, buf_entry)
            buf_inst = jnp.where(first, new_inst, buf_inst)
            buf_dist = jnp.where(first, dist, buf_dist)

            second_hit = do_push & have_buf
            closer = (dist < buf_dist) | (
                (dist == buf_dist) & (child > (buf_entry >> _ENTRY_SHIFT))
            )
            push_entry = jnp.where(closer, buf_entry, new_entry)
            push_inst = jnp.where(closer, buf_inst, new_inst)
            buf_entry = jnp.where(second_hit & closer, new_entry, buf_entry)
            buf_inst = jnp.where(second_hit & closer, new_inst, buf_inst)
            buf_dist = jnp.where(second_hit & closer, dist, buf_dist)
            stack_arr, inst_arr, size = push(
                stack_arr, inst_arr, size, second_hit, push_entry, push_inst
            )
            have_buf = have_buf | do_push

        stack_arr, inst_arr, size = push(
            stack_arr, inst_arr, size, have_buf, buf_entry, buf_inst
        )

        return dict(
            stack=stack_arr,
            stack_inst=inst_arr,
            size=size,
            tmax=tmax,
            hit=hit,
            prim_id=prim_id,
            tri_id=tri_id,
            inst_id=inst_id,
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
    return rec, out["inst_id"], TraceStats(
        box_tests=out["box_tests"], tri_tests=out["tri_tests"]
    )
