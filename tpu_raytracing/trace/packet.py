"""Packet BVH traversal — the TPU fast path.

The scalar wavefront tracer (trace/traverse.py) preserves the reference's
exact per-ray traversal order, but on TPU its per-ray stacks and per-ray
node gathers are ruinous: every step moves one element per ray of an [R, 64]
stack and gathers a node row per ray. A TPU is a dense-vector machine, so
the fast path amortizes all of that over *packets*: one traversal stack per
packet of K rays, one node fetch per packet per step, and the slab/triangle
tests run densely over the packet's K rays on the VPU (K = 128 matches the
lane width).

A packet descends a node if ANY of its rays hits the node's box; each ray
still applies its own box-test mask and tmax pruning, so closest-hit results
equal the scalar tracer's (a ray's winning leaf is always visited: the ray
hits every ancestor box of that leaf, hence so does its packet). Traversal
*order* differs, so exact equal-t tie resolution can differ from the
reference megakernel — the scalar tracer remains available where bit-exact
tie parity matters.

Near-child ordering uses the packet-min entry distance with the reference's
higher-child-index tie-break (src/Tracer.cu:341-362 at packet granularity).
Primary rays should be tiled so a packet covers a compact pixel block (see
``tile_permutation``); bounce rays regain coherence through the path
tracer's compaction sort.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracing.bvh.types import CHILD_BOX, CHILD_NONE, CHILD_TRI, STACK_DEPTH
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
    TraversalBVH,
)

# Python float, NOT a jnp scalar: module-level device arrays become
# jit-captured device constants, which this backend re-stages per call.
_F32_MAX = float(jnp.finfo(jnp.float32).max)


def tile_permutation(width: int, height: int, tile_w: int = 16, tile_h: int = 8):
    """Permutation mapping row-major pixel order to tile-major order, so each
    consecutive block of tile_w*tile_h rays is a compact screen tile.

    Returns (perm, inv_perm) with rays_tiled = rays[perm],
    results_rowmajor = results_tiled[inv_perm].
    """
    assert width % tile_w == 0 and height % tile_h == 0
    idx = np.arange(width * height, dtype=np.int32).reshape(height, width)
    tiles = idx.reshape(height // tile_h, tile_h, width // tile_w, tile_w)
    perm = tiles.transpose(0, 2, 1, 3).reshape(-1)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return jnp.asarray(perm), jnp.asarray(inv)


def tile_reorder(a, width: int, height: int, tile_w: int = 16, tile_h: int = 8):
    """Row-major -> tile-major via reshape/transpose (no index constants:
    gather permutations embed megabytes of literals in the compiled module,
    which overflows this backend's remote-compile payload limit)."""
    lead = a.shape[1:]
    x = a.reshape(height // tile_h, tile_h, width // tile_w, tile_w, *lead)
    perm = (0, 2, 1, 3) + tuple(range(4, 4 + len(lead)))
    return x.transpose(*perm).reshape(width * height, *lead)


def tile_restore(a, width: int, height: int, tile_w: int = 16, tile_h: int = 8):
    """Inverse of tile_reorder."""
    lead = a.shape[1:]
    x = a.reshape(height // tile_h, width // tile_w, tile_h, tile_w, *lead)
    perm = (0, 2, 1, 3) + tuple(range(4, 4 + len(lead)))
    return x.transpose(*perm).reshape(width * height, *lead)


def pad_frame(a, width: int, height: int, pw: int, ph: int):
    """Row-major [H*W, ...] -> [ph*pw, ...] edge-replicated pad, so any
    resolution can ride packet tracers whose tiles need divisible frames
    (e.g. 1080 % 8 != 0 at the flagship kernel's 16x16 tiles). Edge
    replication keeps pad rays geometrically valid (no NaN inv_dir);
    they are masked dead via the live mask below."""
    lead = a.shape[1:]
    x = a.reshape(height, width, *lead)
    x = jnp.pad(x, [(0, ph - height), (0, pw - width)] + [(0, 0)] * len(lead),
                mode="edge")
    return x.reshape(ph * pw, *lead)


def crop_frame(a, width: int, height: int, pw: int, ph: int):
    """Inverse of pad_frame: [ph*pw, ...] -> row-major [H*W, ...]."""
    lead = a.shape[1:]
    x = a.reshape(ph, pw, *lead)
    return x[:height, :width].reshape(height * width, *lead)


def pad_live_mask(width: int, height: int, pw: int, ph: int):
    """[ph*pw] bool: True on the live (unpadded) pixel region."""
    row = jnp.arange(ph, dtype=jnp.int32)[:, None] < height
    col = jnp.arange(pw, dtype=jnp.int32)[None, :] < width
    return (row & col).reshape(ph * pw)


def trace_rays_packet(
    trav: TraversalBVH,
    pairs: PackedPairs,
    rays: Rays,
    max_width: int = 2,
    active=None,
    packet_size: int = 128,
) -> Tuple[HitRecord, TraceStats]:
    """Closest-hit trace with one stack per packet of ``packet_size`` rays.

    The ray count must be a multiple of packet_size (pad if needed).
    """
    num_rays = rays.origin.shape[0]
    assert num_rays % packet_size == 0, "pad rays to a packet multiple"
    num_p = num_rays // packet_size
    k = packet_size
    num_slots = trav.rows.shape[0]
    num_pairs = pairs.rows.shape[0]
    pidx = jnp.arange(num_p, dtype=jnp.int32)

    def pk(a):
        return a.reshape(num_p, k, *a.shape[1:])

    origin = pk(rays.origin)
    direction = pk(rays.direction)
    tmin = pk(rays.tmin)

    stack = jnp.zeros((num_p, STACK_DEPTH), jnp.int32)
    root_entry = (trav.root.astype(jnp.int32) << _ENTRY_SHIFT) | trav.root_count.astype(
        jnp.int32
    )
    stack = stack.at[:, 0].set(root_entry)
    if active is None:
        size0 = jnp.ones((num_p,), jnp.int32)
    else:
        size0 = jnp.any(pk(active), axis=1).astype(jnp.int32)
    ray_on = (
        jnp.ones((num_p, k), bool) if active is None else pk(active)
    )

    state = dict(
        stack=stack,
        size=size0,
        tmax=pk(rays.tmax),
        hit=jnp.zeros((num_p, k), bool),
        prim_id=jnp.zeros((num_p, k), jnp.int32),
        tri_id=jnp.zeros((num_p, k), jnp.int32),
        bary_u=jnp.zeros((num_p, k), jnp.float32),
        bary_v=jnp.zeros((num_p, k), jnp.float32),
        box_tests=jnp.zeros((num_p, k), jnp.int32),
        tri_tests=jnp.zeros((num_p, k), jnp.int32),
    )

    def cond(s):
        return jnp.any(s["size"] > 0)

    def body(s):
        active_p = s["size"] > 0
        pos = jnp.maximum(s["size"] - 1, 0)
        entry = jnp.take_along_axis(s["stack"], pos[:, None], axis=1)[:, 0]
        size = jnp.where(active_p, s["size"] - 1, 0)
        index = entry >> _ENTRY_SHIFT
        count = entry & _COUNT_MASK

        stack_arr = s["stack"]
        tmax = s["tmax"]
        hit = s["hit"]
        prim_id, tri_id = s["prim_id"], s["tri_id"]
        bary_u, bary_v = s["bary_u"], s["bary_v"]
        box_tests, tri_tests = s["box_tests"], s["tri_tests"]

        have_buf = jnp.zeros((num_p,), bool)
        buf_entry = jnp.zeros((num_p,), jnp.int32)
        buf_dist = jnp.zeros((num_p,), jnp.float32)

        for i in range(max_width):
            valid = active_p & (i < count)
            slot = jnp.clip(index + i, 0, num_slots - 1)
            row = trav.rows[slot]  # [P, 8] — one gather per packet
            nmin = jax.lax.bitcast_convert_type(row[:, 0:3], jnp.float32)
            nmax = jax.lax.bitcast_convert_type(row[:, 3:6], jnp.float32)
            meta = row[:, 6]
            child = meta >> _META_CHILD_SHIFT
            ccount = (meta >> _META_COUNT_SHIFT) & _META_COUNT_MASK
            ntype = meta & _META_TYPE_MASK
            valid = valid & (ntype != CHILD_NONE)

            # Dense slab test of the whole packet against one box.
            box_hit, dist = intersect_ray_aabb(
                nmin[:, None, :], nmax[:, None, :], origin, direction, tmin, tmax
            )  # [P, K]
            box_hit = box_hit & ray_on
            box_tests = box_tests + (valid[:, None] & ray_on).astype(jnp.int32)
            any_hit = jnp.any(box_hit, axis=1) & valid

            is_leaf = ntype == CHILD_TRI
            do_leaf = any_hit & is_leaf
            prow = pairs.rows[jnp.clip(child, 0, num_pairs - 1)]  # [P, 16]
            i2f = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)  # noqa: E731
            v0 = i2f(prow[:, 0:3])[:, None, :]
            v1 = i2f(prow[:, 3:6])[:, None, :]
            v2 = i2f(prow[:, 6:9])[:, None, :]
            v3 = i2f(prow[:, 9:12])[:, None, :]
            p0 = prow[:, 12]
            p1 = prow[:, 13]
            tri_tests = tri_tests + (do_leaf[:, None] & box_hit).astype(jnp.int32)

            acc_a, t_a, u_a, v_a = intersect_ray_triangle(
                v0, v1, v2, origin, direction, tmin, tmax
            )
            take_a = do_leaf[:, None] & box_hit & acc_a
            tmax = jnp.where(take_a, t_a, tmax)
            hit = hit | take_a
            prim_id = jnp.where(take_a, p0[:, None], prim_id)
            tri_id = jnp.where(take_a, (child << 1)[:, None], tri_id)
            bary_u = jnp.where(take_a, u_a, bary_u)
            bary_v = jnp.where(take_a, v_a, bary_v)

            acc_b, t_b, u_b, v_b = intersect_ray_triangle(
                v2, v1, v3, origin, direction, tmin, tmax
            )
            take_b = do_leaf[:, None] & box_hit & (ccount > 0)[:, None] & acc_b
            tmax = jnp.where(take_b, t_b, tmax)
            hit = hit | take_b
            prim_id = jnp.where(take_b, p1[:, None], prim_id)
            tri_id = jnp.where(take_b, ((child << 1) + 1)[:, None], tri_id)
            bary_u = jnp.where(take_b, u_b, bary_u)
            bary_v = jnp.where(take_b, v_b, bary_v)

            # Interior: packet-level near-child ordering by min entry
            # distance over hitting rays.
            do_box = any_hit & (ntype == CHILD_BOX)
            dist_p = jnp.min(jnp.where(box_hit, dist, _F32_MAX), axis=1)
            new_entry = (child << _ENTRY_SHIFT) | ccount
            first = do_box & ~have_buf
            buf_entry = jnp.where(first, new_entry, buf_entry)
            buf_dist = jnp.where(first, dist_p, buf_dist)

            second = do_box & have_buf
            closer = (dist_p < buf_dist) | (
                (dist_p == buf_dist) & (child > (buf_entry >> _ENTRY_SHIFT))
            )
            push_entry = jnp.where(closer, buf_entry, new_entry)
            buf_entry = jnp.where(second & closer, new_entry, buf_entry)
            buf_dist = jnp.where(second & closer, dist_p, buf_dist)

            push_pos = jnp.where(second, jnp.minimum(size, STACK_DEPTH - 1), STACK_DEPTH)
            stack_arr = stack_arr.at[pidx, push_pos].set(push_entry, mode="drop")
            size = size + second.astype(jnp.int32)
            have_buf = have_buf | do_box

        push_pos = jnp.where(have_buf, jnp.minimum(size, STACK_DEPTH - 1), STACK_DEPTH)
        stack_arr = stack_arr.at[pidx, push_pos].set(buf_entry, mode="drop")
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

    def unpk(a):
        return a.reshape(num_rays, *a.shape[2:])

    rec = HitRecord(
        hit=unpk(out["hit"]),
        t=unpk(out["tmax"]),
        prim_id=unpk(out["prim_id"]),
        tri_id=unpk(out["tri_id"]),
        bary_u=unpk(out["bary_u"]),
        bary_v=unpk(out["bary_v"]),
    )
    stats = TraceStats(
        box_tests=unpk(out["box_tests"]), tri_tests=unpk(out["tri_tests"])
    )
    return rec, stats


def make_tiled_packet_tracer(width: int, height: int, tile_w: int = 16,
                             tile_h: int = 8):
    """Tracer closure that re-orders rays into screen tiles, traces packets,
    and restores row-major order — drop-in for render_frame's tracer arg."""

    def tracer(trav, pairs, rays, max_width=2, active=None):
        tiled = jax.tree.map(
            lambda a: tile_reorder(a, width, height, tile_w, tile_h), rays
        )
        act = None if active is None else tile_reorder(active, width, height,
                                                       tile_w, tile_h)
        rec, stats = trace_rays_packet(
            trav, pairs, tiled, max_width=max_width, active=act,
            packet_size=tile_w * tile_h,
        )
        rec = jax.tree.map(lambda a: tile_restore(a, width, height, tile_w, tile_h), rec)
        stats = jax.tree.map(
            lambda a: tile_restore(a, width, height, tile_w, tile_h), stats
        )
        return rec, stats

    return tracer
