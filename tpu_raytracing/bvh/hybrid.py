"""Hybrid builder: LBVH bottom, SAH-rebuilt top
(reference: src/BottomUpBuilder.cu:314-371 + src/BuildWrapper.cu:350-361).

The LBVH's top levels are its weakest (Morton-order splits ignore surface
area); the hybrid extracts the sub-tree root pairs at depth 8 and rebuilds
the tree above them with the binned-SAH frontier builder, grafting each
sub-root pair as a Box leaf.

The reference's ExtractDepth walks 256 threads down bit-paths with atomicAdd
compaction (nondeterministic order); here the walk is a breadth-first
expansion of a statically shaped frontier and the output order is the BFS
order (deterministic).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from tpu_raytracing.bvh import lbvh
from tpu_raytracing.bvh.sah import Arena, LeafInput, frontier_build
from tpu_raytracing.bvh.types import BVH, CHILD_BOX, CHILD_TRI, TrianglePairs

EXTRACT_DEPTH = 8  # reference target_depth (src/BuildWrapper.cu:354)
MAX_SUBROOTS = 1 << EXTRACT_DEPTH


def extract_depth(bvh: BVH):
    """Collect sub-tree root *pairs* at depth <= EXTRACT_DEPTH
    (src/BottomUpBuilder.cu:314-371).

    A pair stops descending early when either slot is a Tri leaf. Returns
    (pair_index[MAX_SUBROOTS], aabb_min, aabb_max, valid_count) where
    aabb = union of the pair's two slots.
    """
    # Frontier of pair start indices; -1 marks empty. Start at the root pair.
    frontier = jnp.full((MAX_SUBROOTS,), -1, jnp.int32).at[0].set(
        bvh.root.astype(jnp.int32)
    )
    done = jnp.zeros((MAX_SUBROOTS,), bool)

    num_slots = bvh.num_slots
    for _ in range(EXTRACT_DEPTH):
        idx = jnp.clip(frontier, 0, num_slots - 1)
        is_leaf_pair = (bvh.type[idx] == CHILD_TRI) | (
            bvh.type[jnp.clip(idx + 1, 0, num_slots - 1)] == CHILD_TRI
        )
        live = frontier >= 0
        stop = live & (done | is_leaf_pair)
        expand = live & ~stop
        # Children pairs of the two slots.
        child_a = bvh.child[idx]
        child_b = bvh.child[jnp.clip(idx + 1, 0, num_slots - 1)]
        new = jnp.full((MAX_SUBROOTS,), -1, jnp.int32)
        n = frontier.shape[0]
        counts = jnp.where(stop, 1, jnp.where(expand, 2, 0))
        starts = jnp.cumsum(counts) - counts
        oob = jnp.int32(n)
        keep_slot = jnp.where(stop, starts, oob)
        a_slot = jnp.where(expand, starts, oob)
        b_slot = jnp.where(expand, starts + 1, oob)
        new = new.at[keep_slot].set(frontier, mode="drop")
        new = new.at[a_slot].set(child_a, mode="drop")
        new = new.at[b_slot].set(child_b, mode="drop")
        new_done = jnp.zeros((MAX_SUBROOTS,), bool).at[keep_slot].set(True, mode="drop")
        frontier = new
        done = new_done

    valid = frontier >= 0
    count = jnp.sum(valid.astype(jnp.int32))
    idx = jnp.clip(frontier, 0, num_slots - 1)
    idx1 = jnp.clip(idx + 1, 0, num_slots - 1)
    amin = jnp.minimum(bvh.node_min[idx], bvh.node_min[idx1])
    amax = jnp.maximum(bvh.node_max[idx], bvh.node_max[idx1])
    return frontier, amin, amax, count


def build_hybrid(triangles: jnp.ndarray, enable_pairs: bool = False) -> Tuple[BVH, TrianglePairs]:
    """LBVH build + SAH re-top (reference: RunBottomUpBuild(hybrid=true),
    src/BuildWrapper.cu:350-361). Root becomes a single node appended after
    the LBVH slots, with count 1."""
    base, pairs = lbvh.build_lbvh(triangles, enable_pairs=enable_pairs)
    sub_idx, sub_min, sub_max, sub_count = extract_depth(base)

    num_base = base.num_slots
    extra = 2 * MAX_SUBROOTS + 2
    arena = Arena(
        node_min=jnp.concatenate([base.node_min, jnp.full((extra, 3), 3.4e38, jnp.float32)]),
        node_max=jnp.concatenate([base.node_max, jnp.full((extra, 3), -3.4e38, jnp.float32)]),
        child=jnp.concatenate([base.child, jnp.zeros((extra,), jnp.int32)]),
        count=jnp.concatenate([base.count, jnp.zeros((extra,), jnp.int32)]),
        type=jnp.concatenate([base.type, jnp.zeros((extra,), jnp.int32)]),
        parent=jnp.concatenate(
            [base.parent,
             num_base + jnp.arange(extra, dtype=jnp.int32)]
        ),
        wptr=jnp.int32(num_base + 1),
    )

    # Each sub-root pair is a Box "leaf" pointing at the pair
    # (leaf_type=ChildType_Box, prim count 2 — src/BuildWrapper.cu:356-360).
    leaves = LeafInput(
        aabb_min=sub_min,
        aabb_max=sub_max,
        child=jnp.maximum(sub_idx, 0),
        count=jnp.full((MAX_SUBROOTS,), 2, jnp.int32),
        type=jnp.full((MAX_SUBROOTS,), CHILD_BOX, jnp.int32),
        num_leaves=sub_count,
    )
    root_slot = jnp.int32(num_base)
    arena = frontier_build(
        leaves,
        arena,
        jnp.array([0], jnp.int32),
        sub_count[None].astype(jnp.int32),
        root_slot[None],
        jnp.int32(1),
    )

    return (
        BVH(
            node_min=arena.node_min,
            node_max=arena.node_max,
            child=arena.child,
            count=arena.count,
            type=arena.type,
            parent=arena.parent,
            root=root_slot,
            root_count=jnp.int32(1),
        ),
        pairs,
    )
