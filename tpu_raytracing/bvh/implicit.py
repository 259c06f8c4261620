"""Implicit (complete-heap) LBVH — the gather-free fast rebuild mode.

Karras hierarchy construction is gather-bound on TPU (~15 ms per 1M-row
random gather pass, ~100 sequential passes: >1 s at 1M triangles). This
builder removes every gather: leaves are the Morton-sorted pairs, the
topology is a complete binary heap over the next power of two (node i's
children are slots 2i and 2i+1 — pure arithmetic), and the AABBs are built
bottom-up by pairwise min/max reductions (reshapes, no indices).

Heap layout maps directly onto the BVH slot convention: level l occupies
slots [2^l, 2^(l+1)), so concatenating levels top-down materializes the slot
arrays with no scatter. Slot 0 is unused; the root group is (1, 1).

Tree quality: for Morton-distributed leaves a median split (this) and a
highest-differing-bit split (Karras) mostly coincide; the difference shows
on very non-uniform distributions. The Karras builder stays the parity
default; this is the per-frame-rebuild fast path (BASELINE: < 20 ms at 1M).

Padding leaves (n..2^L) carry +inf/-inf boxes and are never hit.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from tpu_raytracing.bvh import lbvh
from tpu_raytracing.bvh.types import BVH, CHILD_BOX, CHILD_NONE, CHILD_TRI, TrianglePairs

_F32_MAX = float(jnp.finfo(jnp.float32).max)


def build_implicit_wide_fat(triangles: jnp.ndarray):
    """Implicit build collapsed straight to fat wide rows, gather-free.

    The heap's 8-wide structure is arithmetic: a wide node at heap level l
    has its 8 descendants at level l+3 in one contiguous slot range, so the
    collapse is slicing + reshaping (the generic build_wide_fat fixed-point
    costs seconds at 1M). Returns (FatWideBVH, TrianglePairs, BVH).
    """
    import jax

    from tpu_raytracing.bvh.wide import FatWideBVH, WIDE
    from tpu_raytracing.trace.traverse import pack_pairs

    bvh, pairs = build_implicit(triangles)
    num = triangles.shape[0]
    depth = max((num - 1).bit_length(), 1)
    cap = 1 << depth
    pair_rows = pack_pairs(pairs).rows  # [num, 16] int32
    pad_pairs = jnp.concatenate(
        [pair_rows, jnp.zeros((cap - num, 16), jnp.int32)], axis=0
    )
    f2i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731

    # Wide ids assigned level-major: wide level k holds the heap nodes of
    # level 3k; id = (8^k - 1) / 7 + offset.
    def wid_prefix(k):
        return ((8**k) - 1) // 7

    rows_per_level = []
    k = 0
    while 3 * k < depth:
        lvl = 3 * k
        step = min(3, depth - lvl)
        n_nodes = 1 << lvl
        n_child = 1 << step
        child_lvl = lvl + step
        c_start = 1 << child_lvl
        c_slots = jnp.arange(c_start, 2 * c_start, dtype=jnp.int32)
        cmin = bvh.node_min[c_start : 2 * c_start]  # contiguous slice
        cmax = bvh.node_max[c_start : 2 * c_start]
        is_leaf_lvl = child_lvl == depth
        if is_leaf_lvl:
            leaf_idx = c_slots - cap
            live = leaf_idx < num
            etype = jnp.where(live, CHILD_TRI, CHILD_NONE)
            echild = leaf_idx
            ecount = jnp.where(live, 1, 0)
            epair = pad_pairs  # leaf order == pair order: pure slice
        else:
            etype = jnp.full((2 * c_start - c_start,), CHILD_BOX, jnp.int32)
            echild = wid_prefix(k + 1) + (c_slots - c_start)
            ecount = jnp.full_like(echild, 2)
            epair = jnp.zeros((c_start, 16), jnp.int32)
        meta = (echild << 5) | (jnp.clip(ecount, 0, 7) << 2) | jnp.clip(etype, 0, 3)
        entry = jnp.concatenate(
            [f2i(cmin), f2i(cmax), meta[:, None], jnp.zeros((c_start, 1), jnp.int32)],
            axis=1,
        )  # [n_children_total, 8]
        node_words = entry.reshape(n_nodes, n_child, 8)
        pair_words = epair.reshape(n_nodes, n_child, 16)
        if n_child < WIDE:
            pad_n = WIDE - n_child
            node_words = jnp.concatenate(
                [node_words, jnp.zeros((n_nodes, pad_n, 8), jnp.int32)], axis=1
            )
            pair_words = jnp.concatenate(
                [pair_words, jnp.zeros((n_nodes, pad_n, 16), jnp.int32)], axis=1
            )
        row = jnp.concatenate(
            [node_words.reshape(n_nodes, 64), pair_words.reshape(n_nodes, 128)],
            axis=1,
        )
        rows_per_level.append(row)
        k += 1

    rows = jnp.concatenate(rows_per_level, axis=0)
    fat = FatWideBVH(rows=rows, num_nodes=jnp.int32(rows.shape[0]))
    return fat, pairs, bvh


def build_implicit(triangles: jnp.ndarray) -> Tuple[BVH, TrianglePairs]:
    """Morton sort + complete-tree AABB reduction. Returns (BVH, pairs)."""
    num = triangles.shape[0]
    aabb_min, aabb_max = lbvh.scene_aabb(triangles)
    codes, values = lbvh.generate_morton_codes(triangles, aabb_min, aabb_max)
    _, sorted_values = lbvh.sort_codes(codes, values)
    pairs = lbvh.generate_triangles(sorted_values, triangles)

    depth = max((num - 1).bit_length(), 1)
    cap = 1 << depth
    lo = jnp.minimum(jnp.minimum(pairs.v0, pairs.v1), jnp.minimum(pairs.v2, pairs.v3))
    hi = jnp.maximum(jnp.maximum(pairs.v0, pairs.v1), jnp.maximum(pairs.v2, pairs.v3))
    lo = jnp.concatenate([lo, jnp.full((cap - num, 3), _F32_MAX, jnp.float32)])
    hi = jnp.concatenate([hi, jnp.full((cap - num, 3), -_F32_MAX, jnp.float32)])

    # Bottom-up pairwise unions: levels[k] has cap >> k boxes.
    level_lo = [lo]
    level_hi = [hi]
    for _ in range(depth):
        level_lo.append(jnp.min(level_lo[-1].reshape(-1, 2, 3), axis=1))
        level_hi.append(jnp.max(level_hi[-1].reshape(-1, 2, 3), axis=1))

    # Heap slots [1, 2*cap): level l (top-down) at [2^l, 2^(l+1)).
    node_min = jnp.concatenate(
        [jnp.full((1, 3), _F32_MAX, jnp.float32)] + level_lo[::-1]
    )
    node_max = jnp.concatenate(
        [jnp.full((1, 3), -_F32_MAX, jnp.float32)] + level_hi[::-1]
    )

    slots = jnp.arange(2 * cap, dtype=jnp.int32)
    is_leaf_level = slots >= cap
    leaf_idx = slots - cap
    live_leaf = is_leaf_level & (leaf_idx < num)
    ntype = jnp.where(
        live_leaf, CHILD_TRI, jnp.where(is_leaf_level, CHILD_NONE, CHILD_BOX)
    ).astype(jnp.int32)
    ntype = ntype.at[0].set(CHILD_NONE)
    child = jnp.where(is_leaf_level, leaf_idx, 2 * slots).astype(jnp.int32)
    count = jnp.where(
        ntype == CHILD_BOX, 2, jnp.where(ntype == CHILD_TRI, 1, 0)
    ).astype(jnp.int32)
    parent = jnp.maximum(slots >> 1, 1).astype(jnp.int32)

    bvh = BVH(
        node_min=node_min,
        node_max=node_max,
        child=child,
        count=count,
        type=ntype,
        parent=parent,
        root=jnp.int32(1),
        root_count=jnp.int32(1),
    )
    return bvh, pairs
