"""8-wide BVH: on-device collapse of the binary BVH for packet traversal.

TPU traversal cost is dominated by while_loop trip count (each step is a
serialized dense op over all packets), so fewer, fatter steps win: an 8-wide
node replaces ~3 binary levels, cutting pops ~4x while the extra per-step
box tests ride free on the VPU.

The collapse is itself a dense jitted pass (it must run per frame for
animated rebuilds): every Box slot's 3-level frontier (up to 8 descendants,
early-stopping at leaves) is computed vectorized, anchor nodes (those
reachable as frontier entries from the virtual root) are marked by an
iterative fixed-point, and each anchor packs one [64] int32 row: 8 child
entries x (aabb 6 f32 bitcast, meta, pad).

Meta word layout matches the binary packer: child << 5 | count << 2 | type,
where child is a wide-node id for Box entries and a pair index for Tri
entries.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from tpu_raytracing.bvh.types import BVH, CHILD_BOX, CHILD_NONE, CHILD_TRI

WIDE = 8
# Python float, NOT a jnp scalar: module-level device arrays become
# jit-captured device constants, which this backend re-stages per call.
_F32_MAX = float(jnp.finfo(jnp.float32).max)


@flax.struct.dataclass
class WideBVH:
    rows: jnp.ndarray  # [W, 64] int32 — 8 entries x (min3,max3 bitcast, meta, pad)
    num_nodes: jnp.ndarray  # [] int32 — live wide nodes (root = 0)


def _frontier(bvh: BVH) -> jnp.ndarray:
    """3-level frontier of every Box slot: [N, 8] binary-slot ids, -1 holes.

    Level 1 is the slot's own child pair; each further level expands Box
    entries into their children in place (leaves ride along, holes stay -1).
    A leaf's early stop leaves holes, so wide nodes can have < 8 entries.
    """
    n = bvh.num_slots
    is_box = bvh.type == CHILD_BOX
    c = bvh.child
    entries = jnp.stack(
        [jnp.where(is_box, c, -1), jnp.where(is_box, c + 1, -1)], axis=1
    )
    for _ in range(2):  # levels 2 and 3
        w = entries.shape[1]
        s = jnp.clip(entries, 0, n - 1)
        expand = (entries >= 0) & (bvh.type[s] == CHILD_BOX)
        left = jnp.where(expand, bvh.child[s], entries)
        right = jnp.where(expand, bvh.child[s] + 1, -1)
        entries = jnp.stack([left, right], axis=2).reshape(n, 2 * w)
    return entries


def build_wide(bvh: BVH, max_iters: int = 24) -> WideBVH:
    """Collapse a binary BVH (any of the three builders) to 8-wide."""
    n = bvh.num_slots
    frontier_slot = _frontier(bvh)

    # Virtual-root frontier: expand the root group two more levels so the
    # root row holds up to 8 entries (root group is 1 or 2 slots).
    root = bvh.root.astype(jnp.int32)
    rc = bvh.root_count.astype(jnp.int32)
    root_entries = jnp.where(
        jnp.arange(WIDE) < rc, root + jnp.arange(WIDE, dtype=jnp.int32), -1
    )
    # Pair roots (rc=2) reach 8 entries after 2 expansions (2->4->8); single
    # roots need 3 (1->2->4->8). Levels must match `base` below exactly —
    # over-expanding a pair root with shallow leaves would go ragged (budget
    # stops mid-level), breaking the uniform-depth invariant.
    root_frontier = jnp.where(
        rc == 2,
        _expand_group(bvh, root_entries, levels=2),
        _expand_group(bvh, root_entries, levels=3),
    )

    # Anchors are the Box slots whose depth is (root-frontier depth) + 3k.
    # The root row expands the root group to full levels (2 -> 4 -> 8 slots,
    # depth 2 for a pair root, depth 3 for a single root), and every deeper
    # anchor sits exactly 3 levels below one, so anchor membership is pure
    # depth arithmetic — no reachability fixed point (whose carried
    # gather/scatter costs seconds at 1M on this backend).
    slots_i = jnp.arange(n, dtype=jnp.int32)
    anc = bvh.parent
    depth = (anc != slots_i).astype(jnp.int32)
    for _ in range(7):  # tree depth <= 64 -> 7 doublings saturate
        depth = depth + depth[anc]
        anc = anc[anc]
    base = jnp.where(rc == 2, 2, 3)
    anchor = (
        (bvh.type == CHILD_BOX)
        & (depth >= base)
        & ((depth - base) % 3 == 0)
    )

    # Wide ids: 0 = virtual root, anchors get 1 + rank.
    rank = jnp.cumsum(anchor.astype(jnp.int32)) - anchor.astype(jnp.int32)
    wid_of_slot = jnp.where(anchor, 1 + rank, -1)
    num_wide = 1 + jnp.sum(anchor.astype(jnp.int32))

    # Pack rows: for each anchor its frontier, for the root its expansion.
    def pack_entries(entries):
        """entries: [..., 8] binary-slot ids (-1 empty) -> [..., 64] row."""
        s = jnp.clip(entries, 0, n - 1)
        valid = entries >= 0
        t = jnp.where(valid, bvh.type[s], CHILD_NONE)
        is_box_e = t == CHILD_BOX
        child = jnp.where(is_box_e, wid_of_slot[s], bvh.child[s])
        count = bvh.count[s]
        meta = (
            (jnp.maximum(child, 0) << 5)
            | (jnp.clip(count, 0, 7) << 2)
            | jnp.clip(jnp.where(valid, t, CHILD_NONE), 0, 3)
        ).astype(jnp.int32)
        f2i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
        nmin = jnp.where(valid[..., None], bvh.node_min[s], _F32_MAX)
        nmax = jnp.where(valid[..., None], bvh.node_max[s], -_F32_MAX)
        row = jnp.concatenate(
            [
                f2i(nmin.astype(jnp.float32)),
                f2i(nmax.astype(jnp.float32)),
                meta[..., None],
                jnp.zeros(meta.shape + (1,), jnp.int32),
            ],
            axis=-1,
        )  # [..., 8, 8]
        return row.reshape(row.shape[:-2] + (WIDE * 8,))

    all_rows = pack_entries(frontier_slot)  # [N, 64]
    root_row = pack_entries(root_frontier[None, :])  # [1, 64]

    num_rows = n + 1  # worst case every slot an anchor, plus root
    rows = jnp.zeros((num_rows, WIDE * 8), jnp.int32)
    # NONE-typed empty rows: meta 0 == CHILD_NONE everywhere.
    rows = rows.at[0].set(root_row[0])
    dest = jnp.where(anchor, 1 + rank, num_rows)
    rows = rows.at[dest].set(all_rows, mode="drop")
    return WideBVH(rows=rows, num_nodes=num_wide)


@flax.struct.dataclass
class FatWideBVH:
    """Wide BVH with leaf pair data inlined into the node rows.

    Entry layout (24 int32): min3 max3 (bitcast f32), meta, pad, then the
    16-word packed pair (v0..v3 bitcast, prim0, prim1, rot0, rot1) for Tri
    entries (zeros for Box). One 768-byte row gather per pop replaces the
    node gather plus up to eight pair gathers — gather count per traversal
    step is the dominant cost on this backend.
    """

    rows: jnp.ndarray  # [W, 8 * 24] int32
    num_nodes: jnp.ndarray  # [] int32


ENTRY_WORDS = 24


def build_wide_fat(bvh: BVH, pair_rows: jnp.ndarray, max_iters: int = 24) -> FatWideBVH:
    """Collapse to 8-wide with inlined pair data (pair_rows: PackedPairs.rows).

    Pair data is gathered one entry slot at a time: a single [W, 8, 16]
    gather would tile-pad its 16-wide minor dim to 128 lanes (8x memory) and
    OOM at 1M triangles.
    """
    w = build_wide(bvh, max_iters=max_iters)
    rows = w.rows.reshape(-1, WIDE, 8)
    meta = rows[:, :, 6]
    ntype = meta & 3
    child = meta >> 5
    num_pairs = pair_rows.shape[0]
    parts = [rows.reshape(-1, WIDE * 8)]
    for e in range(WIDE):
        pe = pair_rows[jnp.clip(child[:, e], 0, num_pairs - 1)]  # [W, 16]
        parts.append(jnp.where((ntype[:, e] == CHILD_TRI)[:, None], pe, 0))
    # Layout: 64 node words, then entry 0..7's 16 pair words each.
    fat = jnp.concatenate(parts, axis=1)  # [W, 64 + 128]
    return FatWideBVH(rows=fat, num_nodes=w.num_nodes)


def _expand_group(bvh: BVH, entries: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Expand a [8] entry set ``levels`` times within the 8-slot budget.

    Each pass expands Box entries into their two children as long as the
    total stays within 8 (Box entries beyond the budget stay as-is).
    """
    n = bvh.num_slots
    for _ in range(levels):
        s = jnp.clip(entries, 0, n - 1)
        valid = entries >= 0
        is_box_e = valid & (bvh.type[s] == CHILD_BOX)
        count = valid.sum()
        # Expansion adds one entry per expanded box; expand greedily from the
        # left while the budget allows.
        order = jnp.cumsum(is_box_e.astype(jnp.int32))
        can = is_box_e & (count + order <= WIDE)
        # New layout: each entry becomes 1 or 2 outputs, compacted.
        outs = jnp.where(can, 2, valid.astype(jnp.int32))
        starts = jnp.cumsum(outs) - outs
        c = bvh.child[s]
        first = jnp.where(can, c, entries)
        second = jnp.where(can, c + 1, -1)
        new = jnp.full((WIDE,), -1, jnp.int32)
        new = new.at[jnp.where(valid, starts, WIDE)].set(first, mode="drop")
        new = new.at[jnp.where(can, starts + 1, WIDE)].set(second, mode="drop")
        entries = new
    return entries
