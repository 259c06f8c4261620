"""Morton-bucket wide LBVH — the gather-light fast build path.

Karras's radix tree splits nodes exactly at Morton-code prefix boundaries
(reference: src/BottomUpBuilder.cu:70-96, FindSplit). Collapsing such a tree
every 3 levels (bvh/wide.py) therefore yields wide nodes that are *3-bit
Morton prefix buckets*: a wide node's children are the non-empty octree
sub-cells of its bucket. This builder constructs those buckets directly
from the sorted code array with dense, sorted-order passes only:

* bucket boundaries per 3-bit level: one shifted prefix-compare;
* bucket ids: a cumsum; bucket start positions: one scatter;
* bucket AABBs: bottom-up over levels with 3-pass segmented min/max scans
  (each parent has <= 8 contiguous children);
* chain skipping (single-child buckets) and single-leaf inlining via a
  bottom-up effective-id recurrence (one gather per level);
* rows: per level only compact descriptors (entry meta + node AABB) are
  scattered at the bucket's global row id; the [W, 192] fat rows are then
  assembled in ONE global pass (TRI entry geometry gathered by pair id,
  Box entry AABBs gathered by child row id) — full-width rows are never
  materialized per level.

Why: the Karras+collapse pipeline is gather-bound (~2.3 s at 1M triangles
on v5e: per-node binary searches, pointer-chasing refit, anchor ranking),
while every pass here is either dense or a one-off gather/scatter with a
loop-invariant operand (~0.03 ms per 1M rows on this backend). Tree
topology and therefore traversal quality match the Karras+3-level-collapse
default; duplicate-code runs deeper than 30 bits are handled by chunk
levels (period 8^k splits inside the deepest Morton bucket), so any input
size is covered.

The tree is emitted straight into FatWideBVH rows (node AABBs + inlined
leaf pair geometry) — no intermediate binary BVH exists. Row 0 is the
root. Every row has >= 2 entries, so the row count is < num_leaves.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from tpu_raytracing.bvh import invariants
from tpu_raytracing.bvh.lbvh import (
    generate_morton_codes,
    generate_morton_codes_pairs,
    generate_triangles,
    scene_aabb,
    sort_codes,
)
from tpu_raytracing.bvh.types import CHILD_BOX, CHILD_NONE, CHILD_TRI
from tpu_raytracing.bvh.wide import WIDE, FatWideBVH
from tpu_raytracing.ops.gather import take_rows
from tpu_raytracing.trace.traverse import (
    _META_CHILD_SHIFT,
    _META_COUNT_SHIFT,
    _META_TYPE_MASK,
    PackedPairs,
    pack_pairs,
)

_F32_MAX = float(jnp.finfo(jnp.float32).max)
MORTON_LEVELS = 10  # 30 bits, 3 per level


def _segment_totals(x, heads, tails_pos, valid, op, init, width=8):
    """Per-segment reduction over segments of length <= width: log2(width)
    Hillis-Steele segmented inclusive scan passes + gather at segment tails.

    x: [M, C]; heads: [M] bool start flags; tails_pos: [B] last-element
    positions; valid: [B] bool. Returns [B, C] (init where invalid).
    """
    f = heads
    m = x.shape[0]
    shifts = []
    d = 1
    while d < width:
        shifts.append(d)
        d *= 2
    for d in shifts:
        if d >= m:  # tiny inputs: the shift falls entirely off the array
            x_shift = jnp.full_like(x, init)
            f_shift = jnp.ones((m,), bool)
        else:
            x_shift = jnp.concatenate(
                [jnp.full((d,) + x.shape[1:], init, x.dtype), x[:-d]], axis=0
            )
            f_shift = jnp.concatenate([jnp.ones((d,), bool), f[:-d]])
        x = jnp.where(f[:, None], x, op(x_shift, x))
        f = f | f_shift
    out = x[jnp.clip(tails_pos, 0, x.shape[0] - 1)]
    return jnp.where(valid[:, None], out, init)


def _sorted_leaves(triangles: jnp.ndarray, enable_pairs: bool):
    """Shared front end: Morton sort + pair assembly + leaf AABBs.

    The pair rows ride the sort as payloads (lbvh.fused_sorted_pairs):
    two ~14 ms stable sorts replace the ~175 ms of permutation gathers
    the old generate_triangles path paid at 1M."""
    aabb_min, aabb_max = scene_aabb(triangles)
    from tpu_raytracing.bvh.lbvh import fused_sorted_pairs

    sorted_codes, rows, sorted_values, num_leaves = fused_sorted_pairs(
        triangles, aabb_min, aabb_max, enable_pairs)
    packed = PackedPairs(rows=rows)
    v = jax.lax.bitcast_convert_type(rows[:, :12], jnp.float32).reshape(
        -1, 4, 3)
    lo = jnp.min(v, axis=1)
    hi = jnp.max(v, axis=1)
    ccount_leaf = (sorted_values >> 31).astype(jnp.int32)  # second tri valid
    return sorted_codes, packed, lo, hi, ccount_leaf, num_leaves


def _bucket_tables(sorted_codes: jnp.ndarray, num_leaves, n: int,
                   bits: int = 3):
    """Per-level bucket tables shared by the fat and split emitters.

    ``bits`` Morton bits per level (3 = octree / 8-wide, 4 = 16-wide).
    Returns (levels, caps, bids, poss, counts, child_starts, child_counts);
    see build_bucket_fat's docstring for the level structure.
    """
    width = 2 ** bits
    iota = jnp.arange(n, dtype=jnp.int32)
    pad_boundary = iota == num_leaves  # padded sentinel region starts here

    # --- level start masks ---
    levels = [(iota == 0) | pad_boundary]  # level 0: one live segment
    caps = [width]
    shifts_lv = []
    sh = 30
    while sh > 0:
        sh = max(sh - bits, 0)
        shifts_lv.append(sh)
    for lvl, shift in enumerate(shifts_lv, start=1):
        pref = (sorted_codes >> shift).astype(jnp.uint32)
        prev = jnp.concatenate([pref[:1] ^ jnp.uint32(1), pref[:-1]])
        levels.append((pref != prev) | (iota == 0) | pad_boundary)
        caps.append(min(width**lvl, n))
    # chunk levels: split runs inside the deepest Morton bucket at period
    # width^k so every segment bottoms out at <= width leaves whatever the
    # input.
    num_chunk = max(math.ceil(math.log(max(n, 2), width)), 1)
    m10 = levels[-1]
    seg_start = jax.lax.cummax(jnp.where(m10, iota, -1))
    idx_in_seg = iota - seg_start
    prev_starts = m10
    for k in range(num_chunk - 1, -1, -1):
        s = prev_starts | (idx_in_seg % (width ** (k + 1)) == 0)
        levels.append(s)
        caps.append(n)
        prev_starts = s
    num_levels = len(levels)

    # --- per-level bucket tables ---
    # One batched cumsum for all levels' bucket ids (a [n] cumsum costs
    # ~12 ms on v5e; 18 of them would dominate the table pass).
    bids_all = jnp.cumsum(
        jnp.stack(levels, axis=0).astype(jnp.int32), axis=1
    ) - 1
    bids, poss, counts = [], [], []
    for li, (starts, cap) in enumerate(zip(levels, caps)):
        bid = bids_all[li]  # [n]
        pos = jnp.full((cap,), num_leaves, jnp.int32)
        pos = pos.at[jnp.where(starts, bid, cap)].set(iota, mode="drop")
        nxt = jnp.concatenate([pos[1:], jnp.full((1,), num_leaves, jnp.int32)])
        # live bucket extent clamps at num_leaves (padded sentinel region)
        end = jnp.minimum(jnp.maximum(nxt, pos), num_leaves)
        count = jnp.maximum(end - jnp.minimum(pos, num_leaves), 0)
        bids.append(bid)
        poss.append(pos)
        counts.append(count)

    # child linkage: children of level-l bucket b are the contiguous
    # level-(l+1) buckets [child_start, child_start + child_count).
    child_starts, child_counts = [], []
    for l in range(num_levels - 1):
        pos, count = poss[l], counts[l]
        nbid = bids[l + 1]
        cs = nbid[jnp.clip(pos, 0, n - 1)]
        last = jnp.clip(pos + count - 1, 0, n - 1)
        cc = jnp.where(count > 0, nbid[last] - cs + 1, 0)
        child_starts.append(cs)
        child_counts.append(cc)
    child_starts.append(jnp.zeros((caps[-1],), jnp.int32))
    child_counts.append(jnp.zeros((caps[-1],), jnp.int32))
    return levels, caps, bids, poss, counts, child_starts, child_counts


def _bucket_aabbs(levels, caps, poss, counts, child_starts, child_counts,
                  lo, hi, n, width=8):
    """Bottom-up per-level bucket AABBs via segmented scans."""
    num_levels = len(levels)
    a_los = [None] * num_levels
    a_his = [None] * num_levels
    tails = poss[-1] + counts[-1] - 1
    valid = counts[-1] > 0
    a_los[-1] = _segment_totals(lo, levels[-1], tails, valid, jnp.minimum,
                                _F32_MAX, width=width)
    a_his[-1] = _segment_totals(hi, levels[-1], tails, valid, jnp.maximum,
                                -_F32_MAX, width=width)
    for l in range(num_levels - 2, -1, -1):
        # scan over level-(l+1) buckets; parent heads mark first children
        heads = levels[l][jnp.clip(poss[l + 1], 0, n - 1)] | (counts[l + 1] <= 0)
        tails = jnp.clip(child_starts[l] + child_counts[l] - 1, 0, caps[l + 1] - 1)
        valid = counts[l] > 0
        a_los[l] = _segment_totals(a_los[l + 1], heads, tails, valid,
                                   jnp.minimum, _F32_MAX, width=width)
        a_his[l] = _segment_totals(a_his[l + 1], heads, tails, valid,
                                   jnp.maximum, -_F32_MAX, width=width)
    return a_los, a_his


def build_bucket_fat(
    triangles: jnp.ndarray, enable_pairs: bool = False
) -> Tuple[FatWideBVH, PackedPairs]:
    """Build the fat wide BVH directly from Morton buckets.

    Returns (FatWideBVH with root at row 0, PackedPairs in sorted-leaf
    order — a leaf entry's pair id is its sorted position).
    """
    num_tris = triangles.shape[0]
    n = num_tris  # static leaf-slot capacity
    (sorted_codes, packed, lo, hi, ccount_leaf,
     num_leaves) = _sorted_leaves(triangles, enable_pairs)
    (levels, caps, bids, poss, counts,
     child_starts, child_counts) = _bucket_tables(sorted_codes, num_leaves, n)
    num_levels = len(levels)

    # --- classification ---
    # terminal (small): 2..8 leaves, listed inline in its own row
    # branching: > 8 leaves, >= 2 children
    # chain: > 8 leaves, 1 child (skipped via the eff recurrence)
    # single: 1 leaf, inlined as a Tri entry of its parent
    # alive: no ancestor is terminal (buckets under terminals are unused)
    is_small, is_real = [], []
    alive = [jnp.ones((caps[0],), bool)]
    for l in range(num_levels):
        count, cc = counts[l], child_counts[l]
        min_small = 1 if l == 0 else 2
        small = (count >= min_small) & (count <= WIDE)
        branch = (count > WIDE) & (cc >= 2)
        is_small.append(small)
        is_real.append(alive[l] & (small | branch))
        if l < num_levels - 1:
            par = bids[l][jnp.clip(poss[l + 1], 0, n - 1)]
            par = jnp.clip(par, 0, caps[l] - 1)
            alive.append(alive[l][par] & ~is_small[l][par])

    # --- global row ids (row 0 reserved for the root copy) ---
    wids = []
    offset = jnp.int32(1)
    for l in range(num_levels):
        r = is_real[l].astype(jnp.int32)
        wids.append(offset + jnp.cumsum(r) - r)
        offset = offset + jnp.sum(r)
    total_rows = offset  # traced

    # --- effective ids: skip single-child chains (bottom-up) ---
    effs = [None] * num_levels
    effs[-1] = wids[-1]
    for l in range(num_levels - 2, -1, -1):
        cs = jnp.clip(child_starts[l], 0, caps[l + 1] - 1)
        effs[l] = jnp.where(is_real[l], wids[l], effs[l + 1][cs])

    # --- bucket AABBs, bottom-up ---
    a_los, a_his = _bucket_aabbs(
        levels, caps, poss, counts, child_starts, child_counts, lo, hi, n
    )

    # --- stage A: scatter compact per-row descriptors ---
    # Every row has >= 2 entries (leaves or child rows), all disjoint, so
    # total rows < num_leaves; +2 covers the reserved root slot.
    w_cap = n + 2
    emeta = jnp.zeros((w_cap, WIDE), jnp.int32)
    nlo = jnp.full((w_cap, 3), _F32_MAX, jnp.float32)
    nhi = jnp.full((w_cap, 3), -_F32_MAX, jnp.float32)

    for l in range(num_levels):
        pos, count = poss[l], counts[l]
        cap = caps[l]
        small = is_small[l]
        real = is_real[l]
        metas = []
        for j in range(WIDE):
            # terminal: leaf j of this bucket
            leaf_p = jnp.clip(pos + j, 0, n - 1)
            t_valid = small & (j < count)
            # branching: child bucket j at level l+1
            if l < num_levels - 1:
                cb = jnp.clip(child_starts[l] + j, 0, caps[l + 1] - 1)
                b_valid = real & ~small & (j < child_counts[l])
                c_single = counts[l + 1][cb] == 1
                c_leaf_p = jnp.clip(poss[l + 1][cb], 0, n - 1)
                c_eff = effs[l + 1][cb]
            else:
                b_valid = jnp.zeros((cap,), bool)
                c_single = jnp.zeros((cap,), bool)
                c_leaf_p = jnp.zeros((cap,), jnp.int32)
                c_eff = jnp.zeros((cap,), jnp.int32)

            is_tri = t_valid | (b_valid & c_single)
            is_box = b_valid & ~c_single
            pair_id = jnp.where(t_valid, leaf_p, c_leaf_p)
            cc = jnp.where(is_tri, ccount_leaf[pair_id], 0)
            child = jnp.where(is_tri, pair_id, c_eff)
            etype = jnp.where(is_tri, CHILD_TRI,
                              jnp.where(is_box, CHILD_BOX, CHILD_NONE))
            metas.append(jnp.where(
                etype == CHILD_NONE,
                0,
                (child << _META_CHILD_SHIFT)
                | (jnp.clip(cc, 0, 7) << _META_COUNT_SHIFT)
                | etype,
            ).astype(jnp.int32))

        dest = jnp.where(real, wids[l], w_cap)
        emeta = emeta.at[dest].set(jnp.stack(metas, axis=1), mode="drop")
        nlo = nlo.at[dest].set(a_los[l], mode="drop")
        nhi = nhi.at[dest].set(a_his[l], mode="drop")

    # root: effective root's descriptor into slot 0 (trace starts at 0)
    eff_root = jnp.clip(effs[0][0], 0, w_cap - 1)
    emeta = emeta.at[0].set(emeta[eff_root])
    nlo = nlo.at[0].set(nlo[eff_root])
    nhi = nhi.at[0].set(nhi[eff_root])

    # --- stage B: assemble [W, 192] fat rows in one global pass ---
    f2i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    num_pairs = packed.rows.shape[0]
    node_words = []
    pair_words = []
    for j in range(WIDE):
        meta = emeta[:, j]
        etype = meta & _META_TYPE_MASK
        eid = meta >> _META_CHILD_SHIFT
        tri = etype == CHILD_TRI
        box = etype == CHILD_BOX
        pid = jnp.clip(eid, 0, num_pairs - 1)
        wid_c = jnp.clip(eid, 0, w_cap - 1)
        e_lo = jnp.where(
            tri[:, None], take_rows(lo, pid),
            jnp.where(box[:, None], take_rows(nlo, wid_c), _F32_MAX),
        )
        e_hi = jnp.where(
            tri[:, None], take_rows(hi, pid),
            jnp.where(box[:, None], take_rows(nhi, wid_c), -_F32_MAX),
        )
        node_words.append(jnp.concatenate(
            [f2i(e_lo), f2i(e_hi), meta[:, None],
             jnp.zeros((w_cap, 1), jnp.int32)], axis=1))  # [W, 8]
        prow = take_rows(packed.rows, pid)
        pair_words.append(jnp.where(tri[:, None], prow, 0))  # [W, 16]

    rows = jnp.concatenate(node_words + pair_words, axis=1)  # [W, 192]
    return FatWideBVH(rows=rows, num_nodes=total_rows), packed


# --- split emitter: homogeneous inner rows + leaf windows into sorted pairs ---


@flax.struct.dataclass
class SplitBVH:
    """Wide BVH split for the Pallas traversal kernel.

    ``inner``: [ICAP, 64] int32 — 8 entries x (min3, max3 bitcast f32, meta,
    pad). Meta is child << 5 | type where type is CHILD_BOX (child = inner
    row id) or CHILD_TRI (child = start position of the terminal bucket in
    the *sorted pair array*; the tracer intersects the leaf_width-pair window
    [child, child+8), which covers the bucket — neighbouring pairs ride
    along and are legal closest-hit candidates since they are real scene
    geometry). Row 0 is the traversal root. Leaf rows therefore need no
    storage at all: the pair array itself is the leaf data.

    ``num_inner`` is traced; the static ICAP bound is
    num_tris // (2 * leaf_width) * 4 + 64 (every branching bucket covers
    > leaf_width leaves and the eff-DAG branches >= 2-way, so real trees
    sit far below it). ``check_split_capacity`` validates a materialized
    ``num_inner`` against the bound — call it wherever the build result is
    fetched to the host.
    """

    inner: jnp.ndarray      # [ICAP, 64] int32
    num_inner: jnp.ndarray  # [] int32
    num_leaves: jnp.ndarray  # [] int32 — live sorted pairs (rest zeroed)
    # Static build parameter: pairs per terminal window. The trace kernel's
    # leafw must equal this (a larger trace window would DMA past the live
    # bucket; smaller would miss geometry).
    leaf_width: int = flax.struct.field(pytree_node=False, default=16)
    # Optional [ICAP, W, 2] int32 — each entry's (start, count) leaf range
    # in the sorted pair order, written by emit_split. Enables
    # refit_split (topology-preserving per-frame AABB refresh); None for
    # builders that don't emit it (v1, split_convert).
    e_ranges: jnp.ndarray = None
    # Optional [] int32 — largest row slot any live entry wanted (written
    # by emit_split). >= inner width means the capped chunk ladder
    # overflowed and geometry was dropped; check_split_capacity raises.
    max_slot: jnp.ndarray = None


# Fine-tier depth of the range-min table: counts < 2^_RANGE_K0 resolve
# from the fine tier alone; larger counts combine two fine edges with a
# coarse (per-512-block) tier. Capping the fine tier at 10 levels halves
# the table build's HBM writes at 1M (21 dense [8, n] passes -> 10 + a
# [Kc, 8, n/512] coarse table) — the table was the single biggest stage
# of the split build (~66 ms of ~420, docs/TPU_NOTES.md round-3 plan).
_RANGE_K0 = 10


def _range_min_table(lo: jnp.ndarray, hi: jnp.ndarray):
    """Two-tier sparse range-min table over sorted leaf boxes.

    Packed [8, n]: rows 0-2 lo.xyz, rows 3-5 -hi.xyz (all min-reduced),
    rows 6-7 +inf pad. Returns (fine [K0, 8, n], coarse [Kc, 8, nb] or
    None, block size B): fine level k covers ranges of 2^k, the coarse
    tier is a standard sparse table over B-leaf block minima."""
    n = lo.shape[0]
    base = jnp.concatenate(
        [lo.T, -hi.T, jnp.full((2, n), _F32_MAX, jnp.float32)], axis=0)
    k_full = max(int(math.floor(math.log2(max(n, 1)))) + 1, 1)
    k0 = min(k_full, _RANGE_K0)
    fine = [base]
    cur = base
    for kk in range(1, k0):
        d = 1 << (kk - 1)
        if d < n:
            shifted = jnp.concatenate(
                [cur[:, d:], jnp.full((8, d), _F32_MAX, jnp.float32)],
                axis=1)
            cur = jnp.minimum(cur, shifted)
        fine.append(cur)
    fine = jnp.stack(fine, axis=0)  # [K0, 8, n]
    if k_full <= _RANGE_K0:
        return fine, None, 0

    b = 1 << (k0 - 1)
    # fine[k0-1][:, i*b] min-reduces [i*b, i*b + b) (clamped at n by the
    # +inf shift padding) — exactly block i.
    blocks = fine[k0 - 1][:, ::b]  # [8, nb]
    nb = blocks.shape[1]
    kc = max(int(math.floor(math.log2(max(nb, 1)))) + 1, 1)
    coarse = [blocks]
    cur = blocks
    for kk in range(1, kc):
        d = 1 << (kk - 1)
        if d < nb:
            shifted = jnp.concatenate(
                [cur[:, d:], jnp.full((8, d), _F32_MAX, jnp.float32)],
                axis=1)
            cur = jnp.minimum(cur, shifted)
        coarse.append(cur)
    return fine, jnp.stack(coarse, axis=0), b


def _range_lookup(tbl, e_start: jnp.ndarray, e_count: jnp.ndarray):
    """Range-min query: AABB of sorted leaves [start, start+count) per
    entry. Returns (e_lo [E, 3], e_hi [E, 3]); count 0 queries are the
    caller's to mask.

    Counts below 2^(K0-1)·2 use the classic two-overlapping-powers
    lookup on the fine tier; larger counts take min(two B-wide fine
    edges, coarse range over the fully-covered blocks) — the edges
    overlap the first/last partial blocks, the coarse pair covers the
    middle, and every piece stays inside [start, start+count)."""
    fine, coarse, b = tbl
    k0, _, n = fine.shape
    ln = jnp.maximum(e_count, 1)
    klev = jnp.int32(31) - jax.lax.clz(ln)
    fine_k = jnp.minimum(klev, k0 - 1)
    pa = jnp.clip(e_start, 0, n - 1)
    pb = jnp.clip(e_start + ln - (jnp.int32(1) << fine_k), 0, n - 1)
    flat_fine = fine.transpose(1, 0, 2).reshape(8, k0 * n)  # [8, K0*n]

    if coarse is not None:
        kc, _, nb = coarse.shape
        # Fine edges of width b at both ends of the range.
        pe = jnp.clip(e_start + ln - b, 0, n - 1)
        # Fully-covered blocks [ba, bb): non-empty whenever ln >= 2b
        # (the only case the coarse path serves).
        ba = (e_start + b - 1) // b
        bb = (e_start + ln) // b
        lb = jnp.maximum(bb - ba, 1)
        kb = jnp.minimum(jnp.int32(31) - jax.lax.clz(lb), kc - 1)
        ca = jnp.clip(ba, 0, nb - 1)
        cb = jnp.clip(bb - (jnp.int32(1) << kb), 0, nb - 1)
        flat_coarse = coarse.transpose(1, 0, 2).reshape(8, kc * nb)
        use_fine = klev <= (k0 - 1)

    chans = []
    for r in range(6):
        va = flat_fine[r, :][fine_k * n + pa]
        vb = flat_fine[r, :][fine_k * n + pb]
        v = jnp.minimum(va, vb)
        if coarse is not None:
            edge = jnp.minimum(
                flat_fine[r, :][(k0 - 1) * n + pa],
                flat_fine[r, :][(k0 - 1) * n + pe])
            cmin = jnp.minimum(
                flat_coarse[r, :][kb * nb + ca],
                flat_coarse[r, :][kb * nb + cb])
            v = jnp.where(use_fine, v, jnp.minimum(edge, cmin))
        chans.append(v)
    e_lo = jnp.stack(chans[0:3], axis=1)       # [E, 3]
    e_hi = -jnp.stack(chans[3:6], axis=1)      # [E, 3]
    return e_lo, e_hi


def _inner_cap(n: int, leaf_width: int) -> int:
    """Static inner-row bound: branching buckets each cover > leaf_width
    leaves, are disjoint per level and branch >= 2-way in the eff-DAG, so
    real counts are far below n / leaf_width; 4x headroom + slack covers
    adversarial shapes (measured: 5.2k inner rows at 1M tris, width 64)."""
    return max(n // (2 * leaf_width) * 4, 256) + 64


def check_inner_capacity(num_inner: int, num_tris: int,
                         leaf_width: int) -> None:
    """Raise if a (host-fetched) inner-row count overflowed the static bound
    — a silently truncated tree would drop geometry. Call wherever a build
    result is synced to the host (bench frame 0, app frame 0)."""
    cap = _inner_cap(num_tris, leaf_width)
    ni = int(num_inner)
    if ni > cap:
        raise RuntimeError(
            f"SplitBVH inner overflow: {ni} rows > static bound {cap}; "
            f"rebuild with a larger bound (bvh/bucket.py:_inner_cap)")


def check_split_capacity(split: SplitBVH, num_tris: int) -> None:
    """Host-fetch form of check_inner_capacity (uses the build's own
    leaf_width carried on the SplitBVH); also validates the capped chunk
    ladder's slot guard when present."""
    check_inner_capacity(int(split.num_inner), num_tris, split.leaf_width)
    if split.max_slot is not None:
        w = split.inner.shape[1] // 8
        ms = int(split.max_slot)
        if ms >= w:
            raise RuntimeError(
                f"SplitBVH row-slot overflow: an entry wanted slot {ms} "
                f">= width {w}; geometry was dropped — deepen the chunk "
                f"ladder (bvh/bucket.py:emit_split num_chunk)")


def build_bucket_split_v1(
    triangles: jnp.ndarray, enable_pairs: bool = False, leaf_width: int = 16,
    inner_width: int = 8,
) -> Tuple[SplitBVH, PackedPairs]:
    """Round-1 bucket-major split emitter (kept for A/B measurement; the
    leaf-major ``build_bucket_split`` below replaces it as the default).

    Unlike ``build_bucket_fat``, every bucket with 1..8 leaves is a terminal
    referenced by position (single-leaf buckets included), and inner rows
    hold no pair geometry. Returned PackedPairs rows are zeroed in the
    padded sentinel region so out-of-bucket window slots never intersect.
    """
    assert inner_width in (8, 16), inner_width
    # The deepest chunk buckets hold up to inner_width leaves and must fit
    # one terminal window — a narrower window would silently drop geometry.
    assert leaf_width >= inner_width, (
        f"leaf_width {leaf_width} < inner_width {inner_width}")
    bits = inner_width.bit_length() - 1
    num_tris = triangles.shape[0]
    n = num_tris
    (sorted_codes, packed, lo, hi, _ccount,
     num_leaves) = _sorted_leaves(triangles, enable_pairs)
    (levels, caps, bids, poss, counts,
     child_starts, child_counts) = _bucket_tables(
         sorted_codes, num_leaves, n, bits=bits)
    num_levels = len(levels)

    # Zero sentinel pairs: with pairing enabled the sorted arrays have a
    # padded tail whose gathered "triangles" are junk duplicates; the leaf
    # windows may overlap that tail, so it must be inert (zero vertices
    # give det == 0 in Moller-Trumbore -> never accepted).
    live = jnp.arange(n, dtype=jnp.int32) < num_leaves
    packed = PackedPairs(rows=jnp.where(live[:, None], packed.rows, 0))

    # --- classification: terminal = 1..8 leaves (singles included) ---
    # One packed-flags gather per level (alive | small<<1 | branch<<2)
    # serves both the alive recurrence here and the parent-validity test in
    # the scatter pass below: gathers are row-serialized on this backend,
    # so fold every per-level gather that shares indices.
    is_small, is_branch = [], []
    alive = [jnp.ones((caps[0],), bool)]
    pars = [None] * num_levels  # parent bucket id per level-l bucket
    pflags = [None] * num_levels  # parent's packed flags, gathered at par
    for l in range(num_levels):
        count, cc = counts[l], child_counts[l]
        small = (count >= 1) & (count <= leaf_width)
        is_small.append(small)
        branch = (count > leaf_width) & (cc >= 2)
        is_branch.append(branch)
        if l < num_levels - 1:
            par = bids[l][jnp.clip(poss[l + 1], 0, n - 1)]
            par = jnp.clip(par, 0, caps[l] - 1)
            flags = (
                alive[l].astype(jnp.int32)
                | (small.astype(jnp.int32) << 1)
                | (branch.astype(jnp.int32) << 2)
            )
            fp = flags[par]
            pars[l + 1] = par
            pflags[l + 1] = fp
            alive.append(((fp & 1) == 1) & ((fp & 2) == 0))

    # --- inner row ids (row 0 reserved for the root copy) ---
    wids = []
    offset = jnp.int32(1)
    for l in range(num_levels):
        r = (alive[l] & is_branch[l]).astype(jnp.int32)
        wids.append(offset + jnp.cumsum(r) - r)
        offset = offset + jnp.sum(r)
    num_inner = offset  # traced

    # --- effective tagged ids, bottom-up (skip single-child chains) ---
    # tag = (id << 1) | is_leaf; leaf id = clamped window start position.
    win_max = jnp.maximum(num_leaves - leaf_width, 0)
    effs = [None] * num_levels
    for l in range(num_levels - 1, -1, -1):
        win = jnp.minimum(jnp.minimum(poss[l], win_max), n - 1)
        leaf_tag = (win << 1) | 1
        inner_tag = wids[l] << 1
        if l == num_levels - 1:
            effs[l] = leaf_tag  # deepest chunk level: every bucket <= 8
        else:
            cs = jnp.clip(child_starts[l], 0, caps[l + 1] - 1)
            effs[l] = jnp.where(
                is_small[l], leaf_tag,
                jnp.where(is_branch[l], inner_tag, effs[l + 1][cs]),
            )

    a_los, a_his = _bucket_aabbs(
        levels, caps, poss, counts, child_starts, child_counts, lo, hi, n,
        width=inner_width,
    )

    # --- scatter inner rows, child-side ---
    # Each level-(l+1) bucket writes its own entry into its parent's row
    # (one [cap] scatter + 4 gathers per level); the parent-side form needs
    # 8 slot gathers x 3 arrays per level, which dominates build time on
    # this backend (row-serialized gathers, docs/TPU_NOTES.md).
    icap = _inner_cap(n, leaf_width)
    f2i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    empty_entry = jnp.concatenate([
        f2i(jnp.full((3,), _F32_MAX, jnp.float32)),
        f2i(jnp.full((3,), -_F32_MAX, jnp.float32)),
        jnp.zeros((2,), jnp.int32),
    ])  # NONE entry: inverted box so the slab test never hits
    inner = jnp.broadcast_to(empty_entry, (icap * inner_width, 8))
    for l in range(1, num_levels):
        capc = caps[l]
        par = pars[l]  # [capc] (computed once in the classification pass)
        fp = pflags[l]
        preal = ((fp & 1) == 1) & ((fp & 4) == 4)
        # one 2-wide row gather instead of two scalar-column gathers
        pw = jnp.stack([child_starts[l - 1], wids[l - 1]], axis=1)[par]
        j = jnp.arange(capc, dtype=jnp.int32) - pw[:, 0]
        valid = preal & (counts[l] > 0) & (j >= 0) & (j < inner_width)
        etag = effs[l]
        is_leaf_c = (etag & 1) == 1
        child = etag >> 1
        etype = jnp.where(is_leaf_c, CHILD_TRI, CHILD_BOX)
        meta = ((child << _META_CHILD_SHIFT) | etype).astype(jnp.int32)
        words = jnp.concatenate(
            [f2i(a_los[l]), f2i(a_his[l]), meta[:, None],
             jnp.zeros((capc, 1), jnp.int32)], axis=1)  # [capc, 8]
        dest = jnp.where(valid, pw[:, 1] * inner_width + j,
                         icap * inner_width)
        inner = inner.at[dest].set(words, mode="drop")

    inner = inner.reshape(icap, inner_width * 8)

    # --- root: copy the effective root's row into slot 0, or synthesize a
    # single-Tri row when the whole scene is one terminal bucket ---
    root_tag = effs[0][0]
    root_is_leaf = (root_tag & 1) == 1
    root_id = root_tag >> 1
    copied = inner[jnp.clip(root_id, 0, icap - 1)]
    smin, smax = a_los[0][0], a_his[0][0]
    leaf_meta = ((root_id << _META_CHILD_SHIFT) | CHILD_TRI).astype(jnp.int32)
    leaf_row = jnp.concatenate([
        f2i(smin), f2i(smax), leaf_meta[None], jnp.zeros((1,), jnp.int32),
        jnp.zeros((inner_width * 8 - 8,), jnp.int32),
    ])
    inner = inner.at[0].set(jnp.where(root_is_leaf, leaf_row, copied))
    return SplitBVH(inner=inner, num_inner=num_inner,
                    num_leaves=num_leaves, leaf_width=leaf_width), packed


# --- leaf-major split emitter (the fast default) ---


def build_bucket_split(
    triangles: jnp.ndarray, enable_pairs: bool = False, leaf_width: int = 16,
    inner_width: int = 8,
) -> Tuple[SplitBVH, PackedPairs]:
    """Leaf-major Morton-bucket split build.

    Emits exactly the same SplitBVH as ``build_bucket_split_v1`` but
    replaces every bucket-major per-level table with dense leaf-major
    arrays, exploiting three structural facts:

    * level-l bucket boundaries are a SUBSET of level-(l+1) boundaries
      (Morton prefixes nest), so "the bucket containing leaf i" is
      well-defined per (level, leaf) and the alive/eff recurrences become
      gather-free dense selects: ``eff[l][i] = small ? leaf : branch ?
      inner : eff[l+1][i]`` — the chain case reads the SAME leaf position
      one level down instead of gathering the single child's id;
    * a chain (single-child) bucket is detected densely as
      ``counts[l][i] == counts[l+1][i]`` (child ⊆ parent and equal size
      ⟺ equal interval ⟺ one child) — no child tables at all;
    * node AABBs are range-min queries over sorted leaf boxes, served by
      one shared sparse table (log n dense shifted-min passes over an
      [8, n] packed layout) instead of per-level segmented scans.

    Per-entry work (AABB lookups, metas, destination slots) runs on a
    COMPACTED entry list (≤ icap·inner_width entries, ~40k at 1M tris)
    instead of 11 full-width per-level passes — the round-1 profile's
    ~1.5 s of classification gathers and segmented AABB scans
    (docs/TPU_NOTES.md split-build accounting) collapse into three
    batched [L, n] scans plus a handful of small gathers.
    """
    front = split_front(triangles, enable_pairs)
    return emit_split(front, leaf_width=leaf_width, inner_width=inner_width)


def split_front(triangles: jnp.ndarray, enable_pairs: bool = False):
    """The build's sort-heavy front end as a standalone stage.

    Jitting the whole build composed pays a multi-minute COLD compile
    and measures EQUAL to the staged form at 1M (545 vs 532-551 ms —
    an earlier 253 ms reading was a DCE artifact, docs/TPU_NOTES.md r4
    measurement trap). bench.py composes (one fewer dispatch boundary,
    compile rides the persistent cache); the staged form remains for
    compile-budget-bound callers (the app) and one-time consumers of
    the front itself (treelet/pair_tid builds)."""
    return _sorted_leaves(triangles, enable_pairs)


def leaf_major_tables(sorted_codes, num_leaves, n: int, width: int):
    """Leaf-major per-level bucket tables shared by emit_split and the
    treelet emitter (bvh/treelet.py).

    Returns (heads [L, n] bool, starts, nxts, counts — all [L, n] int32):
    level l's Morton buckets as head masks plus the extent of the bucket
    containing each leaf. Includes the capped chunk ladder (see
    emit_split's comments)."""
    bits = width.bit_length() - 1
    iota = jnp.arange(n, dtype=jnp.int32)

    # --- level head masks, leaf-major [L, n] ---
    pad_boundary = iota == num_leaves
    heads = [(iota == 0) | pad_boundary]
    # Morton depth capped at ceil(log_w n) + 1: deeper prefix levels are
    # almost empty at any scene size (round-1 profile: 11 of 18 levels ran
    # full-width for nothing) and the chunk ladder below bottoms out any
    # residual run regardless.
    max_ml = max(math.ceil(math.log(max(n, 2), width)) + 1, 1)
    sh = 30
    ml = 0
    while sh > 0 and ml < max_ml:
        sh = max(sh - bits, 0)
        ml += 1
        pref = (sorted_codes >> sh).astype(jnp.uint32)
        prev = jnp.concatenate([pref[:1] ^ jnp.uint32(1), pref[:-1]])
        heads.append((pref != prev) | (iota == 0) | pad_boundary)
    # Chunk ladder capped at 3 levels (periods width^3..width): a run of
    # ANY length still dices to <= width leaves, but a deepest-Morton run
    # longer than width^4 would give its first chunk level more than
    # `width` children — entries past slot width-1 would be dropped. That
    # overflow is impossible for real meshes (it needs > width^4 leaves
    # sharing a Morton cell) but is guarded anyway: max_slot rides out on
    # the SplitBVH and check_split_capacity raises on the host fetch.
    # Saves ceil(log_w n) - 3 full-width [n] levels (4 of 16 at 1M).
    num_chunk = min(max(math.ceil(math.log(max(n, 2), width)), 1), 3)
    seg_start_deep = jax.lax.cummax(jnp.where(heads[-1], iota, -1))
    idx_in_seg = iota - seg_start_deep
    prev_heads = heads[-1]
    for kk in range(num_chunk - 1, -1, -1):
        s = prev_heads | (idx_in_seg % (width ** (kk + 1)) == 0)
        heads.append(s)
        prev_heads = s
    L = len(heads)
    heads = jnp.stack(heads, axis=0)  # [L, n] bool

    # --- two batched scans give every per-(level, leaf) quantity ---
    iota_l = jnp.broadcast_to(iota[None, :], (L, n))
    starts = jax.lax.cummax(jnp.where(heads, iota_l, -1), axis=1)
    nxt_src = jnp.concatenate(
        [jnp.where(heads[:, 1:], iota_l[:, 1:], n),
         jnp.full((L, 1), n, jnp.int32)], axis=1)
    nxts = jax.lax.cummin(nxt_src, axis=1, reverse=True)
    counts = nxts - starts  # bucket extent containing leaf i at level l
    return heads, starts, nxts, counts


def classify_split(heads, starts, counts, live, num_leaves, n: int,
                   leaf_width: int):
    """Dense [L, n] classification + inner row ids + effective tags —
    the middle of emit_split, shared with the app's --profile-build
    stage table (so the printed stage times the production code).

    Returns (alive, branch, wid_dense, num_inner, effs)."""
    L = heads.shape[0]
    # --- dense classification (no gathers) ---
    small = (counts >= 1) & (counts <= leaf_width)
    chain = jnp.concatenate(
        [counts[:-1] == counts[1:], jnp.ones((1, n), bool)], axis=0)
    branch = (counts > leaf_width) & ~chain
    alive = jnp.cumprod(
        jnp.concatenate([jnp.ones((1, n), bool), ~small[:-1]], axis=0)
        .astype(jnp.int32), axis=0).astype(bool)
    real = alive & branch

    # --- inner row ids (row 0 reserved for the root copy) ---
    rmask = (heads & real & live[None, :]).astype(jnp.int32)
    rows_per_level = jnp.sum(rmask, axis=1)
    offsets = jnp.int32(1) + jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(rows_per_level)[:-1]])
    wid_dense = offsets[:, None] + jnp.cumsum(rmask, axis=1) - 1
    num_inner = offsets[-1] + rows_per_level[-1]

    # --- effective tags, bottom-up dense (chains skipped for free) ---
    win_max = jnp.maximum(num_leaves - leaf_width, 0)
    win = jnp.minimum(jnp.minimum(starts, win_max), n - 1)
    leaf_tag = (win << 1) | 1
    inner_tag = wid_dense << 1
    eff = leaf_tag[L - 1]
    effs = [None] * L
    effs[L - 1] = eff
    for l in range(L - 2, -1, -1):
        eff = jnp.where(small[l], leaf_tag[l],
                        jnp.where(branch[l], inner_tag[l], eff))
        effs[l] = eff
    effs = jnp.stack(effs, axis=0)  # [L, n]
    return alive, branch, wid_dense, num_inner, effs


def emit_split(
    front, leaf_width: int = 16, inner_width: int = 8,
) -> Tuple[SplitBVH, PackedPairs]:
    """Emit the SplitBVH from a split_front result (see build_bucket_split)."""
    assert inner_width in (8, 16), inner_width
    assert leaf_width >= inner_width, (
        f"leaf_width {leaf_width} < inner_width {inner_width}")
    width = inner_width
    (sorted_codes, packed, lo, hi, _ccount, num_leaves) = front
    n = sorted_codes.shape[0]

    # Zero sentinel pairs (same reasoning as v1: windows may overlap the
    # padded tail; zero vertices never intersect).
    iota = jnp.arange(n, dtype=jnp.int32)
    live = iota < num_leaves
    packed = PackedPairs(rows=jnp.where(live[:, None], packed.rows, 0))

    heads, starts, nxts, counts = leaf_major_tables(
        sorted_codes, num_leaves, n, width)
    L = heads.shape[0]

    alive, branch, wid_dense, num_inner, effs = classify_split(
        heads, starts, counts, live, num_leaves, n, leaf_width)

    # --- compacted entry list: (level >= 1, head, parent real) ---
    emask = heads[1:] & (alive[:-1] & branch[:-1]) & live[None, :]
    icap = _inner_cap(n, leaf_width)
    ecap = min(icap * inner_width, (L - 1) * n)
    flat = emask.reshape(-1)
    (fidx,) = jnp.nonzero(flat, size=ecap, fill_value=flat.shape[0])
    valid_e = fidx < flat.shape[0]
    fidx = jnp.minimum(fidx, flat.shape[0] - 1)
    gidx = fidx + n  # index into the [L, n] arrays (emask dropped level 0)

    e_start = starts.reshape(-1)[gidx]
    e_count = counts.reshape(-1)[gidx]
    e_eff = effs.reshape(-1)[gidx]
    wid_parent = wid_dense.reshape(-1)[gidx - n]
    # Slot within the parent row: entries of one parent are CONSECUTIVE in
    # the compacted list (children are contiguous level-l heads inside the
    # parent's extent; levels don't interleave), so the slot is the rank
    # within the run of equal parent row ids — a tiny [ecap] scan instead
    # of a third full [L, n] cumsum.
    eidx = jnp.arange(fidx.shape[0], dtype=jnp.int32)
    prev_wp = jnp.concatenate(
        [jnp.full((1,), -2, jnp.int32), wid_parent[:-1]])
    run_start = jax.lax.cummax(
        jnp.where(wid_parent != prev_wp, eidx, -1))
    e_j = eidx - run_start

    # --- node AABBs: shared sparse range-min table over leaf boxes ---
    e_lo, e_hi = _range_lookup(_range_min_table(lo, hi), e_start, e_count)

    # --- entry words + one scatter ---
    f2i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    is_leaf_e = (e_eff & 1) == 1
    child = e_eff >> 1
    etype = jnp.where(is_leaf_e, CHILD_TRI, CHILD_BOX)
    meta = ((child << _META_CHILD_SHIFT) | etype).astype(jnp.int32)
    ecnt = fidx.shape[0]
    words = jnp.concatenate(
        [f2i(e_lo), f2i(e_hi), meta[:, None],
         jnp.zeros((ecnt, 1), jnp.int32)], axis=1)  # [E, 8]

    empty_entry = jnp.concatenate([
        f2i(jnp.full((3,), _F32_MAX, jnp.float32)),
        f2i(jnp.full((3,), -_F32_MAX, jnp.float32)),
        jnp.zeros((2,), jnp.int32),
    ])  # NONE entry: inverted box so the slab test never hits
    inner = jnp.broadcast_to(empty_entry, (icap * inner_width, 8))
    ok = valid_e & (e_j >= 0) & (e_j < inner_width)
    # Overflow guard for the capped chunk ladder (see num_chunk above):
    # the largest slot index any live entry wanted. Checked on the host
    # at frame 0 (check_split_capacity) — > inner_width-1 means dropped
    # geometry, rebuild with a deeper ladder.
    max_slot = jnp.max(jnp.where(valid_e, e_j, 0))
    # Debug-mode invariants (reference analogue: the SAH builder's
    # CheckTask/bin-range family, src/SharedTaskBuilder.cu:169-235): every
    # live entry must land in a real slot of a real row — a violation
    # means dropped geometry.
    invariants.check(
        jnp.all(jnp.where(valid_e, (e_j >= 0) & (e_j < inner_width), True)),
        "bucket entry slot out of row range")
    invariants.check(
        jnp.all(jnp.where(valid_e,
                          (wid_parent >= 0) & (wid_parent < num_inner),
                          True)),
        "bucket entry parent row out of range")
    invariants.check(num_inner <= icap,
                     "bucket inner rows overflow the static bound")
    dest = jnp.where(ok, wid_parent * inner_width + e_j,
                     icap * inner_width)  # out of range -> dropped
    inner = inner.at[dest].set(words, mode="drop")
    inner = inner.reshape(icap, inner_width * 8)
    # Per-entry leaf ranges (count 0 = empty slot) for refit_split.
    e_ranges = jnp.zeros((icap * inner_width, 2), jnp.int32).at[dest].set(
        jnp.stack([e_start, e_count], axis=1), mode="drop")
    e_ranges = e_ranges.reshape(icap, inner_width, 2)

    # --- root: copy the effective root's row into slot 0, or synthesize
    # a single-Tri row when the whole scene is one terminal bucket ---
    root_tag = effs[0, 0]
    root_is_leaf = (root_tag & 1) == 1
    root_id = root_tag >> 1
    copied = inner[jnp.clip(root_id, 0, icap - 1)]
    smin = jnp.stack([jnp.min(lo[:, c], where=live, initial=_F32_MAX)
                      for c in range(3)])
    smax = jnp.stack([jnp.max(hi[:, c], where=live, initial=-_F32_MAX)
                      for c in range(3)])
    leaf_meta = ((root_id << _META_CHILD_SHIFT) | CHILD_TRI).astype(jnp.int32)
    leaf_row = jnp.concatenate([
        f2i(smin), f2i(smax), leaf_meta[None], jnp.zeros((1,), jnp.int32),
        jnp.zeros((inner_width * 8 - 8,), jnp.int32),
    ])
    inner = inner.at[0].set(jnp.where(root_is_leaf, leaf_row, copied))
    leaf_rr = jnp.zeros((inner_width, 2), jnp.int32).at[0].set(
        jnp.stack([jnp.int32(0), num_leaves]))
    e_ranges = e_ranges.at[0].set(jnp.where(
        root_is_leaf, leaf_rr, e_ranges[jnp.clip(root_id, 0, icap - 1)]))
    return SplitBVH(inner=inner, num_inner=num_inner,
                    num_leaves=num_leaves, leaf_width=leaf_width,
                    e_ranges=e_ranges, max_slot=max_slot), packed


def emit_split_views(
    front, leaf_width: int = 16, inner_width: int = 8,
):
    """Fused emit: entry words scatter STRAIGHT into the trace-kernel
    view layouts (round-5 rebuild trim, docs/TPU_NOTES.md round-3 plan
    item 1 — fold prep_split_views' pad materializations into the
    producing scatter).

    vs ``prep_split_views(*emit_split(front))``: the single entry
    scatter targets a 16-slot padded row buffer, so ``inner_i``
    ([ICAP, 128], the DMA-alignment-padded row view) is a pure reshape
    instead of a separate pad copy, and the [ICAP, width*8] ``inner``
    intermediate is never materialized on the rebuild path (a
    views-only jit DCEs the SplitBVH outputs entirely).

    Returns ((inner_i, inner_v, pairs_f), packed, split) — bit-identical
    to the unfused pipeline (tests/test_bucket.py equivalence test).
    """
    assert inner_width in (8, 16), inner_width
    assert leaf_width >= inner_width
    width = inner_width
    (sorted_codes, packed, lo, hi, _ccount, num_leaves) = front
    n = sorted_codes.shape[0]

    iota = jnp.arange(n, dtype=jnp.int32)
    live = iota < num_leaves
    rows_live = jnp.where(live[:, None], packed.rows, 0)
    packed = PackedPairs(rows=rows_live)

    heads, starts, nxts, counts = leaf_major_tables(
        sorted_codes, num_leaves, n, width)
    L = heads.shape[0]
    alive, branch, wid_dense, num_inner, effs = classify_split(
        heads, starts, counts, live, num_leaves, n, leaf_width)

    emask = heads[1:] & (alive[:-1] & branch[:-1]) & live[None, :]
    icap = _inner_cap(n, leaf_width)
    ecap = min(icap * inner_width, (L - 1) * n)
    flat = emask.reshape(-1)
    (fidx,) = jnp.nonzero(flat, size=ecap, fill_value=flat.shape[0])
    valid_e = fidx < flat.shape[0]
    fidx = jnp.minimum(fidx, flat.shape[0] - 1)
    gidx = fidx + n

    e_start = starts.reshape(-1)[gidx]
    e_count = counts.reshape(-1)[gidx]
    e_eff = effs.reshape(-1)[gidx]
    wid_parent = wid_dense.reshape(-1)[gidx - n]
    eidx = jnp.arange(fidx.shape[0], dtype=jnp.int32)
    prev_wp = jnp.concatenate(
        [jnp.full((1,), -2, jnp.int32), wid_parent[:-1]])
    run_start = jax.lax.cummax(
        jnp.where(wid_parent != prev_wp, eidx, -1))
    e_j = eidx - run_start

    e_lo, e_hi = _range_lookup(_range_min_table(lo, hi), e_start, e_count)

    f2i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    is_leaf_e = (e_eff & 1) == 1
    child = e_eff >> 1
    etype = jnp.where(is_leaf_e, CHILD_TRI, CHILD_BOX)
    meta = ((child << _META_CHILD_SHIFT) | etype).astype(jnp.int32)
    ecnt = fidx.shape[0]
    words = jnp.concatenate(
        [f2i(e_lo), f2i(e_hi), meta[:, None],
         jnp.zeros((ecnt, 1), jnp.int32)], axis=1)  # [E, 8]

    empty_entry = jnp.concatenate([
        f2i(jnp.full((3,), _F32_MAX, jnp.float32)),
        f2i(jnp.full((3,), -_F32_MAX, jnp.float32)),
        jnp.zeros((2,), jnp.int32),
    ])
    # 16-slot padded row buffer: real slots get the empty (inverted-box)
    # pattern, pad slots (width..15) stay zero — exactly the layout
    # prep_split_views produced via jnp.pad on the 64-word rows.
    slot16 = jnp.arange(icap * 16, dtype=jnp.int32) % 16
    flat16 = jnp.where((slot16 < width)[:, None],
                       jnp.broadcast_to(empty_entry, (icap * 16, 8)),
                       0)
    ok = valid_e & (e_j >= 0) & (e_j < inner_width)
    max_slot = jnp.max(jnp.where(valid_e, e_j, 0))
    invariants.check(
        jnp.all(jnp.where(valid_e, (e_j >= 0) & (e_j < inner_width), True)),
        "bucket entry slot out of row range")
    invariants.check(
        jnp.all(jnp.where(valid_e,
                          (wid_parent >= 0) & (wid_parent < num_inner),
                          True)),
        "bucket entry parent row out of range")
    invariants.check(num_inner <= icap,
                     "bucket inner rows overflow the static bound")
    dest = jnp.where(ok, wid_parent * 16 + e_j, icap * 16)
    flat16 = flat16.at[dest].set(words, mode="drop")
    inner_pad = flat16.reshape(icap, 128)
    e_ranges = jnp.zeros((icap * inner_width, 2), jnp.int32).at[
        jnp.where(ok, wid_parent * inner_width + e_j,
                  icap * inner_width)].set(
        jnp.stack([e_start, e_count], axis=1), mode="drop")
    e_ranges = e_ranges.reshape(icap, inner_width, 2)

    # --- root fixup (same semantics as emit_split) ---
    root_tag = effs[0, 0]
    root_is_leaf = (root_tag & 1) == 1
    root_id = root_tag >> 1
    copied = inner_pad[jnp.clip(root_id, 0, icap - 1)]
    smin = jnp.stack([jnp.min(lo[:, c], where=live, initial=_F32_MAX)
                      for c in range(3)])
    smax = jnp.stack([jnp.max(hi[:, c], where=live, initial=-_F32_MAX)
                      for c in range(3)])
    leaf_meta = ((root_id << _META_CHILD_SHIFT) | CHILD_TRI).astype(jnp.int32)
    leaf_row = jnp.concatenate([
        f2i(smin), f2i(smax), leaf_meta[None], jnp.zeros((1,), jnp.int32),
        jnp.zeros((128 - 8,), jnp.int32),
    ])
    inner_pad = inner_pad.at[0].set(
        jnp.where(root_is_leaf, leaf_row, copied))
    leaf_rr = jnp.zeros((inner_width, 2), jnp.int32).at[0].set(
        jnp.stack([jnp.int32(0), num_leaves]))
    e_ranges = e_ranges.at[0].set(jnp.where(
        root_is_leaf, leaf_rr, e_ranges[jnp.clip(root_id, 0, icap - 1)]))

    # --- views ---
    inner_i = inner_pad
    inner_v = jax.lax.bitcast_convert_type(
        jnp.pad(inner_pad.reshape(icap, 16, 8)[:, :width, :],
                ((0, 0), (0, 0), (0, 120))),
        jnp.float32)
    prows = jnp.pad(rows_live,
                    ((0, max(128 - n, 0)), (0, 128 - rows_live.shape[1])))
    pairs_f = jax.lax.bitcast_convert_type(prows, jnp.float32)

    split = SplitBVH(inner=inner_pad[:, : width * 8], num_inner=num_inner,
                     num_leaves=num_leaves, leaf_width=leaf_width,
                     e_ranges=e_ranges, max_slot=max_slot)
    return (inner_i, inner_v, pairs_f), packed, split


def refit_split(split: SplitBVH, packed: PackedPairs) -> SplitBVH:
    """Topology-preserving refit: refresh every inner entry's AABB from
    the CURRENT pair rows, keeping the tree (metas, windows, row ids).

    The TPU-native answer to per-frame rebuild for animated scenes with
    fixed topology (the reference rebuilds per frame because its GPU
    build is ms-cheap, src/main.cu:225-247; on this backend a full
    rebuild is ~420 ms at 1M while this refit is ~2 dense passes + the
    range-min table). The caller animates ``packed.rows`` in sorted-pair
    order (vertex words 0-11); degenerate sentinel rows stay degenerate
    under any affine deformation, so window overlap into the padded tail
    remains safe. Requires ``split.e_ranges`` (emitted by emit_split).
    """
    assert split.e_ranges is not None, (
        "refit_split needs e_ranges (build with emit_split / "
        "build_bucket_split)")
    rows = packed.rows
    icap, row_words = split.inner.shape
    w = row_words // 8
    v = jax.lax.bitcast_convert_type(rows[:, :12], jnp.float32).reshape(
        -1, 4, 3)
    lo = jnp.min(v, axis=1)
    hi = jnp.max(v, axis=1)
    e_start = split.e_ranges[..., 0].reshape(-1)
    e_count = split.e_ranges[..., 1].reshape(-1)
    e_lo, e_hi = _range_lookup(_range_min_table(lo, hi), e_start, e_count)
    f2i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    old = split.inner.reshape(icap * w, 8)
    words = jnp.concatenate(
        [f2i(e_lo), f2i(e_hi), old[:, 6:8]], axis=1)
    # Empty slots (count 0) keep their NONE/inverted-box words.
    words = jnp.where((e_count > 0)[:, None], words, old)
    return split.replace(inner=words.reshape(icap, row_words))
