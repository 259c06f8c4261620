"""Binned-SAH top-down builder over a 4x4x4 scene-grid decomposition
(reference: src/SharedTaskBuilder.cu, src/Multiblock.cu, driver
src/BuildWrapper.cu:140-251).

TPU-native re-design. The reference runs a persistent kernel per grid block
with a cooperative work queue — up to 64 tasks per iteration, atomic node
allocation, shared-memory 8-bin histograms via ordered-int atomics, and a
serial small-task phase. None of that machinery survives contact with XLA;
instead the builder is **level-synchronous**: every frontier task across all
64 grid cells advances together each level, and every per-task reduction is
a dense op over the full primitive axis:

* binning: each primitive computes its bin id, then one stable
  sort-by-(task, bin) replaces the atomic double-buffered partition
  (src/SharedTaskBuilder.cu:352-380) — after the sort the SAH split is just
  a range split, and leaf order is deterministic (the reference's is not,
  src/SharedTaskBuilder.cu:769-771).
* per-(task, plane) SAH sweep data comes from segmented min/max prefix and
  suffix scans of leaf AABBs plus a cumulative one-hot bin histogram,
  evaluated at the 7 bin boundaries — equivalent to the reference's
  left-to-right/right-to-left bin passes (src/SharedTaskBuilder.cu:297-350).
* node allocation: deterministic prefix sums over the frontier replace
  atomicAdd on a shared write index (src/SharedTaskBuilder.cu:548).

Semantics preserved: axis selection (:197-204), k1 binning constant with the
2^-23 epsilon (:209-212), SAH score ``sa(l)*nl + sa(r)*nr`` with the
right-to-left strict-improvement tie rule (:313-327), LEAF_THRESHOLD=2
leaves with singletons written into the parent slot (:396-404), midpoint
fallback for degenerate centroid bounds (:465-510), the 64-cell grid
decomposition binned on the *centroid* AABB (src/Multiblock.cu:431-470) and
the top-of-tree stitch that grafts each cell root's children
(:424-444 / PerInstance :788-806).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from tpu_raytracing.bvh import invariants
from tpu_raytracing.bvh.pairing import can_form_pair, create_pairs, should_form_pair
from tpu_raytracing.bvh.types import BVH, CHILD_BOX, CHILD_NONE, CHILD_TRI, TrianglePairs
from tpu_raytracing.ops.intersect import aabb_surface_area, triangle_aabb
from tpu_raytracing.ops.rangemin import build_range_min, range_min_query

NUM_BINS = 8
LEAF_THRESHOLD = 2
BLOCK_GRID_DIM = 4
NUM_BLOCKS = BLOCK_GRID_DIM**3
BIN_EPS = 1.1920929e-7  # 2^-23 (src/SharedTaskBuilder.cu:209)
# Python float, NOT a jnp scalar: module-level device arrays become
# jit-captured device constants, which this backend re-stages per call.
_F32_MAX = float(jnp.finfo(jnp.float32).max)


@flax.struct.dataclass
class LeafInput:
    """Build leaves (the output of the reference Setup kernels,
    src/Multiblock.cu:136-198): one AABB + primitive reference per leaf."""

    aabb_min: jnp.ndarray  # [L, 3]
    aabb_max: jnp.ndarray  # [L, 3]
    child: jnp.ndarray  # [L] — value written to a leaf node's child field
    count: jnp.ndarray  # [L] — value written to a leaf node's count field
    type: jnp.ndarray  # [L] — ChildType written to the leaf node (Tri, or the
    # grafted node's own type in top-of-tree / hybrid stitches)
    num_leaves: jnp.ndarray  # [] int32 — live prefix (<= L)


def setup_leaves(triangles: jnp.ndarray, enable_pairs: bool) -> Tuple[LeafInput, TrianglePairs]:
    """Per-primitive preprocessing (reference Setup, src/Multiblock.cu:136-198).

    Without pairing every triangle is its own leaf; with pairing adjacent
    triangles (2t, 2t+1) merge when they share an edge and pass the SAH
    heuristic. Leaf k references pair k. Compaction is a prefix sum, so leaf
    order is deterministic (the reference's atomicAdd order is not).
    """
    num = triangles.shape[0]
    if not enable_pairs:
        lo, hi = triangle_aabb(triangles[:, 0], triangles[:, 1], triangles[:, 2])
        idx = jnp.arange(num, dtype=jnp.int32)
        pairs = create_pairs(triangles, triangles, idx, idx, jnp.zeros((num,), bool))
        return (
            LeafInput(
                aabb_min=lo,
                aabb_max=hi,
                child=idx,
                count=jnp.ones((num,), jnp.int32),
                type=jnp.full((num,), CHILD_TRI, jnp.int32),
                num_leaves=jnp.int32(num),
            ),
            pairs,
        )

    num_even = (num + 1) // 2
    a = triangles[0::2]
    has_b = jnp.arange(num_even) * 2 + 1 < num
    b_idx = jnp.minimum(jnp.arange(num_even) * 2 + 1, num - 1)
    b = triangles[b_idx]
    a_min, a_max = triangle_aabb(a[:, 0], a[:, 1], a[:, 2])
    b_min, b_max = triangle_aabb(b[:, 0], b[:, 1], b[:, 2])
    p_min = jnp.minimum(a_min, b_min)
    p_max = jnp.maximum(a_max, b_max)
    can, _, _ = can_form_pair(a, b)
    merge = has_b & can & should_form_pair(a_min, a_max, b_min, b_max, p_min, p_max)

    counts = 1 + (has_b & ~merge).astype(jnp.int32)
    starts = jnp.cumsum(counts) - counts
    num_leaves = (starts[-1] + counts[-1]).astype(jnp.int32)

    tid = jnp.arange(num_even, dtype=jnp.int32) * 2
    oob = jnp.int32(num)
    first_slot = starts
    second_slot = jnp.where(has_b & ~merge, starts + 1, oob)

    lo = jnp.zeros((num, 3), jnp.float32)
    hi = jnp.zeros((num, 3), jnp.float32)
    lo = lo.at[first_slot].set(jnp.where(merge[:, None], p_min, a_min))
    hi = hi.at[first_slot].set(jnp.where(merge[:, None], p_max, a_max))
    lo = lo.at[second_slot].set(b_min, mode="drop")
    hi = hi.at[second_slot].set(b_max, mode="drop")

    leaf_count = jnp.ones((num,), jnp.int32)
    leaf_count = leaf_count.at[first_slot].set(jnp.where(merge, 2, 1))

    # Pair k corresponds to leaf k: scatter the source triangle ids.
    src_a = jnp.zeros((num,), jnp.int32).at[first_slot].set(tid)
    src_a = src_a.at[second_slot].set(tid + 1, mode="drop")
    is_pair = jnp.zeros((num,), bool).at[first_slot].set(merge)
    src_b = jnp.where(is_pair, jnp.minimum(src_a + 1, num - 1), src_a)
    pairs = create_pairs(triangles[src_a], triangles[src_b], src_a, src_b, is_pair)

    return (
        LeafInput(
            aabb_min=lo,
            aabb_max=hi,
            child=jnp.arange(num, dtype=jnp.int32),
            count=leaf_count,
            type=jnp.full((num,), CHILD_TRI, jnp.int32),
            num_leaves=num_leaves,
        ),
        pairs,
    )


def _select_axis(cmin, cmax):
    """Longest centroid axis (src/SharedTaskBuilder.cu:197-204)."""
    length = cmax - cmin
    lx, ly, lz = length[..., 0], length[..., 1], length[..., 2]
    return (
        2 * ((lz > lx) & (lz > ly)).astype(jnp.int32)
        + ((ly > lx) & (ly >= lz)).astype(jnp.int32)
    )


def _sa(pmin, pmax):
    return jnp.where(
        jnp.all(pmax >= pmin, axis=-1), aabb_surface_area(pmin, pmax), 0.0
    )


@flax.struct.dataclass
class Arena:
    """Functional node arena (the reference's nodes_out buffer plus the
    shared atomic write index, src/SharedTaskBuilder.cu:18, 548).

    seg_start/seg_count/depth are optional side tables filled by
    frontier_build when present (make_arena(track_segments=True)): every
    task's leaf range [tstart, tend) is CONTIGUOUS in the final leaf
    permutation and its absolute positions never change once written (the
    per-level stable sort only reorders strictly inside still-active
    ranges), so recording (tstart, count, level) at node-write time gives
    each slot its final subtree window and depth for free — replacing
    bottom-up fixed-point loops over loop-carried buffers, the measured
    ~1000x gather pathology (docs/TPU_NOTES.md) that also exploded the
    1M-tri compile in bvh/split_convert.py."""

    node_min: jnp.ndarray
    node_max: jnp.ndarray
    child: jnp.ndarray
    count: jnp.ndarray
    type: jnp.ndarray
    parent: jnp.ndarray  # [N] int32 — parent slot (roots/self elsewhere)
    wptr: jnp.ndarray  # [] int32 — next free slot
    seg_start: Optional[jnp.ndarray] = None  # [N] final leaf-range start
    seg_count: Optional[jnp.ndarray] = None  # [N] leaf-range length
    depth: Optional[jnp.ndarray] = None  # [N] node depth (root = 0)


def make_arena(num_slots: int, track_segments: bool = False) -> Arena:
    seg = (jnp.zeros((num_slots,), jnp.int32) if track_segments else None)
    return Arena(
        node_min=jnp.full((num_slots, 3), _F32_MAX),
        node_max=jnp.full((num_slots, 3), -_F32_MAX),
        child=jnp.zeros((num_slots,), jnp.int32),
        count=jnp.zeros((num_slots,), jnp.int32),
        type=jnp.full((num_slots,), CHILD_NONE, jnp.int32),
        parent=jnp.arange(num_slots, dtype=jnp.int32),
        wptr=jnp.int32(0),
        seg_start=seg,
        seg_count=seg,
        depth=seg,
    )


def _write_nodes(arena: Arena, slots, nmin, nmax, child, count, ntype, mask,
                 parent=None) -> Arena:
    oob = jnp.int32(arena.child.shape[0])
    idx = jnp.where(mask, slots, oob)
    out = arena.replace(
        node_min=arena.node_min.at[idx].set(nmin, mode="drop"),
        node_max=arena.node_max.at[idx].set(nmax, mode="drop"),
        child=arena.child.at[idx].set(child, mode="drop"),
        count=arena.count.at[idx].set(count, mode="drop"),
        type=arena.type.at[idx].set(ntype, mode="drop"),
    )
    if parent is not None:
        out = out.replace(parent=out.parent.at[idx].set(parent, mode="drop"))
    return out


def _write_segments(arena: Arena, slots, mask, start, count, depth) -> Arena:
    """Record a node's final leaf window + depth (no-op unless the arena
    tracks segments — see Arena docstring for why write-time is correct)."""
    if arena.seg_start is None:
        return arena
    oob = jnp.int32(arena.child.shape[0])
    idx = jnp.where(mask, slots, oob)
    return arena.replace(
        seg_start=arena.seg_start.at[idx].set(start, mode="drop"),
        seg_count=arena.seg_count.at[idx].set(count, mode="drop"),
        depth=arena.depth.at[idx].set(depth, mode="drop"),
    )


def _level_step(leaves: LeafInput, s: dict, max_levels: int) -> dict:
    """One frontier level (the shared body of ``frontier_build``).

    ``leaves`` is an explicit argument (not a closure) so the
    host-stepped driver can jit this with the big per-leaf arrays riding
    as jit ARGUMENTS — closure constants overflow the remote-compile
    payload at 1M-tri scale and re-stage per call (docs/TPU_NOTES.md).
    """
    cap = leaves.aabb_min.shape[0]
    tcap = int(s["tstart"].shape[0])
    pos = jnp.arange(cap, dtype=jnp.int32)
    tslot = jnp.arange(tcap, dtype=jnp.int32)

    ids = s["ids"]
    tstart, tend, tparent = s["tstart"], s["tend"], s["tparent"]
    tcmin, tcmax, tpmin, tpmax = s["tcmin"], s["tcmax"], s["tpmin"], s["tpmax"]
    ntasks = s["ntasks"]
    arena = s["arena"]

    active = tslot < ntasks
    counts = jnp.where(active, tend - tstart, 0)
    is_leaf1 = active & (counts == 1)
    is_leaf2 = active & (counts == 2)
    is_split = active & (counts > LEAF_THRESHOLD)
    degen = is_split & (
        (_sa(tcmin, tcmax) <= 0.0) | (s["level"] >= max_levels)
    )

    # Debug-mode invariants (the reference's CheckTask,
    # src/SharedTaskBuilder.cu:169-195): task ranges well-formed and
    # the centroid AABB contained in the primitive AABB.
    invariants.check(
        jnp.all(jnp.where(active,
                          (tstart >= 0) & (tend >= tstart) & (tend <= cap),
                          True)),
        "SAH task range invalid (CheckTask)")
    invariants.check(
        jnp.all(jnp.where(active[:, None],
                          (tcmin >= tpmin) & (tcmax <= tpmax)
                          & (tcmin <= tcmax), True)),
        "SAH task centroid bounds invalid (CheckTask)")

    # ---- leaf retirement (src/SharedTaskBuilder.cu:396-463) ----
    lid1 = ids[jnp.clip(tstart, 0, cap - 1)]
    arena = _write_nodes(
        arena,
        tparent,
        leaves.aabb_min[lid1],
        leaves.aabb_max[lid1],
        leaves.child[lid1],
        leaves.count[lid1],
        leaves.type[lid1],
        is_leaf1,
    )
    oob_slot = jnp.int32(arena.child.shape[0])

    def graft_parents(arena, lid, slot, mask):
        """Box-type grafted leaves adopt their target group's slots so
        parent-pointer depth stays continuous across the graft (the wide
        collapse's anchor rule is depth arithmetic)."""
        is_graft = mask & (leaves.type[lid] == CHILD_BOX)
        for j in range(2):
            tgt = jnp.where(
                is_graft & (j < leaves.count[lid]),
                leaves.child[lid] + j,
                oob_slot,
            )
            arena = arena.replace(
                parent=arena.parent.at[tgt].set(slot, mode="drop")
            )
        return arena

    arena = graft_parents(arena, lid1, tparent, is_leaf1)
    arena = _write_segments(arena, tparent, is_leaf1, tstart, 1,
                            s["level"])
    n_leaf2 = jnp.sum(is_leaf2.astype(jnp.int32))
    rank2 = jnp.cumsum(is_leaf2.astype(jnp.int32)) - is_leaf2.astype(jnp.int32)
    base2 = arena.wptr + 2 * rank2
    for j in range(2):
        lidj = ids[jnp.clip(tstart + j, 0, cap - 1)]
        arena = _write_nodes(
            arena,
            base2 + j,
            leaves.aabb_min[lidj],
            leaves.aabb_max[lidj],
            leaves.child[lidj],
            leaves.count[lidj],
            leaves.type[lidj],
            is_leaf2,
            parent=tparent,
        )
        arena = graft_parents(arena, lidj, base2 + j, is_leaf2)
        arena = _write_segments(arena, base2 + j, is_leaf2, tstart + j, 1,
                                s["level"] + 1)
    arena = _write_nodes(
        arena, tparent, tpmin, tpmax, base2,
        jnp.full((tcap,), 2, jnp.int32),
        jnp.full((tcap,), CHILD_BOX, jnp.int32), is_leaf2,
    )
    arena = _write_segments(arena, tparent, is_leaf2, tstart, 2,
                            s["level"])
    arena = arena.replace(wptr=arena.wptr + 2 * n_leaf2)

    # ---- interior-node allocation (src/SharedTaskBuilder.cu:544-560) ----
    n_split = jnp.sum(is_split.astype(jnp.int32))
    rank_s = jnp.cumsum(is_split.astype(jnp.int32)) - is_split.astype(jnp.int32)
    child_idx = arena.wptr + 2 * rank_s
    arena = _write_nodes(
        arena, tparent, tpmin, tpmax, child_idx,
        jnp.full((tcap,), 2, jnp.int32),
        jnp.full((tcap,), CHILD_BOX, jnp.int32), is_split,
    )
    arena = _write_segments(arena, tparent, is_split, tstart, counts,
                            s["level"])
    # Children slots record their parent for the wide collapse's depth
    # arithmetic.
    oob = jnp.int32(arena.child.shape[0])
    for j in range(2):
        pidx = jnp.where(is_split, child_idx + j, oob)
        arena = arena.replace(
            parent=arena.parent.at[pidx].set(tparent, mode="drop")
        )
    arena = arena.replace(wptr=arena.wptr + 2 * n_split)

    # ---- per-primitive task/bin assignment ----
    # Scatter + 1-channel max-scan (the round-4 form): measured 14.5 ms
    # at 1M vs 167 ms for a searchsorted binary-search chain
    # (benchmarks/probe_sah_runtime.py), and its compile is benign —
    # only the 12-channel flagged segmented scans blew the 1M compile.
    scat = jnp.full((cap,), -1, jnp.int32)
    starts_clip = jnp.where(active & (counts > 0), tstart, cap)
    scat = scat.at[starts_clip].set(tslot, mode="drop")
    task_of = jax.lax.associative_scan(jnp.maximum, scat)
    in_live = jnp.where(task_of >= 0, pos < tend[jnp.clip(task_of, 0, tcap - 1)], False)
    t = jnp.clip(task_of, 0, tcap - 1)
    splitting = in_live & is_split[t]

    lmin = leaves.aabb_min[ids]
    lmax = leaves.aabb_max[ids]
    centre = (lmin + lmax) * 0.5
    axis = _select_axis(tcmin, tcmax)[t]
    cmin_t = jnp.take_along_axis(tcmin[t], axis[:, None], axis=1)[:, 0]
    cmax_t = jnp.take_along_axis(tcmax[t], axis[:, None], axis=1)[:, 0]
    c_t = jnp.take_along_axis(centre, axis[:, None], axis=1)[:, 0]
    k1 = NUM_BINS * (1.0 - BIN_EPS) / (cmax_t - cmin_t)
    bin_sah = jnp.clip((k1 * (c_t - cmin_t)).astype(jnp.int32), 0, NUM_BINS - 1)
    local = pos - tstart[t]
    bin_mid = (local >= (counts[t] >> 1)).astype(jnp.int32)
    bin_id = jnp.where(degen[t], bin_mid, bin_sah)
    # Bin indices in range (src/SharedTaskBuilder.cu:224-235).
    invariants.check(
        jnp.all(jnp.where(splitting, (bin_id >= 0) & (bin_id < NUM_BINS),
                          True)),
        "SAH bin index out of range")
    # Retired/gap/padded primitives keep their position: bin 15 sorts
    # after any live bin of the same preceding task.
    bin_id = jnp.where(splitting, bin_id, 15)
    key = (task_of + 1) * 16 + bin_id
    key = jnp.where(pos < leaves.num_leaves, key, (tcap + 2) * 16)

    _, ids_new = jax.lax.sort_key_val(key, ids, is_stable=True)

    # ---- SAH sweep via per-(task, bin) scatter reductions ----
    # The round-4 form (fwd/bwd segmented scans over [cap, 12], a
    # [cap, 8] one-hot cumsum, two extra payload sorts) is the measured
    # 1M COMPILE blocker on this backend; the first round-5 rewrite
    # (range-min table + searchsorted boundaries) compiled in 58 s but
    # RAN 16 s/level (probe_sah_runtime.py: searchsorted boundaries
    # 1.45 s, table build 0.66 s, per-channel query gathers ~0.3 s each
    # and program-size-heavy). Winning form, compile- AND runtime-light:
    # one scatter-add histogram (0.16 s) + one 12-channel scatter-min +
    # dense 8-bin prefix/suffix mins. Values reduce in PRE-sort order
    # (min is order-free), so the sort carries only ids.
    seg = jnp.where(splitting, t * NUM_BINS + bin_id, tcap * NUM_BINS)
    hist = jnp.zeros((tcap * NUM_BINS + 1,), jnp.int32).at[seg].add(
        1, mode="drop")
    cl = jnp.cumsum(
        hist[:tcap * NUM_BINS].reshape(tcap, NUM_BINS), axis=1)
    packed12 = jnp.concatenate([lmin, centre, -lmax, -centre], axis=1)
    binmin = jnp.full((tcap * NUM_BINS + 1, 12), _F32_MAX).at[seg].min(
        packed12, mode="drop")
    binmin = binmin[:tcap * NUM_BINS].reshape(tcap, NUM_BINS, 12)
    # lpre[:, b] = min over bins <= b (the left side of plane b);
    # rsuf[:, b] = min over bins >= b (right side of plane b-1).
    lpre = jax.lax.associative_scan(jnp.minimum, binmin, axis=1)
    rsuf = jax.lax.associative_scan(
        jnp.minimum, binmin[:, ::-1], axis=1)[:, ::-1]

    best_score = jnp.full((tcap,), _F32_MAX)
    best_b = jnp.zeros((tcap,), jnp.int32)
    # Right-to-left strict improvement keeps the largest bin on ties
    # (src/SharedTaskBuilder.cu:313-327).
    for b in range(NUM_BINS - 2, -1, -1):
        clb = cl[:, b]
        left = lpre[:, b]
        right = rsuf[:, b + 1]
        l_pmin, l_pmax = left[:, 0:3], -left[:, 6:9]
        r_pmin, r_pmax = right[:, 0:3], -right[:, 6:9]
        nl = clb.astype(jnp.float32)
        nr = (counts - clb).astype(jnp.float32)
        score = _sa(l_pmin, l_pmax) * nl + _sa(r_pmin, r_pmax) * nr
        valid = (clb > 0) & (clb < counts)
        take = valid & (score < best_score)
        best_score = jnp.where(take, score, best_score)
        best_b = jnp.where(take, b, best_b)
    # Degenerate tasks bin by midpoint into bins {0, 1}: the plane after
    # bin 0 IS the midpoint split, so best_b = 0 and cl[:, 0] ==
    # counts >> 1 exactly.
    best_b = jnp.where(degen, 0, best_b)
    # NOTE: keep these as take_along_axis — the "static 8-way select
    # chain" variant crashed the remote TPU compiler helper outright
    # (round 5; the emit's multi-dim-index gathers were the real compile
    # hog, fixed in split_convert.py:g1).
    best_cl = jnp.take_along_axis(cl, best_b[:, None], axis=1)[:, 0]
    # Plane found/valid (src/SharedTaskBuilder.cu:329-347): a
    # non-degenerate split task must have found a proper SAH plane.
    invariants.check(
        jnp.all(jnp.where(is_split & ~degen,
                          (best_cl > 0) & (best_cl < counts), True)),
        "no valid SAH plane for a split task")
    # A split task with no valid plane cannot occur (binning spreads the
    # longest non-degenerate centroid axis over >= 2 bins); defensively
    # fall back to a midpoint count with the PARENT's boxes for both
    # children (a conservative superset — never drops primitives).
    use_parent = is_split & ~degen & (
        (best_cl == 0) | (best_cl >= counts))
    best_cl = jnp.where(use_parent, counts >> 1, best_cl)

    mid = tstart + best_cl
    left = jnp.take_along_axis(
        lpre, best_b[:, None, None], axis=1)[:, 0, :]
    right = jnp.take_along_axis(
        rsuf, (best_b + 1)[:, None, None], axis=1)[:, 0, :]
    l_pmin, l_cmin, l_pmax, l_cmax = (
        left[:, 0:3], left[:, 3:6], -left[:, 6:9], -left[:, 9:12]
    )
    r_pmin, r_cmin, r_pmax, r_cmax = (
        right[:, 0:3], right[:, 3:6], -right[:, 6:9], -right[:, 9:12]
    )
    up = use_parent[:, None]
    l_pmin = jnp.where(up, tpmin, l_pmin)
    l_pmax = jnp.where(up, tpmax, l_pmax)
    l_cmin = jnp.where(up, tcmin, l_cmin)
    l_cmax = jnp.where(up, tcmax, l_cmax)
    r_pmin = jnp.where(up, tpmin, r_pmin)
    r_pmax = jnp.where(up, tpmax, r_pmax)
    r_cmin = jnp.where(up, tcmin, r_cmin)
    r_cmax = jnp.where(up, tcmax, r_cmax)

    # ---- new frontier (children of splitting tasks, slot-ordered) ----
    new_n = 2 * n_split
    lslot = jnp.where(is_split, 2 * rank_s, tcap)
    rslot = jnp.where(is_split, 2 * rank_s + 1, tcap)

    def scat2(l_vals, r_vals, fill):
        out = jnp.full((tcap,) + l_vals.shape[1:], fill, l_vals.dtype)
        out = out.at[lslot].set(l_vals, mode="drop")
        out = out.at[rslot].set(r_vals, mode="drop")
        return out

    return dict(
        ids=ids_new,
        tstart=scat2(tstart, mid, 0),
        tend=scat2(mid, tend, 0),
        tparent=scat2(child_idx, child_idx + 1, 0),
        tpmin=scat2(l_pmin, r_pmin, 0.0),
        tpmax=scat2(l_pmax, r_pmax, 0.0),
        tcmin=scat2(l_cmin, r_cmin, 0.0),
        tcmax=scat2(l_cmax, r_cmax, 0.0),
        ntasks=new_n,
        arena=arena,
        level=s["level"] + 1,
    )


# Cached across host-stepped builds: one compile per (shape, max_levels)
# combination, reused for every level and every subsequent rebuild.
_level_step_jit = jax.jit(_level_step, static_argnums=(2,))


def _seed_aabbs(leaves: LeafInput, ids, starts, ends, n_tasks):
    """Per-seed-task centroid/prim AABBs via range-min-table queries.

    Module-level (and jitted for the host-stepped driver: eagerly this
    dispatched ~100 ops one by one to the remote device — measured
    minutes of the round-5 cold 1M build's non-level time)."""
    tcap = starts.shape[0]
    tslot = jnp.arange(tcap, dtype=jnp.int32)
    lmin = leaves.aabb_min[ids]
    lmax = leaves.aabb_max[ids]
    centre = (lmin + lmax) * 0.5
    valid = (tslot < n_tasks) & (ends > starts)
    tbl = build_range_min(
        jnp.concatenate([lmin, centre, -lmax, -centre], axis=1))
    q = range_min_query(
        tbl, jnp.where(valid, starts, 0),
        jnp.where(valid, ends - starts, 0))
    return (
        q[:, 6:9] * -1.0,  # pmax
        q[:, 0:3],  # pmin
        q[:, 9:12] * -1.0,  # cmax
        q[:, 3:6],  # cmin
    )


_seed_aabbs_jit = jax.jit(_seed_aabbs)


class SahDeadlineExceeded(RuntimeError):
    """host-stepped frontier ran past its caller's deadline — callers
    with a fallback tree (bench.py frame-0 SAH attempt) catch this."""


def frontier_build(
    leaves: LeafInput,
    arena: Arena,
    seed_start: jnp.ndarray,
    seed_end: jnp.ndarray,
    seed_parent: jnp.ndarray,
    num_seeds,
    ids0: Optional[jnp.ndarray] = None,
    max_levels: Optional[int] = None,
    return_ids: bool = False,
    host_stepped: bool = False,
    deadline: Optional[float] = None,
) -> Arena:
    """Level-synchronous binned-SAH build over ``leaves``.

    ``host_stepped=True`` runs the level loop on the host (one jitted
    step per level, a ~40 ms ntasks fetch between levels) instead of one
    lax.while_loop. Inside the while_loop every arena scatter targets a
    LOOP-CARRIED buffer — the measured ~1000x gather/scatter pathology
    on this backend (docs/TPU_NOTES.md) that made the 1M-tri SAH build
    minutes-slow; host-stepping turns the arena into jit arguments (the
    fast case). Only valid when frontier_build itself is NOT called
    under jit.

    Seeds are disjoint, start-ordered, non-empty ranges of the initial leaf
    permutation ``ids0`` (identity by default). Each level every frontier
    task either retires as a leaf (count <= LEAF_THRESHOLD) or splits via an
    8-bin SAH plane (midpoint fallback on degenerate centroid bounds), with
    the partition realised by one stable sort of the whole primitive axis.

    Past ``max_levels`` all splits switch to midpoint, which guarantees
    termination in O(log L) further levels even for adversarial SAH splits
    (the reference's work queue has no such bound; its worst case is serial
    chain depth).
    """
    cap = leaves.aabb_min.shape[0]
    num_slots = arena.child.shape[0]
    if ids0 is None:
        ids0 = jnp.arange(cap, dtype=jnp.int32)
    if max_levels is None:
        max_levels = 2 * max(int(cap - 1).bit_length(), 1) + 16

    tcap = max(cap, int(seed_start.shape[0]))
    pos = jnp.arange(cap, dtype=jnp.int32)
    tslot = jnp.arange(tcap, dtype=jnp.int32)

    def pad_t(a, fill=0):
        n = int(a.shape[0])
        if n == tcap:
            return a.astype(jnp.int32) if a.dtype != jnp.float32 else a
        pad = [(0, tcap - n)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad, constant_values=fill)

    seed_start = pad_t(seed_start.astype(jnp.int32))
    seed_end = pad_t(seed_end.astype(jnp.int32))
    seed_parent = pad_t(seed_parent.astype(jnp.int32))
    num_seeds = jnp.asarray(num_seeds, jnp.int32)

    seed_fn = _seed_aabbs_jit if host_stepped else _seed_aabbs
    if host_stepped:
        import os as _os
        import sys as _sys
        import time as _time

        _t0 = _time.perf_counter()
        pmax0, pmin0, cmax0, cmin0 = seed_fn(
            leaves, ids0, seed_start, seed_end, num_seeds)
        if _os.environ.get("TPURT_SAH_VERBOSE") == "1":
            jax.block_until_ready(pmax0)
            print(f"  sah stage seed: {_time.perf_counter() - _t0:.1f} s",
                  file=_sys.stderr, flush=True)
    else:
        pmax0, pmin0, cmax0, cmin0 = seed_fn(
            leaves, ids0, seed_start, seed_end, num_seeds)

    state = dict(
        ids=ids0,
        tstart=seed_start,
        tend=seed_end,
        tparent=seed_parent,
        tpmin=pmin0,
        tpmax=pmax0,
        tcmin=cmin0,
        tcmax=cmax0,
        ntasks=num_seeds,
        arena=arena,
        level=jnp.int32(0),
    )

    def cond(s):
        return s["ntasks"] > 0

    def body(s):
        return _level_step(leaves, s, max_levels)

    if host_stepped:
        import os as _os
        import sys as _sys
        import time as _time

        verbose = _os.environ.get("TPURT_SAH_VERBOSE") == "1"
        out = state
        while int(out["ntasks"]) > 0:
            if deadline is not None and _time.monotonic() > deadline:
                raise SahDeadlineExceeded(
                    f"SAH host-stepped frontier exceeded its deadline at "
                    f"level {int(out['level'])} "
                    f"({int(out['ntasks'])} tasks live)")
            _t0 = _time.perf_counter()
            out = _level_step_jit(leaves, out, max_levels)
            if verbose:
                # the ntasks read in the loop condition is the fetch
                print(f"  sah level {int(out['level'])}: "
                      f"{int(out['ntasks'])} tasks, "
                      f"{_time.perf_counter() - _t0:.2f} s",
                      file=_sys.stderr, flush=True)
    else:
        out = jax.lax.while_loop(cond, body, state)
    if return_ids:
        # Final leaf permutation: every node's subtree is a contiguous
        # range of it (each level's stable sort keys by task id, so
        # retired segments move as blocks and never interleave) — the
        # split-format converter builds leaf windows from it.
        return out["arena"], out["ids"]
    return out["arena"]


def grid_partition(leaves: LeafInput):
    """4x4x4 centroid-grid decomposition (src/Multiblock.cu:431-547).

    Returns (ids sorted by cell, cell_start[64], cell_end[64], cell order of
    non-empty cells, num_nonempty). Binning uses the *centroid* AABB with the
    same (1 - 2^-23) scale factor as the reference.
    """
    cap = leaves.aabb_min.shape[0]
    centre = (leaves.aabb_min + leaves.aabb_max) * 0.5
    live = jnp.arange(cap) < leaves.num_leaves
    cmin = jnp.min(jnp.where(live[:, None], centre, _F32_MAX), axis=0)
    cmax = jnp.max(jnp.where(live[:, None], centre, -_F32_MAX), axis=0)
    scaled = (centre - cmin) * (BLOCK_GRID_DIM * (1.0 - BIN_EPS)) / (cmax - cmin)
    cell3 = jnp.clip(scaled.astype(jnp.int32), 0, BLOCK_GRID_DIM - 1)
    cell = cell3[:, 0] + cell3[:, 1] * BLOCK_GRID_DIM + cell3[:, 2] * BLOCK_GRID_DIM**2
    cell = jnp.where(live, cell, NUM_BLOCKS)  # pads sort last

    ids = jnp.arange(cap, dtype=jnp.int32)
    _, ids_sorted = jax.lax.sort_key_val(cell, ids, is_stable=True)

    counts = jnp.sum(
        (cell[:, None] == jnp.arange(NUM_BLOCKS)[None, :]).astype(jnp.int32), axis=0
    )
    scan = jnp.cumsum(counts)
    cell_start = scan - counts
    cell_end = scan
    return ids_sorted, cell_start, cell_end, counts


def _sah_front(triangles, enable_pairs: bool, enable_splits: bool):
    """Pre-frontier stage of build_sah: setup + grid partition + seeds."""
    if enable_splits:
        from tpu_raytracing.bvh.splits import setup_split_leaves

        leaves, pairs = setup_split_leaves(triangles, enable_pairs)
    else:
        leaves, pairs = setup_leaves(triangles, enable_pairs)
    cap = leaves.aabb_min.shape[0]

    ids_sorted, cell_start, cell_end, cell_counts = grid_partition(leaves)

    # Arena layout: slot 0 = overall root; slots 1..NUM_BLOCKS = cell root
    # slots (only non-empty cells used); the rest allocated by prefix sums.
    arena = make_arena(2 * cap + 2 * NUM_BLOCKS + 2)
    arena = arena.replace(wptr=jnp.int32(1 + NUM_BLOCKS))

    nonempty = cell_counts > 0
    num_cells = jnp.sum(nonempty.astype(jnp.int32))
    # Compact non-empty cells, keeping cell order (start-ordered): seed run i
    # is the i-th non-empty cell and its root lives at arena slot 1 + i.
    rank = jnp.cumsum(nonempty.astype(jnp.int32)) - nonempty.astype(jnp.int32)
    slot = jnp.where(nonempty, rank, NUM_BLOCKS)
    seed_start = jnp.zeros((NUM_BLOCKS,), jnp.int32).at[slot].set(cell_start, mode="drop")
    seed_end = jnp.zeros((NUM_BLOCKS,), jnp.int32).at[slot].set(cell_end, mode="drop")
    seed_parent = 1 + jnp.arange(NUM_BLOCKS, dtype=jnp.int32)
    return (leaves, pairs, ids_sorted, seed_start, seed_end, seed_parent,
            num_cells, arena)


def _sah_top_leaves(arena, num_cells):
    """Top-of-tree leaf inputs over the cell roots
    (src/BuildWrapper.cu:246-250). Each non-empty cell becomes a "leaf"
    that grafts the cell root's children (src/SharedTaskBuilder.cu:424-444).
    Grafting copies the cell-root node wholesale (child, count, AND type):
    a single-leaf cell's root is itself a Tri leaf and must stay one (the
    reference forces Box here and would mis-graft that case,
    src/SharedTaskBuilder.cu:443)."""
    root_slots = 1 + jnp.arange(NUM_BLOCKS, dtype=jnp.int32)
    return LeafInput(
        aabb_min=arena.node_min[root_slots],
        aabb_max=arena.node_max[root_slots],
        child=arena.child[root_slots],
        count=arena.count[root_slots],
        type=arena.type[root_slots],
        num_leaves=num_cells,
    )


# Module-level jits for the host-stepped path (cached across rebuilds).
_sah_front_jit = jax.jit(_sah_front, static_argnums=(1, 2))
_sah_top_jit = jax.jit(_sah_top_leaves)

# Above this primitive count build_sah_auto host-steps the frontier: the
# while_loop form scatters into loop-carried arena buffers — the measured
# ~1000x pathology (docs/TPU_NOTES.md "SAH frontier at scale") that makes
# a 1M-tri jitted SAH build minutes-slow. Below it, one fused while_loop
# program avoids ~30 host round-trips of ~40 ms each.
SAH_HOST_STEP_THRESHOLD = 131072


def build_sah(triangles: jnp.ndarray, enable_pairs: bool = False,
              enable_splits: bool = False,
              host_stepped: bool = False) -> Tuple[BVH, TrianglePairs]:
    """Full SAH pipeline (reference driver: RunSahBuild,
    src/BuildWrapper.cu:140-251): setup (pairing / spatial splits) -> grid
    decomposition -> per-cell SAH builds -> top-of-tree stitch over cell
    roots. Root is node 0 with count 1 (src/main.cu:222-223).

    ``host_stepped=True`` (only valid OUTSIDE jit) runs both frontier
    loops one jitted level-step at a time with the arena as jit arguments
    — required at large primitive counts (see SAH_HOST_STEP_THRESHOLD);
    prefer ``build_sah_auto`` which selects the mode by scene size."""
    front = _sah_front_jit if host_stepped else _sah_front
    (leaves, pairs, ids_sorted, seed_start, seed_end, seed_parent,
     num_cells, arena) = front(triangles, enable_pairs, enable_splits)

    arena = frontier_build(
        leaves, arena, seed_start, seed_end, seed_parent, num_cells,
        ids0=ids_sorted, host_stepped=host_stepped,
    )

    # ---- top of tree over cell roots (src/BuildWrapper.cu:246-250) ----
    top_leaves = (_sah_top_jit if host_stepped else _sah_top_leaves)(
        arena, num_cells)
    arena = frontier_build(
        top_leaves,
        arena,
        jnp.array([0], jnp.int32),
        num_cells[None].astype(jnp.int32),
        jnp.array([0], jnp.int32),
        jnp.int32(1),
        host_stepped=host_stepped,
    )

    bvh = BVH(
        node_min=arena.node_min,
        node_max=arena.node_max,
        child=arena.child,
        count=arena.count,
        type=arena.type,
        parent=arena.parent,
        root=jnp.int32(0),
        root_count=jnp.int32(1),
    )
    return bvh, pairs


# Jitted whole-pipeline form for small scenes (one fused program).
_build_sah_jit = jax.jit(build_sah, static_argnums=(1, 2))


def build_sah_auto(triangles: jnp.ndarray, enable_pairs: bool = False,
                   enable_splits: bool = False) -> Tuple[BVH, TrianglePairs]:
    """build_sah with the frontier mode auto-selected by scene size.

    Large scenes (>= SAH_HOST_STEP_THRESHOLD primitives) host-step the
    level loop — a user running ``--type sah`` on a 1M scene must not hit
    the minutes-slow loop-carried-scatter path; small scenes keep the
    single fused while_loop program. Only valid OUTSIDE jit (the small
    branch jits internally)."""
    if triangles.shape[0] >= SAH_HOST_STEP_THRESHOLD:
        return build_sah(triangles, enable_pairs, enable_splits,
                         host_stepped=True)
    return _build_sah_jit(triangles, enable_pairs, enable_splits)
