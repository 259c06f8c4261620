"""Bottom-up LBVH builder (reference: src/BottomUpBuilder.cu, src/RadixSort.cu).

Karras-style linear BVH, re-designed for XLA's functional semantics:

* scene AABB: a masked min/max reduction (the reference's ordered-int atomics,
  src/Multiblock.cu:104-114 + src/DeviceUtils.cuh:3-36, are unnecessary —
  races don't exist under XLA).
* Morton codes: wide uint32 ops over the primitive axis
  (src/BottomUpBuilder.cu:98-164).
* sort: ``jax.lax.sort`` (stable) replaces the hand-rolled segmented radix
  sort (src/RadixSort.cu:171-225) — XLA's TPU sort is already a tuned
  multi-pass radix network.
* hierarchy: DetermineRange/FindSplit (src/BottomUpBuilder.cu:42-96)
  vectorize perfectly — every internal node runs the same bounded binary
  searches, so the per-thread loops become masked fori_loops over the whole
  node axis at once.
* refit: the reference's one-visit atomic locks (src/BottomUpBuilder.cu:247-285)
  become a level-synchronous fixed-point: H dense passes (H = tree height,
  computed by pointer-doubling) each recompute every interior slot from its
  children; after pass k every node within height k of the leaves is final.

Node-slot layout matches the reference exactly (internal node i owns the
sibling pair slots 2i and 2i+1; the root pair is slots 0..1 —
src/BottomUpBuilder.cu:167-215), so the traversal and the hybrid top rebuild
consume either builder's output unchanged.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_raytracing.bvh.types import BVH, CHILD_BOX, CHILD_NONE, CHILD_TRI, TrianglePairs
from tpu_raytracing.bvh.pairing import can_form_pair, create_pairs, should_form_pair
from tpu_raytracing.ops.intersect import triangle_aabb
from tpu_raytracing.ops.morton import morton3d

# Python float, NOT a jnp scalar: module-level device arrays become
# jit-captured device constants, which this backend re-stages per call.
_F32_MAX = float(jnp.finfo(jnp.float32).max)
# Longest possible common prefix: 30 Morton bits + 32 index tie-break bits,
# so Karras tree depth is bounded by ~64 regardless of input size.
MAX_TREE_DEPTH = 64


def scene_aabb(triangles: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scene bounds over all vertices (reference: CalculateSceneAabb,
    src/Multiblock.cu:104-114)."""
    pts = triangles.reshape(-1, 3)
    return jnp.min(pts, axis=0), jnp.max(pts, axis=0)


def fused_sorted_pairs(
    triangles: jnp.ndarray, aabb_min: jnp.ndarray, aabb_max: jnp.ndarray,
    enable_pairs: bool,
):
    """Morton sort that carries the PACKED PAIR ROWS as sort payloads.

    Replaces generate_morton_codes[_pairs] + sort_codes +
    generate_triangles for the bucket builder's front end. Measured on
    the round-2 backend: a 9-payload 1M-entry stable sort costs ~14 ms
    while the two channel-major vertex gathers by the sort permutation
    cost ~175 ms. create_pairs is per-entry local, so the 16-word rows
    are built BEFORE the sort and ride it in two stable passes (9 + 8
    payloads — an 18-payload sort hits a Mosaic compile cliff). Invalid
    entries carry key 0xFFFFFFFF and sort to the end, which also
    replaces the dense-prefix compaction scatter of
    generate_morton_codes_pairs.

    Layout-identical to the old path: entries are interleaved
    [A_0, B_0, A_1, B_1, ...] (the old compacted order), and a stable
    sort only sees relative order, so ties land in the same slots.

    Returns (sorted_codes, sorted_rows [n,16] int32, sorted_values,
    num_leaves).
    """
    codes, values, rows = _pair_assembly(
        triangles, aabb_min, aabb_max, enable_pairs)

    cols = [rows[:, i] for i in range(16)]
    s1 = jax.lax.sort([codes] + cols[:9], num_keys=1, is_stable=True)
    s2 = jax.lax.sort([codes] + cols[9:] + [values], num_keys=1,
                      is_stable=True)
    sorted_codes = s1[0]
    sorted_rows = jnp.stack(list(s1[1:]) + list(s2[1:-1]), axis=1)
    sorted_values = s2[-1]
    num_leaves = jnp.sum(
        (codes != jnp.uint32(0xFFFFFFFF)).astype(jnp.int32))
    return sorted_codes, sorted_rows, sorted_values, num_leaves


def _pair_assembly(triangles, aabb_min, aabb_max, enable_pairs):
    """Pre-sort half of fused_sorted_pairs: pairing tests + packed rows
    + Morton keys/values (extracted so profilers time production code)."""
    num = triangles.shape[0]
    extent = aabb_max - aabb_min

    def code_of(c):
        return morton3d(jnp.clip((c - aabb_min) / extent, 0.0, 1.0))

    if not enable_pairs:
        idx = jnp.arange(num, dtype=jnp.int32)
        codes = code_of(jnp.mean(triangles, axis=1))
        values = idx.astype(jnp.uint32)
        from tpu_raytracing.trace.traverse import pack_pairs

        rows = pack_pairs(create_pairs(
            triangles, triangles, idx, idx, jnp.zeros((num,), bool))).rows
    else:
        num_even = (num + 1) // 2
        a = triangles[0::2]
        has_b = jnp.arange(num_even) * 2 + 1 < num
        tri_even = (jnp.concatenate([triangles, triangles[-1:]], axis=0)
                    if num % 2 else triangles)
        b = tri_even[1::2]
        a_min, a_max = triangle_aabb(a[:, 0], a[:, 1], a[:, 2])
        b_min, b_max = triangle_aabb(b[:, 0], b[:, 1], b[:, 2])
        c_min = jnp.minimum(a_min, b_min)
        c_max = jnp.maximum(a_max, b_max)
        can, _, _ = can_form_pair(a, b)
        merge = has_b & can & should_form_pair(
            a_min, a_max, b_min, b_max, c_min, c_max)
        centre_a = jnp.mean(a, axis=1)
        centre_b = jnp.mean(b, axis=1)
        centre_first = jnp.where(
            merge[:, None], (centre_a + centre_b) * 0.5, centre_a)
        tid = jnp.arange(num_even, dtype=jnp.uint32) * 2
        codes_a = code_of(centre_first)
        val_a = jnp.where(merge, tid | jnp.uint32(0x80000000), tid)
        second_valid = has_b & ~merge
        codes_b = jnp.where(second_valid, code_of(centre_b),
                            jnp.uint32(0xFFFFFFFF))
        val_b = tid + 1
        from tpu_raytracing.trace.traverse import pack_pairs

        idx_a = tid.astype(jnp.int32)
        rows_a = pack_pairs(create_pairs(
            a, b, idx_a, jnp.minimum(idx_a + 1, num - 1), merge)).rows
        # B entries are always unpaired: create_pairs ignores its b/v3
        # operand entirely (v3 = rotated v2, both ids = a's).
        rows_b = pack_pairs(create_pairs(
            b, b, jnp.minimum(idx_a + 1, num - 1),
            jnp.minimum(idx_a + 1, num - 1),
            jnp.zeros((num_even,), bool))).rows
        codes = jnp.stack([codes_a, codes_b], axis=1).reshape(-1)[:num]
        values = jnp.stack([val_a, val_b], axis=1).reshape(-1)[:num]
        rows = jnp.stack([rows_a, rows_b], axis=1).reshape(-1, 16)[:num]

    return codes, values, rows


def generate_morton_codes(
    triangles: jnp.ndarray, aabb_min: jnp.ndarray, aabb_max: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Codes + identity values, one per triangle (src/BottomUpBuilder.cu:98-115)."""
    centre = jnp.mean(triangles, axis=1)
    norm = (centre - aabb_min) / (aabb_max - aabb_min)
    norm = jnp.clip(norm, 0.0, 1.0)
    codes = morton3d(norm)
    values = jnp.arange(triangles.shape[0], dtype=jnp.uint32)
    return codes, values


def generate_morton_codes_pairs(
    triangles: jnp.ndarray, aabb_min: jnp.ndarray, aabb_max: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Paired Morton codes (src/BottomUpBuilder.cu:117-164).

    Adjacent triangles (2t, 2t+1) merge into one leaf when they share an edge
    and pass the surface-area heuristic; a merged leaf's value carries the
    MSB pair flag. The reference allocates leaf slots with an atomicAdd
    (nondeterministic order); here compaction is a prefix sum, so leaf order
    is deterministic. Returns (codes, values, num_leaves) padded to T with
    0xFFFFFFFF keys that sort to the end.
    """
    num = triangles.shape[0]
    num_even = (num + 1) // 2
    a = triangles[0::2]
    has_b = jnp.arange(num_even) * 2 + 1 < num
    # b is the odd-index stride slice (dense relayout), NOT a row gather:
    # a [n/2, 3, 3] gather tile-pads the minor dims ~14x on this backend
    # (see generate_triangles below). Odd num duplicates the last row.
    tri_even = (jnp.concatenate([triangles, triangles[-1:]], axis=0)
                if num % 2 else triangles)
    b = tri_even[1::2]

    a_min, a_max = triangle_aabb(a[:, 0], a[:, 1], a[:, 2])
    b_min, b_max = triangle_aabb(b[:, 0], b[:, 1], b[:, 2])
    c_min = jnp.minimum(a_min, b_min)
    c_max = jnp.maximum(a_max, b_max)

    can, _, _ = can_form_pair(a, b)
    merge = has_b & can & should_form_pair(a_min, a_max, b_min, b_max, c_min, c_max)

    centre_a = jnp.mean(a, axis=1)
    centre_b = jnp.mean(b, axis=1)
    centre_first = jnp.where(merge[:, None], (centre_a + centre_b) * 0.5, centre_a)

    extent = aabb_max - aabb_min

    def code_of(c):
        return morton3d(jnp.clip((c - aabb_min) / extent, 0.0, 1.0))

    tid = (jnp.arange(num_even, dtype=jnp.uint32) * 2).astype(jnp.uint32)
    first_codes = code_of(centre_first)
    first_values = jnp.where(merge, tid | jnp.uint32(0x80000000), tid)
    second_valid = has_b & ~merge
    second_codes = code_of(centre_b)
    second_values = tid + 1

    # Compact (first, maybe-second) into a dense prefix: leaf counts 1 or 2.
    counts = 1 + second_valid.astype(jnp.int32)
    starts = jnp.cumsum(counts) - counts
    num_leaves = starts[-1] + counts[-1] if num_even else jnp.int32(0)

    codes = jnp.full((num,), 0xFFFFFFFF, jnp.uint32)
    values = jnp.zeros((num,), jnp.uint32)
    codes = codes.at[starts].set(first_codes)
    values = values.at[starts].set(first_values)
    second_slot = jnp.where(second_valid, starts + 1, num)  # OOB -> dropped
    codes = codes.at[second_slot].set(second_codes, mode="drop")
    values = values.at[second_slot].set(second_values, mode="drop")
    return codes, values, num_leaves


def sort_codes(codes: jnp.ndarray, values: jnp.ndarray):
    """Stable key/value sort (replaces src/RadixSort.cu:171-225)."""
    return jax.lax.sort_key_val(codes, values, is_stable=True)


def _cpl(codes: jnp.ndarray, i: jnp.ndarray, j: jnp.ndarray, count) -> jnp.ndarray:
    """Common-prefix length with index tie-break (src/BottomUpBuilder.cu:34-38);
    -1 when j is out of range (standard Karras boundary convention)."""
    valid = (j >= 0) & (j < count)
    j_safe = jnp.clip(j, 0, codes.shape[0] - 1)
    ci = codes[i]
    cj = codes[j_safe]
    xor_codes = ci ^ cj
    xor_idx = (i.astype(jnp.uint32) ^ j_safe.astype(jnp.uint32)).astype(jnp.uint32)
    same = xor_codes == 0
    out = jnp.where(same, 32 + jax.lax.clz(xor_idx).astype(jnp.int32),
                    jax.lax.clz(xor_codes).astype(jnp.int32))
    return jnp.where(valid, out, -1)


def generate_hierarchy(sorted_codes: jnp.ndarray, count):
    """Vectorized Karras internal-node construction
    (src/BottomUpBuilder.cu:167-215).

    ``count`` may be a traced scalar (paired builds) or a Python int; arrays
    are padded to the static maximum. Returns (BVH, range_lo, range_hi):
    topology plus each slot's covered sorted-leaf range; AABBs are filled by
    refit_ranges.
    """
    n_max = sorted_codes.shape[0]
    num_slots = max(2 * (n_max - 1), 2)
    ii = jnp.arange(n_max - 1, dtype=jnp.int32)
    valid = ii < count - 1

    # --- DetermineRange (src/BottomUpBuilder.cu:42-68) ---
    d = jnp.where(_cpl(sorted_codes, ii, ii + 1, count)
                  - _cpl(sorted_codes, ii, ii - 1, count) >= 0, 1, -1)
    cpl_min = _cpl(sorted_codes, ii, ii - d, count)

    def grow(_, state):
        lmax, done = state
        probe = _cpl(sorted_codes, ii, ii + lmax * d, count)
        cond = probe > cpl_min
        done = done | ~cond
        lmax = jnp.where(done, lmax, lmax * 2)
        return lmax, done

    lmax, _ = jax.lax.fori_loop(
        0, 34, grow, (jnp.full_like(ii, 2), jnp.zeros_like(ii, dtype=bool))
    )

    def shrink(k, l):
        t = lmax >> (k + 1)
        probe = _cpl(sorted_codes, ii, ii + (l + t) * d, count)
        take = (t > 0) & (probe > cpl_min)
        return jnp.where(take, l + t, l)

    l = jax.lax.fori_loop(0, 34, shrink, jnp.zeros_like(ii))
    j = ii + l * d
    first = jnp.where(ii == 0, 0, jnp.minimum(ii, j))
    last = jnp.where(ii == 0, jnp.asarray(count - 1, ii.dtype), jnp.maximum(ii, j))

    # --- FindSplit (src/BottomUpBuilder.cu:70-96) ---
    common_prefix = _cpl(sorted_codes, first, last, count)

    def find_split(_, state):
        split, step, done = state
        step = jnp.where(done, step, (step + 1) >> 1)
        new_split = split + step
        probe = _cpl(sorted_codes, first, new_split, count)
        accept = ~done & (new_split < last) & (probe > common_prefix)
        split = jnp.where(accept, new_split, split)
        done = done | (step <= 1)
        return split, step, done

    split, _, _ = jax.lax.fori_loop(
        0, 34, find_split, (first, last - first, jnp.zeros_like(ii, dtype=bool))
    )

    # --- child/type/parent writes (src/BottomUpBuilder.cu:186-214) ---
    # Slot pair (2i, 2i+1) belongs to internal node i, so child/type build by
    # interleave (stack + reshape) instead of scatter — scatters are slow on
    # TPU and the slot indices are just the even/odd stride.
    leaf_a = split == first
    leaf_b = split + 1 == last
    child_a = jnp.where(leaf_a, split, split * 2)
    child_b = jnp.where(leaf_b, split + 1, (split + 1) * 2)
    none = jnp.int32(CHILD_NONE)
    type_a = jnp.where(~valid, none, jnp.where(leaf_a, CHILD_TRI, CHILD_BOX))
    type_b = jnp.where(~valid, none, jnp.where(leaf_b, CHILD_TRI, CHILD_BOX))

    def interleave(a, b):
        return jnp.stack([a, b], axis=1).reshape(-1)

    child = interleave(jnp.where(valid, child_a, 0), jnp.where(valid, child_b, 0))
    ntype = interleave(type_a, type_b)
    # Sorted-leaf range covered by each slot: [first, split] on the left,
    # [split+1, last] on the right (single-leaf ranges for Tri slots). These
    # drive the gather-free range-min refit.
    range_lo = interleave(first, split + 1)
    range_hi = interleave(split, last)

    oob = jnp.int32(num_slots)
    parent = jnp.arange(num_slots, dtype=jnp.int32)
    pa = jnp.where(valid & ~leaf_a, child_a, oob)
    pb = jnp.where(valid & ~leaf_b, child_b, oob)
    parent = parent.at[pa].set(2 * ii, mode="drop")
    parent = parent.at[pa + 1].set(2 * ii, mode="drop")
    parent = parent.at[pb].set(2 * ii + 1, mode="drop")
    parent = parent.at[pb + 1].set(2 * ii + 1, mode="drop")

    count_field = jnp.where(
        ntype == CHILD_BOX, 2, jnp.where(ntype == CHILD_TRI, 1, 0)
    ).astype(jnp.int32)

    if num_slots > 2 * (n_max - 1):  # n_max < 2 padding
        pad = num_slots - 2 * (n_max - 1)
        child = jnp.pad(child, (0, pad))
        ntype = jnp.pad(ntype, (0, pad))
        count_field = jnp.pad(count_field, (0, pad))
        range_lo = jnp.pad(range_lo, (0, pad))
        range_hi = jnp.pad(range_hi, (0, pad))

    bvh = BVH(
        node_min=jnp.zeros((num_slots, 3), jnp.float32),
        node_max=jnp.zeros((num_slots, 3), jnp.float32),
        child=child,
        count=count_field,
        type=ntype,
        parent=parent,
        root=jnp.int32(0),
        root_count=jnp.int32(2),
    )
    return bvh, range_lo, range_hi


def refit_ranges(bvh: BVH, range_lo, range_hi, leaf_lo, leaf_hi) -> BVH:
    """Gather-free bottom-up refit: every slot's box is the min/max of the
    sorted leaf AABBs over its covered range [range_lo, range_hi].

    Replaces both the reference's atomic one-visit refit
    (src/BottomUpBuilder.cu:247-285) and this port's earlier level-sync
    fixed point: a sparse-table range-min over the sorted leaf order needs
    no loop-carried gathers (which this TPU backend executes pathologically
    slowly) — only log2(n) dense shifted-min passes plus two gathers per
    level from freshly produced tables. Exactness: the range min/max equals
    the child-union fold bit-for-bit (fp min/max is associative), so
    VerifyHierarchy's exact-equality check still passes.
    """
    n = leaf_lo.shape[0]
    levels = max(int(n - 1).bit_length(), 1)
    # Channel-major [6, n] layout: gathers then run along the big axis with
    # no tile padding (an [n, 6] gather pads the 6-wide minor dim to 128
    # lanes — ~20x the traffic).
    table = jnp.concatenate([leaf_lo, -leaf_hi], axis=1).T  # [6, n] min-space
    length = jnp.maximum(range_hi - range_lo + 1, 1)
    klev = 31 - jax.lax.clz(length.astype(jnp.uint32)).astype(jnp.int32)

    out = jnp.full((6, bvh.num_slots), _F32_MAX, jnp.float32)
    for k in range(levels + 1):
        use = klev == k
        span = 1 << k
        a = jnp.take(table, jnp.clip(range_lo, 0, n - 1), axis=1)
        b = jnp.take(table, jnp.clip(range_hi + 1 - span, 0, n - 1), axis=1)
        cand = jnp.minimum(a, b)
        out = jnp.where(use[None, :], cand, out)
        if k < levels:
            shifted = jnp.concatenate(
                [table[:, span:],
                 jnp.full((6, min(span, n)), _F32_MAX, jnp.float32)],
                axis=1,
            )[:, :n]
            table = jnp.minimum(table, shifted)

    return bvh.replace(node_min=out[0:3].T, node_max=-out[3:6].T)


def tree_height(bvh: BVH) -> jnp.ndarray:
    """Max slot depth via pointer doubling on parent links (log passes).

    Diagnostic only — the build path no longer needs it (refit_ranges is
    loop-free), and its loop-carried gathers are slow on TPU."""
    ptr = bvh.parent
    depth = (ptr != jnp.arange(bvh.num_slots, dtype=jnp.int32)).astype(jnp.int32)

    def body(_, state):
        depth, ptr = state
        depth = depth + depth[ptr]
        ptr = ptr[ptr]
        return depth, ptr

    # Depth is bounded by MAX_TREE_DEPTH (64), so 7 doublings saturate.
    depth, _ = jax.lax.fori_loop(0, 7, body, (depth, ptr))
    return jnp.max(depth)


def generate_triangles(
    sorted_values: jnp.ndarray, triangles: jnp.ndarray
) -> TrianglePairs:
    """Assemble TrianglePairs in sorted-leaf order
    (src/BottomUpBuilder.cu:287-312).

    The reference leaves primitive ids uninitialised in the unpaired branch
    (src/BottomUpBuilder.cu:299-309); we define them as the source index.
    """
    from tpu_raytracing.ops.gather import take_rows

    is_pair = (sorted_values >> 31).astype(bool)
    index = (sorted_values & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    num_tris = triangles.shape[0]
    second = jnp.minimum(index + 1, num_tris - 1)
    # Channel-major gathers: a direct [n, 3, 3] row gather tile-pads the
    # minor dims ~14x and dominated the paired build's front end
    # (~175 ms of the 225 ms Morton+sort+pairs block at 1M).
    flat = triangles.reshape(num_tris, 9)
    a = take_rows(flat, index).reshape(-1, 3, 3)
    b = take_rows(flat, second).reshape(-1, 3, 3)
    return create_pairs(a, b, index, second, is_pair)


def refit(bvh: BVH, lo: jnp.ndarray, hi: jnp.ndarray, leaf_slots: jnp.ndarray,
          num_leaves) -> BVH:
    """Bottom-up AABB refit, level-synchronous
    (replaces src/BottomUpBuilder.cu:247-285's atomic one-visit locks).

    leaf_slots[k] is the node slot of sorted leaf k; lo/hi are the leaf
    AABBs in sorted-leaf order.
    """
    k = jnp.arange(leaf_slots.shape[0])
    slot = jnp.where(k < num_leaves, leaf_slots, bvh.num_slots)
    node_min = bvh.node_min.at[slot].set(lo, mode="drop")
    node_max = bvh.node_max.at[slot].set(hi, mode="drop")

    is_box = (bvh.type == CHILD_BOX)[:, None]
    child = bvh.child
    height = tree_height(bvh)

    def pass_body(state):
        node_min, node_max, it = state
        cmin = jnp.minimum(node_min[child], node_min[child + 1])
        cmax = jnp.maximum(node_max[child], node_max[child + 1])
        node_min = jnp.where(is_box, cmin, node_min)
        node_max = jnp.where(is_box, cmax, node_max)
        return node_min, node_max, it + 1

    node_min, node_max, _ = jax.lax.while_loop(
        lambda s: s[2] < height, pass_body, (node_min, node_max, jnp.int32(0))
    )
    return bvh.replace(node_min=node_min, node_max=node_max)


def _leaf_slots_from_hierarchy(bvh: BVH, num_leaves_max: int) -> jnp.ndarray:
    """Recover leaf_slot[k] (slot of sorted leaf k) from leaf slots' child
    field — equivalent to the leaf_indices writes in GenerateHierarchy."""
    slots = jnp.arange(bvh.num_slots, dtype=jnp.int32)
    is_leaf = bvh.type == CHILD_TRI
    target = jnp.where(is_leaf, bvh.child, num_leaves_max)
    out = jnp.zeros((num_leaves_max,), jnp.int32)
    return out.at[target].set(slots, mode="drop")


def build_lbvh(triangles: jnp.ndarray, enable_pairs: bool = False):
    """Full LBVH pipeline (reference driver: RunBottomUpBuild,
    src/BuildWrapper.cu:253-362). Returns (BVH, TrianglePairs).

    The reference's mid-build device-to-host reads for launch sizing
    (src/BuildWrapper.cu:318-319) disappear: shapes are padded to the
    triangle count and the live leaf count stays on device.
    """
    aabb_min, aabb_max = scene_aabb(triangles)
    if enable_pairs:
        codes, values, num_leaves = generate_morton_codes_pairs(
            triangles, aabb_min, aabb_max
        )
    else:
        codes, values = generate_morton_codes(triangles, aabb_min, aabb_max)
        num_leaves = triangles.shape[0]
    sorted_codes, sorted_values = sort_codes(codes, values)
    bvh, range_lo, range_hi = generate_hierarchy(sorted_codes, num_leaves)
    pairs = generate_triangles(sorted_values, triangles)
    # Leaf k's box covers the pair's four vertices (v3 == v2 for unpaired
    # leaves, so including it is a no-op, matching the is_pair branch of
    # src/BottomUpBuilder.cu:260-267).
    lo = jnp.minimum(jnp.minimum(pairs.v0, pairs.v1), jnp.minimum(pairs.v2, pairs.v3))
    hi = jnp.maximum(jnp.maximum(pairs.v0, pairs.v1), jnp.maximum(pairs.v2, pairs.v3))
    bvh = refit_ranges(bvh, range_lo, range_hi, lo, hi)
    return bvh, pairs


def build_lbvh_from_aabbs(
    leaf_min: jnp.ndarray,
    leaf_max: jnp.ndarray,
    leaf_payload: jnp.ndarray,
    leaf_type: int = CHILD_TRI,
    leaf_count: int = 1,
):
    """LBVH over arbitrary leaf boxes (the TLAS path: leaves are instance
    world AABBs with ChildType_Inst, a capability the reference declares but
    never builds — src/Common.cuh:40).

    Returns a BVH whose leaf nodes carry ``leaf_payload`` in their child
    field and ``leaf_count`` in count. Root is the slot pair 0..1.
    """
    num = leaf_min.shape[0]
    if num == 0:
        raise ValueError("build_lbvh_from_aabbs needs at least one leaf")
    if num == 1:
        # Degenerate single-instance TLAS: Karras needs >= 2 leaves (one
        # code has no internal nodes and would emit an all-NONE arena,
        # silently dropping the instance). Emit the root pair directly:
        # slot 0 = the leaf, slot 1 = NONE (inverted box, never hits).
        from tpu_raytracing.bvh.types import CHILD_NONE, empty_bvh

        bvh = empty_bvh(2)
        return bvh.replace(
            node_min=bvh.node_min.at[0].set(leaf_min[0]),
            node_max=bvh.node_max.at[0].set(leaf_max[0]),
            child=bvh.child.at[0].set(leaf_payload[0].astype(jnp.int32)),
            count=bvh.count.at[0].set(leaf_count),
            type=bvh.type.at[0].set(leaf_type),
            root=jnp.int32(0),
            root_count=jnp.int32(2),
        )
    centre = (leaf_min + leaf_max) * 0.5
    cmin = jnp.min(centre, axis=0)
    cmax = jnp.max(centre, axis=0)
    norm = jnp.clip((centre - cmin) / jnp.maximum(cmax - cmin, 1e-30), 0.0, 1.0)
    codes = morton3d(norm)
    values = jnp.arange(num, dtype=jnp.uint32)
    sorted_codes, sorted_values = sort_codes(codes, values)
    bvh, range_lo, range_hi = generate_hierarchy(sorted_codes, num)
    src = sorted_values.astype(jnp.int32)
    is_leaf = bvh.type == CHILD_TRI
    payload = leaf_payload[src[jnp.clip(bvh.child, 0, num - 1)]]
    bvh = bvh.replace(
        child=jnp.where(is_leaf, payload, bvh.child),
        count=jnp.where(is_leaf, leaf_count, bvh.count),
        type=jnp.where(is_leaf, leaf_type, bvh.type),
    )
    bvh = refit_ranges(bvh, range_lo, range_hi, leaf_min[src], leaf_max[src])
    return bvh
