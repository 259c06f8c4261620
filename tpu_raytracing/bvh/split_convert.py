"""SAH-quality trees for the flagship split kernel.

The reference's headline builder is the binned-SAH SharedTaskBuild
(src/SharedTaskBuilder.cu:909-995) and its tracer consumes that tree; in
round 1 the split-Pallas kernel could only consume the Morton-bucket
build. This module converts the binned-SAH binary tree into the SplitBVH
format (8-wide inner rows + leaf windows into a sorted pair array), so
``--type sah --tracer split`` runs the flagship kernel on an SAH tree.

Key structural fact: the level-synchronous SAH frontier realises every
partition with ONE stable sort of the whole primitive axis keyed by
(task, bin) — so a node's subtree occupies a CONTIGUOUS range of the
final leaf permutation (retired segments ride along as blocks keyed to
the preceding active task and never interleave). Reordering the pair
array by that permutation makes every subtree a contiguous pair range,
which is exactly the split format's leaf-window invariant: a terminal
entry stores its subtree's window start, and the kernel intersects the
fixed-width window [start, start+leaf_width) — neighbouring pairs ride
along as legal closest-hit candidates.

The collapse to 8-wide rows reuses the wide builder's depth-arithmetic
anchor rule (bvh/wide.py), with one change: frontier expansion stops
early at any entry whose subtree holds <= leaf_width pairs — that entry
becomes a Tri window (so anchors additionally require a subtree larger
than the window, keeping the row count ~n/leaf_width).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_raytracing.bvh import sah
from tpu_raytracing.bvh.bucket import SplitBVH
from tpu_raytracing.bvh.types import CHILD_BOX, CHILD_NONE, CHILD_TRI
from tpu_raytracing.trace.traverse import (
    _META_CHILD_SHIFT,
    PackedPairs,
    pack_pairs,
)

_F32_MAX = float(jnp.finfo(jnp.float32).max)
WIDE = 8


def _setup(triangles, enable_pairs: bool, enable_splits: bool):
    if enable_splits:
        from tpu_raytracing.bvh.splits import setup_split_leaves

        return setup_split_leaves(triangles, enable_pairs)
    return sah.setup_leaves(triangles, enable_pairs)


# Module-level jits for the host-stepped path: cached across rebuilds
# (a fresh jax.jit per call would re-trace and re-compile every build).
_setup_leaves_jit = jax.jit(_setup, static_argnums=(1, 2))
_emit_from_arena_jit = jax.jit(
    lambda arena, ids_final, leaves, pairs, leaf_width: _emit_from_arena(
        arena, ids_final, leaves, pairs, leaf_width),
    static_argnums=(4,))


def _split_cap(n: int, leaf_width: int) -> int:
    """Rows bound: a live anchor's subtree holds > leaf_width pairs and
    anchors of one depth class are disjoint; ~2n/k bounds nodes with >= k
    descendants across all classes."""
    return max(4 * n // max(leaf_width, 1), 256) + 64


def build_sah_split(
    triangles: jnp.ndarray, enable_pairs: bool = False, leaf_width: int = 64,
    host_stepped: bool = False, enable_splits: bool = False,
    deadline: float = None,
) -> Tuple[SplitBVH, PackedPairs]:
    """Binned-SAH build emitting the split format.

    Single global SAH frontier (the 64-cell grid decomposition exists for
    the reference's GPU-block parallelism, not tree quality; one frontier
    is the same algorithm level-synchronously and keeps subtree ranges
    trivially derivable).

    ``enable_splits``: bounded spatial splits (reference SetupSplits /
    SetupPairSplits, src/Multiblock.cu:200-425) — primitives spanning
    grid cells become one clipped reference per cell. The sorted "pair"
    array then carries DUPLICATE rows (one per reference); that is safe
    for the leaf-window tracer: windows index references, each window
    row is real scene geometry, and Moller-Trumbore tests the full
    triangle whatever the clip — duplicates only re-test. Entry AABBs
    come from the clipped reference boxes (the quality win,
    src/Multiblock.cu:200-288). Note refit_split on a splits tree
    recomputes UNclipped boxes (correct, boxes only grow — the clip
    planes aren't carried); rebuild to restore split quality.

    ``host_stepped=True`` (only valid OUTSIDE jit): run the frontier's
    level loop on the host with jitted pre/step/post stages — the
    while_loop form scatters into loop-carried arena buffers, the
    measured ~1000x pathology that makes the 1M-tri SAH build
    minutes-slow (docs/TPU_NOTES.md, benchmarks/probe_tree.py).
    """
    if host_stepped:
        import os as _os
        import sys as _sys
        import time as _time

        verbose = _os.environ.get("TPURT_SAH_VERBOSE") == "1"

        def _mark(label, t0):
            if verbose:
                print(f"  sah stage {label}: "
                      f"{_time.perf_counter() - t0:.1f} s",
                      file=_sys.stderr, flush=True)
            return _time.perf_counter()

        t = _time.perf_counter()
        leaves, pairs = _setup_leaves_jit(triangles, enable_pairs,
                                          enable_splits)
        jax.block_until_ready(leaves.aabb_min)
        t = _mark("setup", t)
        cap = leaves.aabb_min.shape[0]
        num_leaves = leaves.num_leaves
        arena = sah.make_arena(2 * cap + 2, track_segments=True)
        arena = arena.replace(wptr=jnp.int32(1))
        arena, ids_final = sah.frontier_build(
            leaves, arena,
            jnp.zeros((1,), jnp.int32),
            num_leaves[None].astype(jnp.int32),
            jnp.zeros((1,), jnp.int32),
            jnp.int32(1), return_ids=True, host_stepped=True,
            deadline=deadline,
        )
        t = _mark("frontier", t)
        out = _emit_from_arena_jit(arena, ids_final, leaves, pairs,
                                   leaf_width)
        jax.block_until_ready(out[0].inner)
        _mark("emit", t)
        return out

    leaves, pairs = _setup(triangles, enable_pairs, enable_splits)
    cap = leaves.aabb_min.shape[0]
    num_leaves = leaves.num_leaves

    arena = sah.make_arena(2 * cap + 2, track_segments=True)
    arena = arena.replace(wptr=jnp.int32(1))
    arena, ids_final = sah.frontier_build(
        leaves,
        arena,
        jnp.zeros((1,), jnp.int32),
        num_leaves[None].astype(jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.int32(1),
        return_ids=True,
    )
    return _emit_from_arena(arena, ids_final, leaves, pairs, leaf_width)


# Fused-jit cache for small scenes, keyed by the static build flags.
_JIT_CACHE = {}


def build_sah_split_auto(
    triangles: jnp.ndarray, enable_pairs: bool = False, leaf_width: int = 64,
    enable_splits: bool = False,
) -> Tuple[SplitBVH, PackedPairs]:
    """build_sah_split with the frontier mode auto-selected by scene size
    (same policy as sah.build_sah_auto). Only valid OUTSIDE jit."""
    if triangles.shape[0] >= sah.SAH_HOST_STEP_THRESHOLD:
        return build_sah_split(triangles, enable_pairs, leaf_width,
                               host_stepped=True,
                               enable_splits=enable_splits)
    key = (enable_pairs, leaf_width, enable_splits)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda t: build_sah_split(
            t, enable_pairs, leaf_width, enable_splits=enable_splits))
        _JIT_CACHE[key] = fn
    return fn(triangles)


def check_sah_split_capacity(split: SplitBVH) -> None:
    """Host-fetch guard for the SAH->split emission (ADVICE r4): anchor
    rows whose destination slot 1+rank lands past ICAP are scatter-dropped
    (mode='drop' in _emit_from_arena), which would silently truncate the
    traced tree. Call wherever the emitted tree is fetched/adopted, like
    bucket.check_split_capacity on the bucket path."""
    ni = int(split.num_inner)
    icap = int(split.inner.shape[0])
    if not 0 < ni <= icap:
        raise RuntimeError(
            f"SAH split emit overflow: num_inner {ni} outside (0, {icap}] "
            f"— anchor rows were dropped; raise _split_cap")
    if int(split.num_leaves) <= 0:
        raise RuntimeError("SAH split emit produced no live leaves")


def _emit_from_arena(arena, ids_final, leaves, pairs, leaf_width):
    """SplitBVH emission from a finished SAH arena (see build_sah_split)."""
    cap = leaves.aabb_min.shape[0]
    num_leaves = leaves.num_leaves
    nslots = arena.child.shape[0]

    # --- pair array in final leaf order (zero the padded tail) ---
    packed = pack_pairs(pairs)
    pid_sorted = leaves.child[jnp.clip(ids_final, 0, cap - 1)]
    live = jnp.arange(cap, dtype=jnp.int32) < num_leaves
    rows_sorted = jnp.where(
        live[:, None],
        packed.rows[jnp.clip(pid_sorted, 0, packed.rows.shape[0] - 1)],
        0,
    )
    packed_sorted = PackedPairs(rows=rows_sorted)

    # --- per-slot subtree (start, count) and depth: recorded by the
    # frontier at node-write time (sah.Arena seg tables). The previous
    # bottom-up fixed point (58 unrolled passes of gathers on loop-carried
    # counts/starts) and parent pointer-doubling were the measured
    # ~1000x carried-gather pathology and blew up the 1M-tri compile.
    is_box = arena.type == CHILD_BOX
    counts = arena.seg_count
    starts = jnp.where(counts > 0, arena.seg_start, cap)
    depth = arena.depth
    c0 = jnp.clip(arena.child, 0, nslots - 1)
    big = counts > leaf_width
    anchor = is_box & big & (depth >= 3) & (depth % 3 == 0)
    rank = jnp.cumsum(anchor.astype(jnp.int32)) - anchor.astype(jnp.int32)
    wid_of_slot = jnp.where(anchor, 1 + rank, -1)
    num_inner = 1 + jnp.sum(anchor.astype(jnp.int32))

    def g1(arr, s):
        """Gather with FLATTENED (1-D) indices: multi-dim index gathers
        compile pathologically on this backend (probe_emit bisect,
        round 5: the [ns, 2..8]-indexed expand chain alone cost ~295 s
        of the emit's ~260 s compile; 1-D-index gathers are seconds)."""
        out = arr[s.reshape(-1)]
        return out.reshape(s.shape + arr.shape[1:])

    # --- frontier with early window termination ---
    # Path-walk form: entry e of an anchor's row is the descendant
    # reached by child-bit path (e>>2, (e>>1)&1, e&1) — 16 flat
    # dependent [N] gathers. The interleaved stack/reshape doubling
    # chain this replaces compiled in ~506 s at 1M on the remote
    # backend (round-5 emit bisect, /tmp/probe_emit5) vs ~12 s for this
    # bit-identical layout (entry index bits are MSB-first in both).
    def stepb(entries, bit):
        s = jnp.clip(entries, 0, nslots - 1)
        grow = (entries >= 0) & g1(is_box, s) & g1(big, s)
        nxt = jnp.clip(g1(arena.child, s) + bit, 0, nslots - 1)
        if bit == 0:
            return jnp.where(grow, nxt, entries)
        return jnp.where(grow, nxt, -1)

    base = [jnp.where(is_box & big, c0, -1),
            jnp.where(is_box & big,
                      jnp.clip(arena.child + 1, 0, nslots - 1), -1)]
    ent = jnp.stack(
        [stepb(stepb(base[e >> 2], (e >> 1) & 1), e & 1)
         for e in range(WIDE)], axis=1)  # [N, 8]

    root0 = jnp.zeros((1,), jnp.int32)  # slot 0
    root_ent = jnp.stack(
        [stepb(stepb(stepb(root0, e >> 2), (e >> 1) & 1), e & 1)
         for e in range(WIDE)], axis=1)  # [1, 8]

    win_max = jnp.maximum(num_leaves - leaf_width, 0)

    def pack(entries):
        s = jnp.clip(entries, 0, nslots - 1)
        valid = entries >= 0
        term = valid & ~(g1(is_box, s) & g1(big, s))
        starts_s = g1(starts, s)
        win = jnp.clip(jnp.minimum(starts_s, win_max), 0, cap - 1)
        child = jnp.where(term, win, jnp.maximum(g1(wid_of_slot, s), 0))
        etype = jnp.where(term, CHILD_TRI,
                          jnp.where(valid, CHILD_BOX, CHILD_NONE))
        meta = ((child << _META_CHILD_SHIFT) | etype).astype(jnp.int32)
        meta = jnp.where(valid, meta, 0)
        f2i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa
        nmin = jnp.where(valid[..., None], g1(arena.node_min, s), _F32_MAX)
        nmax = jnp.where(valid[..., None], g1(arena.node_max, s), -_F32_MAX)
        row = jnp.concatenate(
            [f2i(nmin.astype(jnp.float32)), f2i(nmax.astype(jnp.float32)),
             meta[..., None], jnp.zeros(meta.shape + (1,), jnp.int32)],
            axis=-1)
        # Per-entry subtree (start, count) in the final leaf permutation
        # — exactly what refit_split refreshes AABBs from (count 0 =
        # empty slot keeps its NONE/inverted box).
        er = jnp.stack([jnp.where(valid, starts_s, 0),
                        jnp.where(valid, g1(counts, s), 0)], axis=-1)
        return row.reshape(row.shape[:-2] + (WIDE * 8,)), er

    icap = _split_cap(cap, leaf_width)
    # empty rows must never hit: fill via a NONE row template
    f2i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    empty_entry = jnp.concatenate([
        f2i(jnp.full((3,), _F32_MAX, jnp.float32)),
        f2i(jnp.full((3,), -_F32_MAX, jnp.float32)),
        jnp.zeros((2,), jnp.int32),
    ])
    inner = jnp.broadcast_to(
        jnp.tile(empty_entry, WIDE), (icap, WIDE * 8))

    all_rows, all_er = pack(ent)
    dest = jnp.where(anchor, 1 + rank, icap)
    inner = inner.at[dest].set(all_rows, mode="drop")
    e_ranges = jnp.zeros((icap, WIDE, 2), jnp.int32).at[dest].set(
        all_er, mode="drop")

    # Root row: slot 0's expansion; tiny scenes (root subtree fits one
    # window) synthesize a single-Tri row covering the scene.
    root_row, root_er = pack(root_ent)
    root_row, root_er = root_row[0], root_er[0]
    root_small = ~(is_box[0] & big[0])
    leaf_meta = ((jnp.clip(jnp.minimum(starts[0], win_max), 0, cap - 1)
                  << _META_CHILD_SHIFT) | CHILD_TRI).astype(jnp.int32)
    leaf_row = jnp.concatenate([
        f2i(arena.node_min[0].astype(jnp.float32)),
        f2i(arena.node_max[0].astype(jnp.float32)),
        leaf_meta[None], jnp.zeros((1,), jnp.int32),
        jnp.tile(empty_entry, WIDE - 1),
    ])
    leaf_er = jnp.zeros((WIDE, 2), jnp.int32).at[0].set(
        jnp.stack([jnp.int32(0), num_leaves]))
    inner = inner.at[0].set(jnp.where(root_small, leaf_row, root_row))
    e_ranges = e_ranges.at[0].set(jnp.where(root_small, leaf_er, root_er))

    return SplitBVH(inner=inner, num_inner=num_inner,
                    num_leaves=num_leaves, leaf_width=leaf_width,
                    e_ranges=e_ranges), packed_sorted
