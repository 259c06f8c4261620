"""Treelet BVH — the per-lane traversal kernel's data structure.

Round-2's flagship packet kernel pops ONE node per scalar-loop iteration
(~480-550 ns of serialized control per pop) and pays packet-union
divergence (~23x per-ray-ideal pops on incoherent rays). The round-3
redesign (trace/lane_pallas.py) gives every ray its OWN traversal on a
VPU lane: 128 rays advance one node each per iteration with zero scalar
control. The enabling fetch primitive is Mosaic's per-lane dynamic
gather (`take_along_axis(table, idx, axis=1)`), which only works within
a single 128-lane tile (benchmarks/probe_lane_machine*.py) — so the tree
is restructured into **treelets of <= 128 elements**, each a [WH, 128]
f32 table resident in VMEM while a packet traverses it.

Element columns (one per lane-gatherable table column):

* INNER — 8 entries, word-major: rows [w*8 + e] for w in 0..5 hold the
  entry boxes (lo.xyz, hi.xyz), rows 48..55 the entry metas
  (child << 5 | type; type: 1=BOX local col, 2=WINDOW local col,
  3=PORTAL global treelet id — reusing CHILD_INST's code), rest pad.
* WINDOW — ``lw`` pairs embedded word-major: rows [w*lw + p] for
  w in 0..11 hold pair p's vertex words, row 12*lw the window's global
  start position in the sorted pair array (bitcast int32; the winner's
  tri_id is (gstart + p) * 2 + second). Pairs beyond the bucket's count
  are zero rows (degenerate, never hit).

Treelet roots are Morton-prefix buckets chosen in bottom-up ROUNDS: a
round picks, top-down per path, the FIRST unassigned bucket whose
*residual* element count (unassigned inner rows + unassigned windows +
itself) fits ECAP=128 — so treelets are subtree SLICES over CONTIGUOUS
leaf ranges, and a parent treelet references a child treelet through a
PORTAL entry. One round is not enough at scale: at 1M tris the rows
above the ~3k first-round roots form an upper tree of ~800 columns, so
later rounds re-cut the residue (counting already-assigned rows and
windows as zero — portals are entries, not columns) until the top fits.
Treelet 0 is the final top residue; the traversal entry point is
(root_tid, col 0).

The classification reuses emit_split's dense leaf-major [L, n] machinery
(bvh/bucket.py:leaf_major_tables) plus two new dense quantities, both
computed with head-fill scans (no gathers): windows-under and
rows-under per (level, leaf).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from tpu_raytracing.bvh.bucket import (
    _range_lookup,
    _range_min_table,
    leaf_major_tables,
)
from tpu_raytracing.bvh.types import CHILD_BOX, CHILD_INST, CHILD_NONE, CHILD_TRI
from tpu_raytracing.ops.gather import take_rows
from tpu_raytracing.trace.traverse import _META_CHILD_SHIFT, PackedPairs

_F32_MAX = float(jnp.finfo(jnp.float32).max)
ECAP = 128          # elements per treelet (one lane tile)
INNER_WIDTH = 8     # entries per inner element


class TreeletCapacityError(RuntimeError):
    """The build overflowed one of its STATIC bounds (treelet count or
    per-treelet element budget) and dropped geometry. Distinct from
    jax.errors.JaxRuntimeError (which also subclasses RuntimeError):
    backend failures like device OOM must NOT enter capacity-retry
    handlers — BENCH_r03 died exactly that way."""

    def __init__(self, msg: str, column_overflow: bool = False):
        super().__init__(msg)
        # True when a treelet exceeded its ECAP element budget — a
        # bigger tcap cannot help, so retry loops must re-raise.
        self.column_overflow = column_overflow


@flax.struct.dataclass
class TreeletBVH:
    """See the module docstring.

    tables: [TCAP, WH, 128] f32 — element columns per treelet.
    num_treelets: [] int32 (<= TCAP or the build overflowed — checked by
    check_treelet_capacity on the host).
    root_tid: [] int32 — treelet containing the global root (col 0).
    max_col: [] int32 — largest column any element wanted (>= ECAP means
    dropped elements; host-checked).
    num_leaves: [] int32 — live sorted pairs.
    """

    tables: jnp.ndarray
    num_treelets: jnp.ndarray
    root_tid: jnp.ndarray
    max_col: jnp.ndarray
    num_leaves: jnp.ndarray
    # [n] i32: treelet id of the window holding each sorted pair — the
    # bounce-ray sort key (rays starting on a pair traverse that treelet
    # first after the shared top; grouping them reduces switch stalls).
    pair_tid: jnp.ndarray = None
    leaf_width: int = flax.struct.field(pytree_node=False, default=16)

    @property
    def wh(self) -> int:
        return self.tables.shape[1]


def table_words(leaf_width: int) -> int:
    """Column height: 12*lw pair words + 1 gstart row, rounded up to the
    8-sublane tile, with a floor of 64 for the inner layout."""
    return max(-(-(12 * leaf_width + 1) // 8) * 8, 64)


def _head_fill(x, heads, reverse=False):
    """Forward-fill x from head positions ([L, n] dense, no gathers):
    out[l, i] = x[l, j] for the nearest j <= i with heads[l, j] (or the
    nearest j > i when reverse — used for 'value at next head')."""
    big = jnp.int32(2 ** 30)
    if reverse:
        src = jnp.where(heads, x, big)
        return jax.lax.cummin(src, axis=1, reverse=True)
    src = jnp.where(heads, x, -big)
    return jax.lax.cummax(src, axis=1)


def treelet_capacity(front, leaf_width: int = 16, ecap: int = ECAP) -> int:
    """Host-sync helper: the actual treelet count of this front, for
    sizing the static TCAP of build_treelet (pad it ~1.25x + 32 so
    deformation rebuilds rarely re-instantiate)."""
    t = _classify_jit(front[0], front[5], leaf_width, ecap)
    return int(t)


def _count_treelets(sorted_codes, num_leaves, lw: int, ecap: int):
    n = sorted_codes.shape[0]
    heads, starts, nxts, counts = leaf_major_tables(
        sorted_codes, num_leaves, n, INNER_WIDTH)
    cls = _classification(heads, starts, nxts, counts, num_leaves, n, lw,
                          ecap)
    return cls["num_treelets"]


_classify_jit = jax.jit(_count_treelets, static_argnums=(2, 3))


def _under_counts(row_mask, w_mask, heads):
    """Rows-under / windows-under per (level, leaf) for the given row /
    window-start masks, gather-free: exclusive prefix sums + head fills
    — value-at-my-start gives the count strictly before the bucket,
    value-at-next-head the count strictly before its end; the difference
    is the in-range count."""
    L, n = heads.shape
    w_i = w_mask.astype(jnp.int32)
    wcum = jnp.cumsum(w_i) - w_i
    num_windows = jnp.sum(w_i)
    wcum_l = jnp.broadcast_to(wcum[None, :], (L, n))
    w_at_start = _head_fill(wcum_l, heads)
    nxt_fill = _head_fill(wcum_l, heads, reverse=True)
    w_at_end = jnp.concatenate(
        [nxt_fill[:, 1:],
         jnp.full((L, 1), 2 ** 30, jnp.int32)], axis=1)
    w_at_end = jnp.minimum(w_at_end, num_windows)
    wins_under = w_at_end - w_at_start  # [L, n]

    rm = row_mask.astype(jnp.int32)
    rc = jnp.cumsum(rm, axis=1)  # inclusive per level
    # suffix over levels STRICTLY below l (a bucket's descendant rows)
    rc_suffix = jnp.cumsum(rc[::-1], axis=0)[::-1]
    sr = jnp.concatenate([rc_suffix[1:], jnp.zeros((1, n), jnp.int32)],
                         axis=0)  # [L, n]: sum of rc[l'] for l' > l
    # exclusive form (value at position i-1): deeper rows can head AT the
    # bucket's own start leaf, which must count as inside the range
    sr_ex = jnp.concatenate(
        [jnp.zeros((L, 1), jnp.int32), sr[:, :-1]], axis=1)
    s_at_start = _head_fill(sr_ex, heads)
    s_fill = _head_fill(sr_ex, heads, reverse=True)
    s_at_end = jnp.concatenate(
        [s_fill[:, 1:], jnp.full((L, 1), 2 ** 30, jnp.int32)], axis=1)
    # At the array end the 'next head' fill saturates; clamp to the
    # global suffix totals so end-of-array buckets get exact counts.
    lvl_tot = jnp.cumsum(jnp.sum(rm, axis=1)[::-1])[::-1]
    lvl_tot = jnp.concatenate([lvl_tot[1:], jnp.zeros((1,), jnp.int32)])
    s_at_end = jnp.minimum(s_at_end, lvl_tot[:, None])
    rows_under = s_at_end - s_at_start  # [L, n], strictly deeper levels
    return rows_under, wins_under


def _classification(heads, starts, nxts, counts, num_leaves, n, lw,
                    ecap=ECAP, max_rounds=None):
    """All dense [L, n] classification shared by count/build.

    ``max_rounds`` caps the residue re-cut rounds — an APPROXIMATION:
    a window deep under a sibling-heavy subtree may only be assigned
    once later rounds shrink its ancestors' residues (measured ~1.5%
    of soup windows at ecap=16), so capped-round tids are sort-key
    quality only, never valid for the lane kernel's tables."""
    L = heads.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    live = iota < num_leaves

    small = (counts >= 1) & (counts <= lw)
    chain = jnp.concatenate(
        [counts[:-1] == counts[1:], jnp.ones((1, n), bool)], axis=0)
    branch = (counts > lw) & ~chain
    alive = jnp.cumprod(
        jnp.concatenate([jnp.ones((1, n), bool), ~small[:-1]], axis=0)
        .astype(jnp.int32), axis=0).astype(bool)
    real = alive & branch

    # window per leaf: the unique (alive & small) bucket on its root path
    wstart = jnp.any(heads & alive & small, axis=0) & live  # [n]
    rmask = heads & real & live[None, :]

    # ---- multi-round treelet cut (see module docstring) ----
    # Round count: each round absorbs residue subtrees of up to ecap
    # elements, shrinking the unassigned upper tree by well over 16x
    # (a non-fitting parent had > ecap residual elements over <= 8
    # children). log16 rounds covers any n; overflow is host-checked
    # anyway (check_treelet_capacity).
    rounds = max(1, math.ceil(math.log(max(n, 4)) / math.log(16)))
    if max_rounds is not None:
        rounds = min(rounds, max_rounds)
    false_l = jnp.zeros((L, n), bool)
    troot_tot = false_l
    tid_dense_tot = jnp.zeros((L, n), jnp.int32)  # tid where troot else 0
    base = jnp.int32(1)  # tid 0 = final top residue
    tid_cur = jnp.zeros((L, n), jnp.int32)
    for _ in range(rounds):
        # tid per (level, leaf): nearest troot ancestor-or-self, top-down
        tids = [jnp.where(troot_tot[0], tid_dense_tot[0], 0)]
        for l in range(1, L):
            tids.append(jnp.where(troot_tot[l], tid_dense_tot[l],
                                  tids[-1]))
        tid_cur = jnp.stack(tids, axis=0)  # [L, n]
        # residual (unassigned) rows and windows only; assigned subtrees
        # cost their parent a portal ENTRY, not a column
        row_un = rmask & (tid_cur == 0)
        w_un = wstart & (tid_cur[L - 1] == 0)
        rows_under, wins_under = _under_counts(row_un, w_un, heads)
        elems = rows_under + wins_under + 1
        cand = real & (tid_cur == 0) & (elems <= ecap)
        # within a round, the shallowest fitting bucket per path wins
        tavail = jnp.cumprod(
            jnp.concatenate([jnp.ones((1, n), bool), ~cand[:-1]], axis=0)
            .astype(jnp.int32), axis=0).astype(bool)
        troot_r = cand & tavail
        tmask = heads & troot_r & live[None, :]

        # treelet ids, level-major within the round, continuing `base`
        tm = tmask.astype(jnp.int32)
        per_level = jnp.sum(tm, axis=1)
        offs = base + jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(per_level)[:-1]])
        tid_r = offs[:, None] + jnp.cumsum(tm, axis=1) - 1  # at heads
        tid_r = _head_fill(jnp.where(tmask, tid_r, 0), heads)
        troot_tot = troot_tot | troot_r
        tid_dense_tot = jnp.where(troot_r, tid_r, tid_dense_tot)
        base = base + jnp.sum(tm)

    # final tid per (level, leaf) including the last round's roots
    tids = [jnp.where(troot_tot[0], tid_dense_tot[0], 0)]
    for l in range(1, L):
        tids.append(jnp.where(troot_tot[l], tid_dense_tot[l], tids[-1]))
    tid_cur = jnp.stack(tids, axis=0)

    return dict(L=L, live=live, small=small, chain=chain, branch=branch,
                alive=alive, real=real, wstart=wstart, rmask=rmask,
                troot=troot_tot, tid_cur=tid_cur, num_treelets=base)


def build_treelet(
    front, tcap: int, leaf_width: int = 16, ecap: int = ECAP,
) -> Tuple[TreeletBVH, PackedPairs]:
    """Build the TreeletBVH from a split_front result.

    ``tcap`` is the static treelet capacity — size it from
    treelet_capacity(front) (frame-0 host sync) with ~1.25x headroom;
    check_treelet_capacity validates every later rebuild. ``ecap``
    (elements per treelet) is 128 for the lane kernel — tests pass a
    small value to force the multi-round cut at tiny scene sizes.
    """
    lw = leaf_width
    assert lw >= INNER_WIDTH
    wh = table_words(lw)
    (sorted_codes, packed, lo, hi, _cc, num_leaves) = front
    n = sorted_codes.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    live = iota < num_leaves
    packed = PackedPairs(rows=jnp.where(live[:, None], packed.rows, 0))

    heads, starts, nxts, counts = leaf_major_tables(
        sorted_codes, num_leaves, n, INNER_WIDTH)
    cls = _classification(heads, starts, nxts, counts, num_leaves, n, lw,
                          ecap)
    L = cls["L"]
    small, branch, alive, real = (cls["small"], cls["branch"],
                                  cls["alive"], cls["real"])
    wstart, rmask, troot, tid_cur = (cls["wstart"], cls["rmask"],
                                     cls["troot"], cls["tid_cur"])
    num_treelets = cls["num_treelets"]

    # ---- compacted row list (level-major) ----
    rcap = max(n // (2 * lw) * 4, 256) + 64
    rflat = rmask.reshape(-1)
    (ridx,) = jnp.nonzero(rflat, size=rcap, fill_value=rflat.shape[0])
    r_valid = ridx < rflat.shape[0]
    ridx_c = jnp.minimum(ridx, rflat.shape[0] - 1)
    r_l = ridx_c // n
    r_i = ridx_c % n
    r_tid = jnp.where(r_valid, tid_cur.reshape(-1)[ridx_c], tcap)
    # local col: rows are level-major; within a treelet the root row is
    # the shallowest so it ranks 0. Sort by tid (stable keeps order).
    order = jnp.argsort(r_tid, stable=True)
    inv_order = jnp.argsort(order)
    tid_sorted = r_tid[order]
    eidx = jnp.arange(rcap, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), tid_sorted[:-1]])
    run_start = jax.lax.cummax(jnp.where(tid_sorted != prev, eidx, -1))
    col_sorted = eidx - run_start
    r_col = col_sorted[inv_order]  # [rcap] local col per compacted row

    # rows-per-treelet (for window col offsets): windows come after rows.
    rows_of_tid = jnp.zeros((tcap + 1,), jnp.int32).at[
        jnp.minimum(r_tid, tcap)].add(r_valid.astype(jnp.int32))

    # dense row rank (level-major, matches compaction order) for eff tags
    rc_excl = jnp.cumsum(rmask.astype(jnp.int32), axis=1) - rmask.astype(
        jnp.int32)
    lvl_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(jnp.sum(rmask.astype(jnp.int32), axis=1))[:-1]])
    rank_dense = lvl_off[:, None] + rc_excl + rmask.astype(jnp.int32) - 1
    rank_dense = _head_fill(jnp.where(rmask, rank_dense, 0), heads)

    # window index per (level, leaf): exclusive wstart-count at bucket
    # start (window buckets only have their own wstart at their head)
    wcum_ex = jnp.cumsum(wstart.astype(jnp.int32)) - wstart.astype(jnp.int32)
    widx_dense = _head_fill(
        jnp.broadcast_to(wcum_ex[None, :], (L, n)), heads)

    # ---- effective targets, bottom-up (chains skipped) ----
    # tag = idx << 1 | is_window
    win_tag = (widx_dense << 1) | 1
    row_tag = rank_dense << 1
    eff = win_tag[L - 1]
    effs = [None] * L
    effs[L - 1] = eff
    for l in range(L - 2, -1, -1):
        eff = jnp.where(small[l], win_tag[l],
                        jnp.where(real[l], row_tag[l], eff))
        effs[l] = eff
    effs = jnp.stack(effs, axis=0)

    # ---- compacted window list (leaf order == widx order) ----
    wcap = max(n, 256)
    (widx_pos,) = jnp.nonzero(wstart, size=wcap, fill_value=n)
    w_valid = widx_pos < n
    w_pos = jnp.minimum(widx_pos, n - 1)
    # window's level: the unique alive&small level at its start leaf
    w_lvl = jnp.argmax((heads & alive & small)[:, :].astype(jnp.int32)
                       [:, :], axis=0)[w_pos]
    w_tid = jnp.where(w_valid, tid_cur[w_lvl, w_pos], tcap)
    w_count = jnp.where(w_valid, counts[w_lvl, w_pos], 0)
    w_col = rows_of_tid[jnp.minimum(w_tid, tcap)]
    # rank within tid among windows: windows are NOT tid-grouped in leaf
    # order (top-residue windows interleave) — sort by tid.
    worder = jnp.argsort(w_tid, stable=True)
    winv = jnp.argsort(worder)
    wt_sorted = w_tid[worder]
    wprev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), wt_sorted[:-1]])
    wrun = jax.lax.cummax(
        jnp.where(wt_sorted != wprev, jnp.arange(wcap, dtype=jnp.int32), -1))
    wrank = jnp.arange(wcap, dtype=jnp.int32) - wrun
    w_col = w_col + wrank[winv]  # rows first, then windows

    # ---- compacted entry list (same recipe as emit_split) ----
    emask = heads[1:] & (alive[:-1] & branch[:-1]) & live[None, :]
    elcap = min(rcap * INNER_WIDTH, (L - 1) * n)  # entry-list capacity
    eflat = emask.reshape(-1)
    (eidx2,) = jnp.nonzero(eflat, size=elcap, fill_value=eflat.shape[0])
    e_valid = eidx2 < eflat.shape[0]
    ei = jnp.minimum(eidx2, eflat.shape[0] - 1)
    gidx = ei + n  # into [L, n] (emask dropped level 0)
    e_start = starts.reshape(-1)[gidx]
    e_count = counts.reshape(-1)[gidx]
    e_eff = effs.reshape(-1)[gidx]
    par_rank = rank_dense.reshape(-1)[gidx - n]
    par_tid = tid_cur.reshape(-1)[gidx - n]
    # slot within the parent row: consecutive entries share the parent
    eidx3 = jnp.arange(elcap, dtype=jnp.int32)
    eprev = jnp.concatenate([jnp.full((1,), -2, jnp.int32), par_rank[:-1]])
    erun = jax.lax.cummax(jnp.where(par_rank != eprev, eidx3, -1))
    e_j = eidx3 - erun

    # resolve entry targets
    is_win = (e_eff & 1) == 1
    tgt = e_eff >> 1
    tgt_w = jnp.minimum(tgt, wcap - 1)
    tgt_r = jnp.minimum(tgt, rcap - 1)
    # target row's tid/col via the compacted row arrays (rank == index
    # into the compacted level-major list by construction)
    trow_tid = r_tid[tgt_r]
    trow_col = r_col[tgt_r]
    twin_col = w_col[tgt_w]
    portal = ~is_win & (trow_tid != par_tid)
    child = jnp.where(is_win, twin_col,
                      jnp.where(portal, trow_tid, trow_col))
    etype = jnp.where(is_win, CHILD_TRI,
                      jnp.where(portal, CHILD_INST, CHILD_BOX))
    meta = ((child << _META_CHILD_SHIFT) | etype).astype(jnp.int32)
    meta = jnp.where(e_valid, meta, CHILD_NONE)

    # entry AABBs
    v = jax.lax.bitcast_convert_type(
        packed.rows[:, :12], jnp.float32).reshape(-1, 4, 3)
    leaf_lo = jnp.min(v, axis=1)
    leaf_hi = jnp.max(v, axis=1)
    e_lo, e_hi = _range_lookup(_range_min_table(leaf_lo, leaf_hi),
                               e_start, e_count)

    # ---- assemble inner columns: [rcap, wh] scattered by entries ----
    f2i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa
    # scatter entry words into a [rcap, 64] word grid laid out w-major
    inner_cols = jnp.zeros((rcap + 1, 64), jnp.int32)
    # empty entries must never hit: initialize boxes inverted
    init_box = jnp.concatenate([
        jnp.tile(f2i(jnp.full((1,), _F32_MAX, jnp.float32)), (24,)),
        jnp.tile(f2i(jnp.full((1,), -_F32_MAX, jnp.float32)), (24,)),
        jnp.zeros((16,), jnp.int32),
    ])
    inner_cols = jnp.broadcast_to(init_box, (rcap + 1, 64))
    ok_e = e_valid & (e_j >= 0) & (e_j < INNER_WIDTH)
    dest_row = jnp.where(ok_e, jnp.minimum(par_rank, rcap), rcap)
    # per-word scatters (8 words x one [elcap] scatter each)
    words_e = [f2i(e_lo[:, 0]), f2i(e_lo[:, 1]), f2i(e_lo[:, 2]),
               f2i(e_hi[:, 0]), f2i(e_hi[:, 1]), f2i(e_hi[:, 2]),
               meta, jnp.zeros((elcap,), jnp.int32)]
    for w in range(7):
        inner_cols = inner_cols.at[dest_row, w * 8 + e_j].set(
            words_e[w], mode="drop")
    max_col = jnp.max(jnp.where(r_valid, r_col, 0))

    # ---- window columns: [wcap_used, 12*lw + 1] ----
    # gather the window's lw pair rows (word-major transpose)
    wrows = take_rows(
        packed.rows,
        jnp.minimum(w_pos[:, None] + jnp.arange(lw)[None, :], n - 1)
        .reshape(-1)).reshape(wcap, lw, 16)
    in_w = jnp.arange(lw)[None, :] < w_count[:, None]
    wrows = jnp.where(in_w[:, :, None], wrows, 0)
    wcols = wrows[:, :, :12].transpose(0, 2, 1).reshape(wcap, 12 * lw)
    wcols = jnp.concatenate([wcols, w_pos[:, None]], axis=1)
    max_col = jnp.maximum(max_col, jnp.max(jnp.where(w_valid, w_col, 0)))

    # ---- scatter columns into the [tcap * ecap, wh] table ----
    table = jnp.zeros((tcap * ecap + 1, wh), jnp.int32)
    # inner first: pad the 64-word columns to wh
    dest_i = jnp.where(r_valid & (r_col < ecap),
                       jnp.minimum(r_tid, tcap - 1) * ecap + r_col,
                       tcap * ecap)
    table = table.at[dest_i].set(
        jnp.pad(inner_cols[:rcap], ((0, 0), (0, wh - 64))), mode="drop")
    dest_w = jnp.where(w_valid & (w_col < ecap),
                       jnp.minimum(w_tid, tcap - 1) * ecap + w_col,
                       tcap * ecap)
    table = table.at[dest_w].set(
        jnp.pad(wcols, ((0, 0), (0, wh - 12 * lw - 1))), mode="drop")

    tables = jax.lax.bitcast_convert_type(
        table[:tcap * ecap].reshape(tcap, ecap, wh), jnp.float32
    ).transpose(0, 2, 1)  # [tcap, wh, ecap]

    # ---- root ----
    # The global root: level-0 bucket. If it is a window (tiny scene),
    # synthesize a single-entry inner column at (tid 0, col 0).
    root_eff = effs[0, 0]
    root_is_win = (root_eff & 1) == 1
    root_tid = jnp.where(root_is_win, 0, tid_cur[0, 0])
    smin = jnp.stack([jnp.min(leaf_lo[:, c], where=live, initial=_F32_MAX)
                      for c in range(3)])
    smax = jnp.stack([jnp.max(leaf_hi[:, c], where=live, initial=-_F32_MAX)
                      for c in range(3)])
    # tiny-scene column: entry 0 = WINDOW(col 1); window goes to col 1
    tiny_col = jnp.broadcast_to(init_box, (64,))
    tiny_meta = jnp.int32((1 << _META_CHILD_SHIFT) | CHILD_TRI)
    tiny_col = tiny_col.at[0 * 8].set(f2i(smin[0]))
    tiny_col = tiny_col.at[1 * 8].set(f2i(smin[1]))
    tiny_col = tiny_col.at[2 * 8].set(f2i(smin[2]))
    tiny_col = tiny_col.at[3 * 8].set(f2i(smax[0]))
    tiny_col = tiny_col.at[4 * 8].set(f2i(smax[1]))
    tiny_col = tiny_col.at[5 * 8].set(f2i(smax[2]))
    tiny_col = tiny_col.at[6 * 8].set(tiny_meta)
    tiny_if = jax.lax.bitcast_convert_type(
        jnp.pad(tiny_col, (0, wh - 64)), jnp.float32)
    # the root window's column (tiny scenes have exactly one window)
    tiny_win = jax.lax.bitcast_convert_type(wcols[0], jnp.float32)
    tiny_win = jnp.pad(tiny_win, (0, wh - tiny_win.shape[0]))
    tables = jnp.where(
        root_is_win,
        tables.at[0, :, 0].set(tiny_if).at[0, :, 1].set(tiny_win),
        tables)

    # pair -> owning window's treelet id (windows tile the live pair
    # range contiguously in leaf order): nearest window start at-or-
    # before each pair, then the tid scattered at that start.
    seg = jax.lax.cummax(jnp.where(wstart, iota, -1))
    tid_at = jnp.zeros((n + 1,), jnp.int32).at[
        jnp.where(w_valid, w_pos, n)].set(
        jnp.where(w_valid, w_tid, 0).astype(jnp.int32), mode="drop")
    pair_tid = tid_at[jnp.maximum(seg, 0)]

    tb = TreeletBVH(tables=tables,
                    num_treelets=num_treelets,
                    root_tid=root_tid.astype(jnp.int32),
                    max_col=max_col,
                    num_leaves=num_leaves,
                    pair_tid=pair_tid,
                    leaf_width=lw)
    return tb, packed


def build_pair_tid(front, leaf_width: int = 16, ecap: int = ECAP):
    """[n] int32 pair -> treelet id, WITHOUT building the tables.

    The 'tid' bounce sort (trace/pathtrace.py sort_kind='tid') only
    needs this mapping — deriving it from the classification alone
    skips the ~0.5 GB table assembly + scatters, so the SPLIT kernel
    can ride the measured 2518 -> 1393 ms bounce-sort win (docs/
    TPU_NOTES.md "Lane kernel on hardware") with no treelet build.
    Matches TreeletBVH.pair_tid exactly (same classification).
    """
    (sorted_codes, _packed, _lo, _hi, _cc, num_leaves) = front
    n = sorted_codes.shape[0]
    heads, starts, nxts, counts = leaf_major_tables(
        sorted_codes, num_leaves, n, INNER_WIDTH)
    cls = _classification(heads, starts, nxts, counts, num_leaves, n,
                          leaf_width, ecap)
    wstart, tid_cur = cls["wstart"], cls["tid_cur"]
    iota = jnp.arange(n, dtype=jnp.int32)
    # tid of each window at its start leaf: the unique alive&small level
    w_lvl = jnp.argmax((heads & cls["alive"] & cls["small"])
                       .astype(jnp.int32), axis=0)  # [n]
    wtid_dense = jnp.take_along_axis(tid_cur, w_lvl[None, :], axis=0)[0]
    # windows tile the live pair range contiguously in leaf order:
    # nearest window start at-or-before each pair
    seg = jax.lax.cummax(jnp.where(wstart, iota, -1))
    return jnp.where(seg >= 0, wtid_dense[jnp.maximum(seg, 0)], 0)


_BUILD_JIT_CACHE = {}


def build_treelet_auto(front, leaf_width: int = 16,
                       pairs_per_treelet: int = 140,
                       headroom: int = 64) -> Tuple["TreeletBVH", object]:
    """Production build entry: size tcap from the live pair count
    instead of the exact-capacity classification sync (which costs a
    full extra classification compile — measured ~9 min cold at 1M).

    The estimate (~140 pairs/treelet measured on 1M terrain: 2912
    treelets for ~520k pairs, with 1.3x margin) is validated by
    check_treelet_capacity and doubled on overflow — one extra build is
    still far cheaper than the sync.
    """
    num_leaves = int(front[5])  # host fetch; frame-0 style sync
    tcap = max(num_leaves // pairs_per_treelet + headroom, 64)
    last = None
    for _ in range(3):
        key = (tcap, leaf_width)
        fn = _BUILD_JIT_CACHE.get(key)
        if fn is None:
            fn = jax.jit(lambda f, t=tcap, lw=leaf_width: build_treelet(
                f, t, leaf_width=lw))
            _BUILD_JIT_CACHE[key] = fn
        tb, packed = fn(front)
        # Backend errors (JaxRuntimeError, e.g. device OOM on the fetch)
        # propagate untouched — only the dedicated capacity type retries,
        # and the handler touches no device arrays (the overflow kind
        # rides on the exception object).
        try:
            check_treelet_capacity(tb)
            return tb, packed
        except TreeletCapacityError as e:
            last = e
            if e.column_overflow:
                raise  # element overflow — a bigger tcap cannot help
            tcap *= 2
    raise last


def check_treelet_capacity(tb: TreeletBVH) -> None:
    """Host-fetch guard: raise TreeletCapacityError if the build
    overflowed its static bounds (dropped elements would silently lose
    geometry). Call at frame 0 and after guard-triggered rebuilds. The
    device fetches happen BEFORE any raise, so a backend failure
    surfaces as itself (JaxRuntimeError), never as a capacity error."""
    nt = int(tb.num_treelets)
    mc = int(tb.max_col)
    tcap = tb.tables.shape[0]
    ecap = tb.tables.shape[2]
    # tcap overflow first: overflowed tids clamp into the last column
    # bin, so a too-small tcap can ALSO present as a (spurious) column
    # overflow — the retryable condition must win.
    if nt > tcap:
        raise TreeletCapacityError(
            f"TreeletBVH overflow: {nt} treelets > static capacity "
            f"{tcap}; rebuild with a larger tcap "
            f"(bvh/treelet.py:build_treelet)")
    if mc >= ecap:
        raise TreeletCapacityError(
            f"TreeletBVH column overflow: an element wanted col {mc} >= "
            f"{ecap} — a treelet exceeded its element budget; geometry "
            f"was dropped", column_overflow=True)


# ---------------------------------------------------------------------
# Pure-NumPy reference walker: validates the STRUCTURE independently of
# the Pallas kernel (tests use it against brute force, then the kernel
# against it).


def reference_walk(tb: TreeletBVH, rays_o, rays_d, tmin, tmax):
    """Closest-hit over the treelet structure with a host DFS.

    Returns (t, tri_id) arrays; tri_id -1 = miss. Slow — tests only.
    """
    import numpy as np

    tables = np.asarray(tb.tables)  # [T, WH, 128]
    tables_i = tables.view(np.int32)
    lw = tb.leaf_width
    root_tid = int(tb.root_tid)
    nrays = rays_o.shape[0]
    out_t = np.asarray(tmax, dtype=np.float32).copy()
    out_tri = np.full((nrays,), -1, np.int64)

    def slab(o, inv, lo, hi, tmn, tmx):
        t0 = (lo - o) * inv
        t1 = (hi - o) * inv
        near = np.minimum(t0, t1).max()
        far = np.maximum(t0, t1).min()
        return (far >= near) and (near <= tmx) and (far >= tmn), max(near, 0.0)

    for r in range(nrays):
        o = np.asarray(rays_o[r], np.float64)
        d = np.asarray(rays_d[r], np.float64)
        inv = 1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d)
        tmn = float(tmin[r])
        stack = [(root_tid, 0, 0)]  # (tid, col, kind 0=inner 1=window)
        while stack:
            tid, col, kind = stack.pop()
            tab = tables[tid]
            tab_i = tables_i[tid]
            if kind == 1:  # window
                gstart = int(tab_i[12 * lw, col])
                for p in range(lw):
                    v = [tab[w * lw + p, col] for w in range(12)]
                    for second in (0, 1):
                        if second:
                            a = np.array(v[6:9], np.float64)
                            b = np.array(v[3:6], np.float64)
                            c = np.array(v[9:12], np.float64)
                        else:
                            a = np.array(v[0:3], np.float64)
                            b = np.array(v[3:6], np.float64)
                            c = np.array(v[6:9], np.float64)
                        e1 = b - a
                        e2 = c - a
                        h = np.cross(d, e2)
                        det = np.dot(e1, h)
                        if abs(det) < 1e-9:
                            continue
                        f = 1.0 / det
                        sv = o - a
                        u = f * np.dot(sv, h)
                        q = np.cross(sv, e1)
                        vv = f * np.dot(d, q)
                        t = f * np.dot(e2, q)
                        if (0 <= u <= 1 and vv >= 0 and u + vv <= 1
                                and tmn <= t <= out_t[r]):
                            out_t[r] = t
                            out_tri[r] = (gstart + p) * 2 + second
                continue
            # inner: visit entries near-first (higher id wins ties)
            cand = []
            for e in range(INNER_WIDTH):
                meta = int(tab_i[48 + e, col])
                etype = meta & 3
                if etype == 0:
                    continue
                lo3 = np.array([tab[w * 8 + e, col] for w in range(3)],
                               np.float64)
                hi3 = np.array([tab[w * 8 + e, col] for w in range(3, 6)],
                               np.float64)
                hit, near = slab(o, inv, lo3, hi3, tmn, out_t[r])
                if hit:
                    cand.append((near, -e, meta, etype))
            # push far-to-near so nearest pops first
            for near, nege, meta, etype in sorted(cand, reverse=True):
                child = meta >> _META_CHILD_SHIFT
                if etype == CHILD_TRI:
                    stack.append((tid, child, 1))
                elif etype == CHILD_BOX:
                    stack.append((tid, child, 0))
                else:  # portal
                    stack.append((child, 0, 0))
    return out_t, out_tri
