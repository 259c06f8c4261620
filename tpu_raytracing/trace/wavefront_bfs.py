"""Work-efficient BFS wavefront tracer for INCOHERENT rays (pure XLA).

The packet Pallas kernel (trace/split_pallas.py) is ideal for coherent
primaries, but incoherent bounce rays pay a measured ~550 ns/pop of
serialized per-pop cost that is insensitive to leaf width, packet size,
slots-in-flight and reduction batching (benchmarks/sweep_bounce.py) —
the scalar control and the (leafw, 128) vector work do not overlap, and
a 128-ray packet of random directions shares almost no path, so every
ray pays the packet-union's pops.

This tracer removes the packet entirely: traversal is breadth-first over
PER-RAY (ray, node) visit pairs, expanded level by level with
prefix-sum compaction — the exact per-ray work the CUDA reference does,
but batched so every XLA op runs at full vector width:

* visits are (ray_id, node_id) arrays; each level gathers node rows and
  per-ray features — both gathers have LOOP-INVARIANT operands (the fast
  case on this backend, docs/TPU_NOTES.md) because the level loop is
  Python-unrolled and every level's arrays are fresh values;
* slab-tests all w entries of each visit at once, prunes against the
  ray's current-best t, then scatters surviving Box children into the
  next level's visit list and Tri children into a leaf-visit list
  (rank-within-visit prefix sums, `.at[].set(mode="drop")`);
* leaf visits Möller-Trumbore their leaf_width-pair window against
  their OWN ray only ([Vl, leafw] candidates — work-efficient, vs the
  packet kernel's leafw x 128), then scatter-min into the per-ray best
  (t first, then a winner pass with a max-tri tie rule);
* levels have static visit capacities (`caps`); overflow is detected and
  returned as a flag (the caller re-traces with a bigger factor — same
  contract as bvh/bucket.py's capacity check). Defaults hold a few x
  the average per-ray path, far above measured visit counts.

Determinism: distance ties pick the larger encoded tri id (the packet
kernel's later-slot-wins rule at global granularity).
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from tpu_raytracing.bvh.bucket import SplitBVH
from tpu_raytracing.bvh.types import CHILD_BOX, CHILD_TRI
from tpu_raytracing.ops.gather import take_cols, take_rows
from tpu_raytracing.trace.brute import HitRecord
from tpu_raytracing.trace.ray import Rays
from tpu_raytracing.trace.traverse import (
    _META_CHILD_SHIFT,
    _META_TYPE_MASK,
    PackedPairs,
    TraceStats,
)
from tpu_raytracing.trace.wide_fat import _reconstruct

_F32_MAX = float(jnp.finfo(jnp.float32).max)
_TRI_EPS = 1e-9


@flax.struct.dataclass
class BFSViews:
    """Gather-friendly node table for the BFS tracer."""

    inner_f: jnp.ndarray   # [icap, w*8] float32 view of the inner rows
    inner_i: jnp.ndarray   # same rows, int32 (metas)
    pair_rows: jnp.ndarray  # [P, 16] int32 packed pairs
    # Static: pairs per terminal window (must match the build).
    leaf_width: int = flax.struct.field(pytree_node=False, default=16)


def prep_bfs_views(split: SplitBVH, packed: PackedPairs) -> BFSViews:
    inner_f = jax.lax.bitcast_convert_type(split.inner, jnp.float32)
    return BFSViews(inner_f=inner_f, inner_i=split.inner,
                    pair_rows=packed.rows, leaf_width=split.leaf_width)


def trace_rays_bfs(
    views,
    packed: PackedPairs,
    rays: Rays,
    active=None,
    max_levels: int = None,
    cap_factor: float = 3.0,
    leaf_factor: float = 3.0,
    cap_floor: int = 65536,
    mt_chunk: int = 524288,
    any_hit: bool = False,
) -> Tuple[HitRecord, TraceStats, jnp.ndarray]:
    """Closest-hit BFS trace. Returns (HitRecord, TraceStats, overflow
    flag [] bool — True if any level's visit capacity clipped)."""
    inner_f, inner_i, pair_rows, leafw = (
        views.inner_f, views.inner_i, views.pair_rows, views.leaf_width)
    w = inner_f.shape[1] // 8
    icap = inner_f.shape[0]
    num_pairs = pair_rows.shape[0]
    R = rays.origin.shape[0]
    if max_levels is None:
        import math

        bits = w.bit_length() - 1
        max_levels = 2 + -(-30 // bits) + math.ceil(
            math.log(max(num_pairs, 2), w))

    # Packed per-ray features [R, 8]: origin, inv_dir, tmin, pad.
    # Safe inverse: a zero component would make (lo - o) * inf = NaN,
    # and XLA min/max PROPAGATE NaN (CUDA fminf ignores it) — an
    # axis-aligned ray would prune real subtrees (round-4 bug).
    _d = rays.direction
    inv = 1.0 / jnp.where(jnp.abs(_d) < 1e-30,
                          jnp.where(_d < 0, -1e-30, 1e-30), _d)
    tmin = rays.tmin
    tmax0 = rays.tmax
    if active is not None:
        tmin = jnp.where(active, tmin, _F32_MAX)
        tmax0 = jnp.where(active, tmax0, -_F32_MAX)
    rfeat = jnp.concatenate(
        [rays.origin, inv, tmin[:, None], jnp.zeros((R, 1), jnp.float32)],
        axis=1)

    t_best = tmax0
    tri_best = jnp.full((R,), -1, jnp.int32)
    overflow = jnp.zeros((), bool)
    box_tests = jnp.zeros((R,), jnp.int32)
    tri_tests = jnp.zeros((R,), jnp.int32)

    # Level 0: every (active) ray visits the root row.
    vray = jnp.arange(R, dtype=jnp.int32)
    vnode = jnp.zeros((R,), jnp.int32)
    vvalid = jnp.ones((R,), bool) if active is None else active
    # Steady-state caps are a factor of R (mid-tree visit counts are a few
    # per ray); the floor keeps small test scenes exact, where a level can
    # legitimately hold R x w visits.
    vcap_next = max(int(R * cap_factor), min(cap_floor, R * w))
    lcap = max(int(R * leaf_factor), min(cap_floor, R * w))

    def mt_chunk_pass(lray, lwin, lvalid, t_best, tri_best, tri_tests):
        """One chunk of leaf visits: [leafw, Vl] Möller-Trumbore, all
        arrays TRANSPOSED (visits on the minor axis — a [Vl, C] layout
        with small C pads the lane dim up to 16x)."""
        Vl = lray.shape[0]
        rfT = take_cols(rfeat, lray)            # [8, Vl]
        dT = take_cols(rays.direction, lray)    # [3, Vl]
        ox, oy, oz = rfT[0][None], rfT[1][None], rfT[2][None]
        dx, dy, dz = dT[0][None], dT[1][None], dT[2][None]
        tmn = rfT[6][None]
        tcur = t_best[lray][None]               # [1, Vl]
        widx = lwin[None, :] + jnp.arange(leafw, dtype=jnp.int32)[:, None]
        widxc = jnp.clip(widx, 0, num_pairs - 1)  # [leafw, Vl]
        colsT = take_cols(pair_rows, widxc.reshape(-1))  # [16, leafw*Vl]

        def comp(c):
            return jax.lax.bitcast_convert_type(
                colsT[c], jnp.float32).reshape(leafw, Vl)

        def mt(a0, a1, a2, b0, b1, b2, c0, c1, c2):
            e1x, e1y, e1z = b0 - a0, b1 - a1, b2 - a2
            e2x, e2y, e2z = c0 - a0, c1 - a1, c2 - a2
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            det = e1x * hx + e1y * hy + e1z * hz
            degen = jnp.abs(det) < _TRI_EPS
            f = 1.0 / det
            sx, sy, sz = ox - a0, oy - a1, oz - a2
            uu = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            vv = f * (dx * qx + dy * qy + dz * qz)
            tt = f * (e2x * qx + e2y * qy + e2z * qz)
            acc = (~degen & (uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0)
                   & (uu + vv <= 1.0) & (tt >= tmn) & (tt <= tcur))
            return jnp.where(acc, tt, _F32_MAX)

        v = [comp(c) for c in range(12)]
        cand_a = mt(*v[0:9])
        cand_b = mt(*(v[6:9] + v[3:6] + v[9:12]))
        cand = jnp.minimum(cand_a, cand_b)      # [leafw, Vl]
        enc = (widxc << 1) | (cand_b <= cand_a)
        tm = jnp.min(cand, axis=0)              # [Vl]
        wenc = jnp.max(jnp.where(cand == tm[None], enc, -1), axis=0)
        tm = jnp.where(lvalid, tm, _F32_MAX)

        lray_c = jnp.where(lvalid, lray, R)
        t_new = t_best.at[lray_c].min(tm, mode="drop")
        # Winner pass. Rays whose best t strictly improved this chunk
        # must DROP their stale winner before taking this chunk's max-enc
        # (a plain .max would keep an old larger enc whose t is no longer
        # best); rays that only tied keep competing under the global
        # max-enc tie rule.
        improved = t_new < t_best
        tri_base = jnp.where(improved, -1, tri_best)
        is_win = lvalid & (tm <= t_new[lray]) & (tm < _F32_MAX)
        tri_new = tri_base.at[jnp.where(is_win, lray, R)].max(
            wenc, mode="drop")
        tri_tests = tri_tests.at[lray_c].add(2 * leafw, mode="drop")
        return t_new, tri_new, tri_tests

    def mt_window(lray, lwin, lvalid, t_best, tri_best, tri_tests):
        total = lray.shape[0]
        for i in range(0, total, mt_chunk):
            j = min(i + mt_chunk, total)
            t_best, tri_best, tri_tests = mt_chunk_pass(
                lray[i:j], lwin[i:j], lvalid[i:j],
                t_best, tri_best, tri_tests)
        return t_best, tri_best, tri_tests

    for level in range(max_levels):
        V = vray.shape[0]
        vnode_c = jnp.clip(vnode, 0, icap - 1)
        vray_c = jnp.clip(vray, 0, R - 1)
        # Transposed gathers: [C, V] keeps visits on lanes (no padding).
        rowsT_f = take_cols(inner_f, vnode_c)   # [w*8, V]
        rowsT_i = take_cols(inner_i, vnode_c)
        rfT = take_cols(rfeat, vray_c)          # [8, V]
        ox, oy, oz = rfT[0][None], rfT[1][None], rfT[2][None]
        ix, iy, iz = rfT[3][None], rfT[4][None], rfT[5][None]
        tmn = rfT[6][None]
        tcur = t_best[vray_c][None]             # [1, V]

        lox, loy, loz = rowsT_f[0::8], rowsT_f[1::8], rowsT_f[2::8]  # [w, V]
        hix, hiy, hiz = rowsT_f[3::8], rowsT_f[4::8], rowsT_f[5::8]
        meta = rowsT_i[6::8]                    # [w, V]
        tx0 = (lox - ox) * ix
        ty0 = (loy - oy) * iy
        tz0 = (loz - oz) * iz
        tx1 = (hix - ox) * ix
        ty1 = (hiy - oy) * iy
        tz1 = (hiz - oz) * iz
        front = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1))
        back = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1))
        ehit = (back >= front) & (front <= tcur) & (back >= tmn) \
            & vvalid[None, :]

        etype = meta & _META_TYPE_MASK
        child = (meta >> _META_CHILD_SHIFT).astype(jnp.int32)
        box_hit = ehit & (etype == CHILD_BOX)
        tri_hit = ehit & (etype == CHILD_TRI)
        box_tests = box_tests.at[jnp.where(vvalid, vray, R)].add(
            w, mode="drop")

        # --- expand Box children into the next frontier ---
        nb = jnp.sum(box_hit.astype(jnp.int32), axis=0)      # [V]
        base = jnp.cumsum(nb) - nb
        total_next = base[-1] + nb[-1] if V > 0 else jnp.int32(0)
        cap_next = min(vcap_next, V * w)
        nvnode = jnp.zeros((cap_next,), jnp.int32)
        nvray = jnp.full((cap_next,), R, jnp.int32)
        rank = jnp.cumsum(box_hit.astype(jnp.int32), axis=0) - box_hit
        dest = jnp.where(box_hit, base[None, :] + rank, cap_next)
        dest = jnp.minimum(dest, cap_next)  # clip: overflow flagged below
        nvnode = nvnode.at[dest.reshape(-1)].set(
            child.reshape(-1), mode="drop")
        nvray = nvray.at[dest.reshape(-1)].set(
            jnp.broadcast_to(vray[None, :], dest.shape).reshape(-1),
            mode="drop")
        overflow = overflow | (total_next > cap_next)

        # --- compact Tri children into this level's leaf-visit list ---
        nt = jnp.sum(tri_hit.astype(jnp.int32), axis=0)
        lbase = jnp.cumsum(nt) - nt
        ltotal = lbase[-1] + nt[-1] if V > 0 else jnp.int32(0)
        lcap_l = min(lcap, V * w)
        lrank = jnp.cumsum(tri_hit.astype(jnp.int32), axis=0) - tri_hit
        ldest = jnp.where(tri_hit, lbase[None, :] + lrank, lcap_l)
        ldest = jnp.minimum(ldest, lcap_l)
        lwin = jnp.zeros((lcap_l,), jnp.int32)
        lray = jnp.full((lcap_l,), R, jnp.int32)
        lwin = lwin.at[ldest.reshape(-1)].set(
            child.reshape(-1), mode="drop")
        lray = lray.at[ldest.reshape(-1)].set(
            jnp.broadcast_to(vray[None, :], ldest.shape).reshape(-1),
            mode="drop")
        overflow = overflow | (ltotal > lcap_l)
        lvalid = lray < R
        lray = jnp.minimum(lray, R - 1)

        t_best, tri_best, tri_tests = mt_window(
            lray, lwin, lvalid, t_best, tri_best, tri_tests)
        if any_hit:
            # Occlusion query: a ray with any hit prunes everything that
            # remains (empty interval), so its pending visits die at the
            # next level's slab test.
            t_best = jnp.where(tri_best >= 0, -_F32_MAX, t_best)

        vray = jnp.minimum(nvray, R - 1)
        vvalid = nvray < R
        vnode = nvnode

    if any_hit:
        # Only .hit is meaningful (t_best was reused as the kill flag).
        t_best = rays.tmax
    rec = _reconstruct(packed, rays, t_best, tri_best)
    stats = TraceStats(box_tests=box_tests, tri_tests=tri_tests)
    return rec, stats, overflow


def make_bfs_tracer(views, packed, cap_factor: float = 3.0,
                    leaf_factor: float = 3.0, cap_floor: int = 65536,
                    any_hit: bool = False):
    """Drop-in tracer (trav, pairs, rays, active) -> (HitRecord, stats).

    With views=None the 4-tuple from prep_bfs_views rides in ``trav``.
    """
    def tracer(trav, pairs, rays, max_width=2, active=None):
        del max_width
        v = views if views is not None else trav
        p = packed if packed is not None else pairs
        rec, stats, _overflow = trace_rays_bfs(
            v, p, rays, active=active, cap_factor=cap_factor,
            leaf_factor=leaf_factor, cap_floor=cap_floor, any_hit=any_hit)
        return rec, stats

    tracer.host_staged = False
    return tracer
