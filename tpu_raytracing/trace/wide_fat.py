"""Fat wide-packet traversal — flagship TPU tracer.

Three backend-specific design rules shape this tracer, each measured on real
hardware (see SURVEY.md §7's hard parts):

* **One row gather per pop**: the 8-wide node row carries its Tri entries'
  pair geometry inline (bvh/wide.py FatWideBVH) — gather count per step,
  not gather size, is what costs on this backend.
* **Shift-register stack**: D int32 registers of [P] (top = register 0);
  pushes/pops are static-index selects. Dynamic take_along_axis/scatter on
  a carried [P, 64] stack costs ~0.14 ms per step.
* **Phased packet compaction**: a lockstep while_loop pays for every packet
  until the slowest drains (measured 7.3x over the sum of per-packet trips
  on the 1M terrain bench). ``trace_rays_wide_fat_phased`` runs the loop in
  host-staged phases: when the active-packet count falls below the next
  threshold, still-active packets (stack registers + per-ray state + ray
  data) are compacted to a fraction-sized array and traversal resumes there,
  so per-step cost tracks the active count. Stages are jitted per shape and
  reused across frames (one inlined copy of the loop per stage keeps each
  compile small — several copies in one jit overflow the remote-compile
  payload).

Ordering matches the wide tracer: Box children sorted by packet-min entry
distance (higher-id tie-break, src/Tracer.cu:346-347 at packet granularity)
and pushed far-to-near. A push beyond D drops the farthest pending subtree
(D = 48 covers the expected case by a wide margin).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_raytracing.bvh.types import CHILD_BOX, CHILD_NONE, CHILD_TRI
from tpu_raytracing.bvh.wide import WIDE, FatWideBVH
from tpu_raytracing.ops.gather import take_rows
from tpu_raytracing.trace.brute import HitRecord
from tpu_raytracing.trace.ray import Rays
from tpu_raytracing.trace.traverse import (
    _META_CHILD_SHIFT,
    _META_COUNT_MASK,
    _META_COUNT_SHIFT,
    _META_TYPE_MASK,
    PackedPairs,
    TraceStats,
)
from tpu_raytracing.trace.wide_packet import _NETWORK

_F32_MAX = float(jnp.finfo(jnp.float32).max)
_NEG = -float(jnp.finfo(jnp.float32).max)
STACK_REGS = 48
# Möller-Trumbore epsilon (src/Tracer.cu:260).
_TRI_EPS = 1e-9


def _make_body(rows, rd, with_trips=False):
    """Traversal while_loop body over packet state.

    ``rows`` is the [W, 192] fat node array (loop-invariant — gathers from
    it are fast); ``rd`` the per-packet ray data dict.
    """
    num_nodes = rows.shape[0]
    origin, direction = rd["origin"], rd["direction"]
    inv_dir, tmin, ray_on = rd["inv_dir"], rd["tmin"], rd["ray_on"]

    def body(s):
        regs = s["regs"]
        wid = regs[0]
        active_p = wid >= 0
        regs = tuple(
            jnp.where(active_p, regs[i + 1] if i + 1 < STACK_REGS else -1, regs[i])
            for i in range(STACK_REGS)
        )

        # Flat fat row: [64 node words][entry e's 16 pair words at 64+16e].
        row = rows[jnp.clip(wid, 0, num_nodes - 1)]  # [P, 192]
        tmax = s["tmax"]
        tri_id = s["tri_id"]
        box_tests, tri_tests = s["box_tests"], s["tri_tests"]

        cand_dist = []
        cand_id = []

        def i2f3(cols):
            return jax.lax.bitcast_convert_type(cols, jnp.float32)

        for e in range(WIDE):
            node = row[:, e * 8 : e * 8 + 8]
            pair = row[:, 64 + e * 16 : 64 + e * 16 + 16]
            meta = node[:, 6]
            ntype = meta & _META_TYPE_MASK
            child = meta >> _META_CHILD_SHIFT
            ccount = (meta >> _META_COUNT_SHIFT) & _META_COUNT_MASK
            valid = active_p & (ntype != CHILD_NONE)

            # --- slab test (src/Tracer.cu:187-200) ---
            nmin = i2f3(node[:, 0:3])[:, None, :]
            nmax = i2f3(node[:, 3:6])[:, None, :]
            t1 = (nmin - origin) * inv_dir
            t2 = (nmax - origin) * inv_dir
            front = jnp.max(jnp.minimum(t1, t2), axis=-1)
            back = jnp.min(jnp.maximum(t1, t2), axis=-1)
            box_hit = (back >= front) & (front <= tmax) & (back >= tmin)
            box_hit = box_hit & ray_on & valid[:, None]
            box_tests = box_tests + valid[:, None].astype(jnp.int32)
            any_hit = jnp.any(box_hit, axis=1)

            # --- leaf: both pair triangles, component-unrolled MT ---
            do_leaf = any_hit & (ntype == CHILD_TRI)
            v0 = i2f3(pair[:, 0:3])[:, None, :]
            v1 = i2f3(pair[:, 3:6])[:, None, :]
            v2 = i2f3(pair[:, 6:9])[:, None, :]
            v3 = i2f3(pair[:, 9:12])[:, None, :]
            tri_tests = tri_tests + do_leaf[:, None].astype(jnp.int32)

            def mt(a, b, c):
                """Möller-Trumbore (src/Tracer.cu:256-291)."""
                e1 = b - a
                e2 = c - a
                h = jnp.cross(direction, e2)
                det = jnp.sum(e1 * h, axis=-1)
                degen = (det > -_TRI_EPS) & (det < _TRI_EPS)
                f = 1.0 / det
                sv = origin - a
                u = f * jnp.sum(sv * h, axis=-1)
                q = jnp.cross(sv, e1)
                v = f * jnp.sum(direction * q, axis=-1)
                t = f * jnp.sum(e2 * q, axis=-1)
                acc = (
                    ~degen
                    & (u >= 0.0)
                    & (u <= 1.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t >= tmin)
                    & (t <= tmax)
                )
                return acc, t, u, v

            acc_a, t_a, _u_a, _v_a = mt(v0, v1, v2)
            take = do_leaf[:, None] & box_hit & acc_a
            tmax = jnp.where(take, t_a, tmax)
            tri_id = jnp.where(take, (child << 1)[:, None], tri_id)

            acc_b, t_b, _u_b, _v_b = mt(v2, v1, v3)
            take = do_leaf[:, None] & box_hit & (ccount > 0)[:, None] & acc_b
            tmax = jnp.where(take, t_b, tmax)
            tri_id = jnp.where(take, ((child << 1) + 1)[:, None], tri_id)

            do_box = any_hit & (ntype == CHILD_BOX)
            dist_p = jnp.min(jnp.where(box_hit, front, _F32_MAX), axis=1)
            cand_dist.append(jnp.where(do_box, dist_p, _NEG))
            cand_id.append(jnp.where(do_box, child, -1))

        # Distance sort (descending; ties -> higher id nearer).
        d = list(cand_dist)
        c = list(cand_id)
        for a, b in _NETWORK:
            swap = (d[a] < d[b]) | ((d[a] == d[b]) & (c[a] > c[b]))
            da = jnp.where(swap, d[b], d[a])
            db = jnp.where(swap, d[a], d[b])
            ca = jnp.where(swap, c[b], c[a])
            cb = jnp.where(swap, c[a], c[b])
            d[a], d[b], c[a], c[b] = da, db, ca, cb

        # Far-to-near pushes: shift down + insert at the top.
        for e in range(WIDE):
            mask = c[e] >= 0
            shifted = (c[e],) + regs[:-1]
            regs = tuple(
                jnp.where(mask, shifted[i], regs[i]) for i in range(STACK_REGS)
            )

        new_s = dict(
            regs=regs,
            tmax=tmax,
            tri_id=tri_id,
            box_tests=box_tests,
            tri_tests=tri_tests,
        )
        if with_trips:
            new_s["trips"] = s["trips"] + active_p.astype(jnp.int32)
        return new_s

    return body


def _ray_data(rays: Rays, active, num_p: int, k: int):
    origin = rays.origin.reshape(num_p, k, 3)
    direction = rays.direction.reshape(num_p, k, 3)
    return dict(
        origin=origin,
        direction=direction,
        # hoisted out of the traversal loop; safe inverse (0 * inf = NaN
        # and XLA min/max propagate it, unlike CUDA fminf)
        inv_dir=1.0 / jnp.where(jnp.abs(direction) < 1e-30,
                                jnp.where(direction < 0, -1e-30, 1e-30),
                                direction),
        tmin=rays.tmin.reshape(num_p, k),
        ray_on=(
            jnp.ones((num_p, k), bool) if active is None else active.reshape(num_p, k)
        ),
    )


def _init_state(rd, tmax0, num_p: int, k: int, with_trips=False):
    top0 = jnp.where(jnp.any(rd["ray_on"], axis=1), 0, -1).astype(jnp.int32)
    regs0 = (top0,) + tuple(
        jnp.full((num_p,), -1, jnp.int32) for _ in range(STACK_REGS - 1)
    )
    # Lean while-loop carry: every carried [P, K] array is rewritten each
    # step (HBM traffic dominates deep traversals), so only tmax and the
    # winning tri_id ride in the loop; hit/prim/barycentrics are
    # reconstructed from the winner after the loop, and the box/tri-test
    # counters are per packet (kept for the heat-map modes).
    state = dict(
        regs=regs0,
        tmax=tmax0.reshape(num_p, k),
        tri_id=jnp.full((num_p, k), -1, jnp.int32),
        box_tests=jnp.zeros((num_p, 1), jnp.int32),
        tri_tests=jnp.zeros((num_p, 1), jnp.int32),
    )
    if with_trips:
        state["trips"] = jnp.zeros((num_p,), jnp.int32)
    return state


def _reconstruct(pairs: PackedPairs, rays: Rays, t_flat, tri_flat) -> HitRecord:
    """Full hit record from the winning tri_id: one pair gather plus one
    Möller-Trumbore per ray, outside the loop."""
    hit_flat = tri_flat >= 0
    second = (tri_flat & 1).astype(bool)
    num_pairs = pairs.rows.shape[0]
    prow = take_rows(pairs.rows, jnp.clip(tri_flat >> 1, 0, num_pairs - 1))
    i2f = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)  # noqa: E731
    v0 = i2f(prow[:, 0:3])
    v1 = i2f(prow[:, 3:6])
    v2 = i2f(prow[:, 6:9])
    v3 = i2f(prow[:, 9:12])
    a = jnp.where(second[:, None], v2, v0)
    c = jnp.where(second[:, None], v3, v2)
    e1 = v1 - a
    e2 = c - a
    h = jnp.cross(rays.direction, e2)
    det = jnp.sum(e1 * h, axis=-1)
    f = 1.0 / det
    sv = rays.origin - a
    bu = f * jnp.sum(sv * h, axis=-1)
    q = jnp.cross(sv, e1)
    bv = f * jnp.sum(rays.direction * q, axis=-1)
    prim = jnp.where(second, prow[:, 13], prow[:, 12])

    return HitRecord(
        hit=hit_flat,
        t=jnp.where(hit_flat, t_flat, rays.tmax),
        prim_id=jnp.where(hit_flat, prim, 0),
        tri_id=jnp.where(hit_flat, tri_flat, 0),
        bary_u=jnp.where(hit_flat, bu, 0.0),
        bary_v=jnp.where(hit_flat, bv, 0.0),
    )


def trace_rays_wide_fat(
    wide: FatWideBVH,
    pairs: PackedPairs,
    rays: Rays,
    active=None,
    packet_size: int = 128,
    with_trips: bool = False,
) -> Tuple[HitRecord, TraceStats]:
    """Closest-hit trace of packets against the fat wide BVH (root = 0).

    Single lockstep while_loop — jittable as one program (used by the
    sharded renderer and the dry run). ``trace_rays_wide_fat_phased`` is the
    faster host-staged variant for big ray batches.
    """
    num_rays = rays.origin.shape[0]
    assert num_rays % packet_size == 0
    num_p = num_rays // packet_size
    k = packet_size

    rd = _ray_data(rays, active, num_p, k)
    state = _init_state(rd, rays.tmax, num_p, k, with_trips=with_trips)

    def cond(s):
        return jnp.any(s["regs"][0] >= 0)

    out = jax.lax.while_loop(cond, _make_body(wide.rows, rd, with_trips), state)

    rec = _reconstruct(
        pairs, rays, out["tmax"].reshape(num_rays), out["tri_id"].reshape(num_rays)
    )
    bt = jnp.broadcast_to(out["box_tests"], (num_p, k)).reshape(num_rays)
    tt = jnp.broadcast_to(out["tri_tests"], (num_p, k)).reshape(num_rays)
    stats = TraceStats(box_tests=bt, tri_tests=tt)
    if with_trips:
        return rec, stats, out["trips"]
    return rec, stats


# --- phased variant: host-staged loop with packet compaction ---


@partial(jax.jit, static_argnames=("stop_count", "reps"))
def _run_phase(rows, rd, state, stop_count: int, reps: int = 1):
    """Run the traversal loop until <= stop_count packets stay active.

    ``reps`` pops per while-step: at small compacted sizes the per-step cost
    is dominated by fixed per-op overhead, not width, so the tail phases run
    several pops per step (the body is a no-op for drained packets, so
    overshoot is harmless)."""

    def cond(s):
        active = jnp.sum((s["regs"][0] >= 0).astype(jnp.int32))
        return active > stop_count

    body = _make_body(rows, rd)

    def body_n(s):
        for _ in range(reps):
            s = body(s)
        return s

    return jax.lax.while_loop(cond, body_n, state)


@partial(jax.jit, static_argnames=("target",))
def _compact(state, rd, orig_idx, target: int):
    """Gather the still-active packets (stacks, per-ray state, ray data) to
    the front and truncate to ``target`` rows."""
    act = state["regs"][0] >= 0
    perm = jnp.argsort(~act, stable=True)
    sel = perm[:target]
    gather = lambda a: take_rows(a, sel)  # noqa: E731
    state = dict(
        regs=tuple(r[sel] for r in state["regs"]),
        tmax=gather(state["tmax"]),
        tri_id=gather(state["tri_id"]),
        box_tests=gather(state["box_tests"]),
        tri_tests=gather(state["tri_tests"]),
    )
    rd = {k: gather(v) for k, v in rd.items()}
    return state, rd, orig_idx[sel]


@jax.jit
def _scatter_back(out, state, orig_idx):
    return dict(
        tmax=out["tmax"].at[orig_idx].set(state["tmax"]),
        tri_id=out["tri_id"].at[orig_idx].set(state["tri_id"]),
        box_tests=out["box_tests"].at[orig_idx].set(state["box_tests"]),
        tri_tests=out["tri_tests"].at[orig_idx].set(state["tri_tests"]),
    )


_finish_phased = jax.jit(
    lambda pairs, rays, out, num_rays: _reconstruct(
        pairs, rays, out["tmax"].reshape(num_rays), out["tri_id"].reshape(num_rays)
    ),
    static_argnames=("num_rays",),
)


def trace_rays_wide_fat_phased(
    wide: FatWideBVH,
    pairs: PackedPairs,
    rays: Rays,
    active=None,
    packet_size: int = 128,
    shrink: int = 4,
    min_packets: int = 256,
) -> Tuple[HitRecord, TraceStats]:
    """Phased closest-hit trace: compacts active packets between stages.

    NOT jittable as a whole (Python-level stage loop over jitted stages,
    like the path tracer's bounce loop); each stage shape compiles once and
    is reused across frames.
    """
    num_rays = rays.origin.shape[0]
    assert num_rays % packet_size == 0
    num_p = num_rays // packet_size
    k = packet_size

    rd = _ray_data(rays, active, num_p, k)
    state = _init_state(rd, rays.tmax, num_p, k)
    out = dict(
        tmax=state["tmax"],
        tri_id=state["tri_id"],
        box_tests=state["box_tests"],
        tri_tests=state["tri_tests"],
    )
    orig_idx = jnp.arange(num_p, dtype=jnp.int32)

    schedule = []
    s = num_p
    while s > min_packets:
        s = max(s // shrink, min_packets)
        schedule.append(s)

    reps = 1
    for target in schedule:
        state = _run_phase(wide.rows, rd, state, stop_count=target, reps=reps)
        out = _scatter_back(out, state, orig_idx)
        state, rd, orig_idx = _compact(state, rd, orig_idx, target)
        reps = min(reps * 2, 8)
    state = _run_phase(wide.rows, rd, state, stop_count=0, reps=reps)
    out = _scatter_back(out, state, orig_idx)

    rec = _finish_phased(pairs, rays, out, num_rays)
    bt = jnp.broadcast_to(out["box_tests"], (num_p, k)).reshape(num_rays)
    tt = jnp.broadcast_to(out["tri_tests"], (num_p, k)).reshape(num_rays)
    return rec, TraceStats(box_tests=bt, tri_tests=tt)


def make_tiled_fat_tracer(wide, width: int, height: int,
                          tile_w: int = 16, tile_h: int = 8,
                          phased: bool = False):
    """Drop-in tracer closure over screen-tile packets.

    With ``wide=None`` the FatWideBVH is taken from the tracer's ``trav``
    argument instead — use that form for per-frame rebuilds so one closure
    (and one compiled program) serves every frame. ``phased=True`` selects
    the host-staged compaction variant (tracer.host_staged marks it as not
    jit-wrappable; the path tracer checks this).
    """
    from tpu_raytracing.trace.packet import tile_reorder, tile_restore

    trace = trace_rays_wide_fat_phased if phased else trace_rays_wide_fat

    def tracer(trav, pairs, rays, max_width=2, active=None):
        del max_width
        w = wide if wide is not None else trav
        tiled = jax.tree.map(
            lambda a: tile_reorder(a, width, height, tile_w, tile_h), rays
        )
        act = None if active is None else tile_reorder(
            active, width, height, tile_w, tile_h
        )
        rec, stats = trace(w, pairs, tiled, active=act, packet_size=tile_w * tile_h)
        rec = jax.tree.map(
            lambda a: tile_restore(a, width, height, tile_w, tile_h), rec
        )
        stats = jax.tree.map(
            lambda a: tile_restore(a, width, height, tile_w, tile_h), stats
        )
        return rec, stats

    tracer.host_staged = phased
    return tracer
