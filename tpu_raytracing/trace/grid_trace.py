"""3D-DDA traversal of the uniform grid — dense XLA, no scalar control.

Every while_loop iteration advances ALL rays one micro-step: test up to
``B`` pair rows of the ray's current cell (gathers from the
loop-invariant ref/row tables — the fast case on this backend), then
either keep draining the same cell (off += B) or take one DDA step.
A ray retires when its best hit lies at or before the current cell's
exit (no later cell can beat it — the grid marching order is front to
back), when it leaves the grid, or — in any-hit mode — on the first
accepted hit. There is no stack and no per-node decision logic: the
~480 ns/pop scalar-control wall of the packet kernel (docs/TPU_NOTES.md)
does not exist here, and incoherent rays cost their own path only (no
packet-union waste).

Stats: box_tests = DDA iterations (cells visited incl. drain steps),
tri_tests = Moller-Trumbore pair tests x 2 — both per ray, so the
BOX_TESTS / TRIANGLE_TESTS heatmap modes are meaningful.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_raytracing.bvh.grid import UniformGrid
from tpu_raytracing.ops.gather import take_rows
from tpu_raytracing.trace.brute import HitRecord
from tpu_raytracing.trace.ray import Rays
from tpu_raytracing.trace.traverse import PackedPairs, TraceStats
from tpu_raytracing.trace.wide_fat import _reconstruct

_F32_MAX = float(jnp.finfo(jnp.float32).max)
_TRI_EPS = 1e-9


def _mt_rows(prow, o, d, tmin, tmax):
    """Moller-Trumbore of both triangles of gathered pair rows [R, 16]
    against per-row rays. Returns (t [R], enc [R]: 0/1 second-tri flag,
    -1 = miss). Same epsilon/tie conventions as the split kernel
    (trace/split_pallas.py:leaf_mt; reference src/Tracer.cu:207-250)."""
    i2f = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)  # noqa: E731
    v0 = i2f(prow[:, 0:3])
    v1 = i2f(prow[:, 3:6])
    v2 = i2f(prow[:, 6:9])
    v3 = i2f(prow[:, 9:12])

    def mt(a, b, c):
        e1 = b - a
        e2 = c - a
        h = jnp.cross(d, e2)
        det = jnp.sum(e1 * h, axis=-1)
        degen = (det > -_TRI_EPS) & (det < _TRI_EPS)
        f = 1.0 / det
        s = o - a
        u = f * jnp.sum(s * h, axis=-1)
        q = jnp.cross(s, e1)
        v = f * jnp.sum(d * q, axis=-1)
        t = f * jnp.sum(e2 * q, axis=-1)
        acc = (~degen & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
               & (u + v <= 1.0) & (t >= tmin) & (t <= tmax))
        return jnp.where(acc, t, _F32_MAX)

    ta = mt(v0, v1, v2)
    tb = mt(v2, v1, v3)
    # later slot wins distance ties (matches the fat tracers' entry order)
    second = tb <= ta
    t = jnp.minimum(ta, tb)
    enc = jnp.where(t < _F32_MAX, second.astype(jnp.int32), -1)
    return t, enc


def trace_rays_grid(
    grid: UniformGrid,
    pairs: PackedPairs,
    rays: Rays,
    max_width: int = 2,
    active=None,
    any_hit: bool = False,
    block: int = 4,
    segments: int = 1,
) -> Tuple[HitRecord, TraceStats]:
    """Closest-hit (or any-hit) trace of a ray batch through the grid.

    ``segments`` > 1 runs the DDA loop as that many independent
    while_loops over equal ray slices: a lockstep loop pays its SLOWEST
    ray's step count across the full width, so slicing origin-sorted
    rays (correlated path lengths) into segments lets short segments
    retire early instead of idling behind the global tail."""
    del max_width
    if segments > 1:
        num = rays.origin.shape[0]
        assert num % segments == 0, (num, segments)
        act = (jnp.ones((num,), bool) if active is None else active)
        sl = lambda a, i, s=num // segments: jax.tree.map(  # noqa: E731
            lambda x: x[i * s:(i + 1) * s], a)
        recs, stats = [], []
        for i in range(segments):
            r, s = trace_rays_grid(
                grid, pairs, sl(rays, i), active=sl(act, i),
                any_hit=any_hit, block=block)
            recs.append(r)
            stats.append(s)
        cat = lambda xs: jax.tree.map(  # noqa: E731
            lambda *a: jnp.concatenate(a, axis=0), *xs)
        return cat(recs), cat(stats)
    g = grid.res
    g3 = g * g * g
    mshift = grid.mshift
    gm = -(-g // (1 << mshift))
    gm3 = gm * gm * gm  # macro_occ sentinel slot (always occupied)
    rows = pairs.rows
    num_rows = rows.shape[0]
    num = rays.origin.shape[0]
    o = rays.origin
    d = rays.direction
    tmin = rays.tmin
    if active is None:
        active = jnp.ones((num,), bool)

    best_t = rays.tmax
    best_tri = jnp.full((num,), -1, jnp.int32)
    tri_tests = jnp.zeros((num,), jnp.int32)

    # --- big list: oversized rows, tested once per ray ---
    bcap = grid.big.shape[0]
    nbig = grid.num_big

    def big_body(i, carry):
        bt, btr, tt = carry
        ridx = grid.big[i]
        prow = jnp.broadcast_to(rows[ridx], (num, 16))
        t, enc = _mt_rows(prow, o, d, tmin, bt)
        upd = active & (i < nbig) & (enc >= 0) & (t < bt)
        bt = jnp.where(upd, t, bt)
        btr = jnp.where(upd, (ridx << 1) | enc, btr)
        tt = tt + 2 * (active & (i < nbig)).astype(jnp.int32)
        return bt, btr, tt

    best_t, best_tri, tri_tests = jax.lax.fori_loop(
        0, bcap, big_body, (best_t, best_tri, tri_tests))

    # --- DDA init ---
    safe_d = jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    inv = 1.0 / safe_d
    t0 = (grid.grid_min[None, :] - o) * inv
    t1 = (grid.grid_max[None, :] - o) * inv
    tnear = jnp.max(jnp.minimum(t0, t1), axis=1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=1)
    miss_box = (tnear > tfar) | (tfar < tmin) | (tnear > rays.tmax)
    start_t = jnp.maximum(jnp.maximum(tnear, tmin), 0.0)
    pos = o + d * start_t[:, None]
    cell = jnp.clip(
        jnp.floor((pos - grid.grid_min[None, :]) / grid.cell_size[None, :])
        .astype(jnp.int32), 0, g - 1)
    step = jnp.where(d > 0, 1, jnp.where(d < 0, -1, 0)).astype(jnp.int32)
    nxt_bound = (grid.grid_min[None, :]
                 + (cell + (step > 0)).astype(jnp.float32)
                 * grid.cell_size[None, :])
    tmax3 = jnp.where(step != 0, (nxt_bound - o) * inv, _F32_MAX)
    tdelta = jnp.where(step != 0,
                       grid.cell_size[None, :] * jnp.abs(inv), _F32_MAX)

    done = ~active | miss_box
    # any-hit can retire big-list winners immediately
    if any_hit:
        done = done | (best_tri >= 0)
    off = jnp.zeros((num,), jnp.int32)
    steps = jnp.zeros((num,), jnp.int32)

    def cond(s):
        return jnp.any(~s["done"]) & (s["iter"] < 8 * g + (1 << 17))

    def body(s):
        cell, tm3, off, done = s["cell"], s["tmax3"], s["off"], s["done"]
        bt, btr, tt, steps = s["bt"], s["btr"], s["tt"], s["steps"]
        cid = jnp.where(
            done, g3,
            (cell[:, 2] * g + cell[:, 1]) * g + cell[:, 0])
        start = grid.cell_start[cid]
        count = grid.cell_count[cid]
        rem = count - off
        for j in range(block):
            live_j = ~done & (j < rem)
            ridx = grid.refs[jnp.clip(start + off + j, 0,
                                      grid.refs.shape[0] - 1)]
            ridx = jnp.minimum(ridx, num_rows - 1)
            prow = take_rows(rows, ridx)
            t, enc = _mt_rows(prow, o, d, tmin, bt)
            upd = live_j & (enc >= 0) & (t < bt)
            bt = jnp.where(upd, t, bt)
            btr = jnp.where(upd, (ridx << 1) | enc, btr)
            tt = tt + 2 * live_j.astype(jnp.int32)

        drained = ~done & (rem <= block)
        texit = jnp.min(tm3, axis=1)
        if any_hit:
            finished = drained & (btr >= 0)
        else:
            # front-to-back: a hit at or before this cell's exit is final
            finished = drained & (bt <= texit)

        # one DDA step for drained, unfinished rays
        axis = jnp.argmin(tm3, axis=1)
        stepping = drained & ~finished
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        cell_n = cell + jnp.where(stepping[:, None], onehot * step, 0)
        tm3_n = tm3 + jnp.where(stepping[:, None],
                                onehot.astype(jnp.float32) * tdelta, 0.0)
        oob = (jnp.any((cell_n < 0) | (cell_n >= g), axis=1)
               | (texit > s["tfar"]))
        done_n = done | finished | (stepping & oob)
        off_n = jnp.where(drained, 0, off + block)

        # --- macrocell empty-space skip: jump a whole 2^mshift block ---
        # (overrides the fine step; an empty macrocell implies count == 0,
        # so the block tests above were no-ops for these rays)
        mcell = cell >> mshift
        mid = jnp.where(done, gm3,
                        (mcell[:, 2] * gm + mcell[:, 1]) * gm + mcell[:, 0])
        occ = grid.macro_occ[jnp.minimum(mid, gm3)]
        skip = ~done & ~occ
        mnext = mcell + (step > 0).astype(jnp.int32)
        mbound = (grid.grid_min[None, :]
                  + (mnext << mshift).astype(jnp.float32)
                  * grid.cell_size[None, :])
        t_axis = jnp.where(step != 0, (mbound - o) * inv, _F32_MAX)
        texit_m = jnp.min(t_axis, axis=1)
        axis_m = jnp.argmin(t_axis, axis=1)
        # land: crossing-axis fine layer forced (guaranteed progress),
        # other axes from the position at macro exit (+ a ~1e-3-cell nudge)
        dt = 1e-3 * jnp.min(grid.cell_size) / jnp.maximum(
            jnp.max(jnp.abs(d), axis=1), 1e-20)
        pos_l = o + d * (texit_m + dt)[:, None]
        cell_l = jnp.clip(
            jnp.floor((pos_l - grid.grid_min[None, :])
                      / grid.cell_size[None, :]).astype(jnp.int32),
            0, g - 1)
        forced = jnp.where(step > 0, (mcell + 1) << mshift,
                           (mcell << mshift) - 1)  # may be -1 / >= g: oob
        oh_m = jax.nn.one_hot(axis_m, 3, dtype=jnp.int32)
        cell_l = cell_l * (1 - oh_m) + forced * oh_m
        tm3_l = jnp.where(
            step != 0,
            (grid.grid_min[None, :]
             + (cell_l + (step > 0)).astype(jnp.float32)
             * grid.cell_size[None, :] - o) * inv,
            _F32_MAX)
        done_s = (done | (texit_m > s["tfar"])
                  | jnp.any((cell_l < 0) | (cell_l >= g), axis=1))
        if not any_hit:
            done_s = done_s | (bt <= texit_m)
        cell_l = jnp.clip(cell_l, 0, g - 1)

        sk = skip[:, None]
        cell_n = jnp.where(sk, cell_l, cell_n)
        tm3_n = jnp.where(sk, tm3_l, tm3_n)
        done_n = jnp.where(skip, done_s, done_n)
        off_n = jnp.where(skip, 0, off_n)

        steps = steps + (~done).astype(jnp.int32)
        return dict(cell=cell_n, tmax3=tm3_n, off=off_n, done=done_n,
                    bt=bt, btr=btr, tt=tt, steps=steps, tfar=s["tfar"],
                    iter=s["iter"] + 1)

    out = jax.lax.while_loop(cond, body, dict(
        cell=cell, tmax3=tmax3, off=off, done=done, bt=best_t, btr=best_tri,
        tt=tri_tests, steps=steps, tfar=tfar, iter=jnp.int32(0)))

    rec = _reconstruct(pairs, rays, out["bt"], out["btr"])
    if any_hit:
        rec = rec.replace(t=jnp.where(rec.hit, out["bt"], rays.tmax))
    stats = TraceStats(box_tests=out["steps"], tri_tests=out["tt"])
    return rec, stats


def make_grid_tracer(any_hit: bool = False, block: int = 4):
    """Tracer with the (trav, pairs, rays, active) signature the render
    pipeline expects — trav is the UniformGrid."""
    def tracer(grid, pairs, rays, max_width=2, active=None):
        del max_width
        return trace_rays_grid(grid, pairs, rays, active=active,
                               any_hit=any_hit, block=block)
    return tracer
