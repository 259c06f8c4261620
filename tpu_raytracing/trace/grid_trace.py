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

Layout rule (docs/TPU_NOTES.md): every loop-carried or per-iteration
per-ray value is a FLAT [R] array — [R, 3] carries would tile-pad the
minor dim 3 -> 128 and rewrite ~43x the bytes per iteration. Pair rows
are gathered channel-major ([16, R] via take_cols) for the same reason.

Stats: box_tests = DDA iterations (cells visited incl. drain steps),
tri_tests = Moller-Trumbore pair tests x 2 — both per ray, so the
BOX_TESTS / TRIANGLE_TESTS heatmap modes are meaningful.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_raytracing.bvh.grid import DIST_SHIFT as GD_SHIFT
from tpu_raytracing.bvh.grid import UniformGrid
from tpu_raytracing.ops.gather import take_cols
from tpu_raytracing.trace.brute import HitRecord
from tpu_raytracing.trace.ray import Rays
from tpu_raytracing.trace.traverse import PackedPairs, TraceStats
from tpu_raytracing.trace.wide_fat import _reconstruct

_F32_MAX = float(jnp.finfo(jnp.float32).max)
_TRI_EPS = 1e-9


def _mt_cols(pt, ox, oy, oz, dx, dy, dz, tmin, tmax):
    """Moller-Trumbore of both triangles of channel-major pair rows
    ``pt`` ([16, R] int32 view) against per-lane rays (all [R]).
    Returns (t [R], enc [R]: 0/1 second-tri flag, -1 = miss). Same
    epsilon/tie conventions as the split kernel
    (trace/split_pallas.py:leaf_mt; reference src/Tracer.cu:207-250)."""
    i2f = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)  # noqa: E731
    w = [i2f(pt[i]) for i in range(12)]

    def mt(ax_, ay_, az_, bx, by, bz, cx, cy, cz):
        e1x, e1y, e1z = bx - ax_, by - ay_, bz - az_
        e2x, e2y, e2z = cx - ax_, cy - ay_, cz - az_
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        degen = (det > -_TRI_EPS) & (det < _TRI_EPS)
        f = 1.0 / det
        sx, sy, sz = ox - ax_, oy - ay_, oz - az_
        u = f * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        acc = (~degen & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
               & (u + v <= 1.0) & (t >= tmin) & (t <= tmax))
        return jnp.where(acc, t, _F32_MAX)

    ta = mt(*w[0:3], *w[3:6], *w[6:9])
    tb = mt(*w[6:9], *w[3:6], *w[9:12])
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
    residue_after: int = 0,
    residue_width: int = 0,
) -> Tuple[HitRecord, TraceStats]:
    """Closest-hit (or any-hit) trace of a ray batch through the grid.

    ``segments`` > 1 runs the DDA loop as that many independent
    while_loops over equal ray slices: a lockstep loop pays its SLOWEST
    ray's step count across the full width, so slicing origin-sorted
    rays (correlated path lengths) into segments lets short segments
    retire early instead of idling behind the global tail.

    ``residue_after`` > 0 enables RESIDUE COMPACTION, the stronger tail
    cure: run at most that many full-width iterations (covering the
    ~20-step mean), then sort the survivors to the front (one cheap
    1-key/1-payload sort) and finish them in ``residue_width``-wide
    chunks, each run to completion. The lockstep max (~200 steps at 1M,
    benchmarks/probe_grid_cpu.py) is then paid at ~R/8 width instead of
    full width — every ray still walks its exact original path, so hits
    and stats are bit-identical to the single-phase loop."""
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
                any_hit=any_hit, block=block,
                residue_after=residue_after, residue_width=residue_width)
            recs.append(r)
            stats.append(s)
        cat = lambda xs: jax.tree.map(  # noqa: E731
            lambda *a: jnp.concatenate(a, axis=0), *xs)
        return cat(recs), cat(stats)

    gx, gy, gz = grid.res
    g3 = gx * gy * gz
    rows = pairs.rows
    num_rows = rows.shape[0]
    num = rays.origin.shape[0]
    if active is None:
        active = jnp.ones((num,), bool)

    # flat per-axis ray components (loop-invariant [R] arrays)
    ox, oy, oz = (rays.origin[:, i] for i in range(3))
    dx, dy, dz = (rays.direction[:, i] for i in range(3))
    tmin = rays.tmin
    safe = lambda a: jnp.where(jnp.abs(a) < 1e-20, 1e-20, a)  # noqa: E731
    invx, invy, invz = 1.0 / safe(dx), 1.0 / safe(dy), 1.0 / safe(dz)
    gminx, gminy, gminz = (grid.grid_min[i] for i in range(3))
    gmaxx, gmaxy, gmaxz = (grid.grid_max[i] for i in range(3))
    csx, csy, csz = (grid.cell_size[i] for i in range(3))

    best_t = rays.tmax
    best_tri = jnp.full((num,), -1, jnp.int32)
    tri_tests = jnp.zeros((num,), jnp.int32)

    # --- big list: oversized rows, tested once per ray ---
    bcap = grid.big.shape[0]
    nbig = grid.num_big

    def big_body(i, carry):
        bt, btr, tt = carry
        ridx = grid.big[i]
        pt = [jnp.broadcast_to(rows[ridx, wd], (num,)) for wd in range(12)]
        t, enc = _mt_cols(pt, ox, oy, oz, dx, dy, dz, tmin, bt)
        upd = active & (i < nbig) & (enc >= 0) & (t < bt)
        bt = jnp.where(upd, t, bt)
        btr = jnp.where(upd, (ridx << 1) | enc, btr)
        tt = tt + 2 * (active & (i < nbig)).astype(jnp.int32)
        return bt, btr, tt

    # traced bound: bcap is a ~P/256 static capacity but num_big is
    # usually tiny — a full-width MT per EMPTY slot would dwarf the trace
    best_t, best_tri, tri_tests = jax.lax.fori_loop(
        0, jnp.minimum(nbig, bcap), big_body,
        (best_t, best_tri, tri_tests))

    # --- DDA init (per-axis slab + first cell) ---
    def axis_init(o_a, inv_a, gmin_a, gmax_a, cs_a, d_a):
        t0 = (gmin_a - o_a) * inv_a
        t1 = (gmax_a - o_a) * inv_a
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    nx0, fx0 = axis_init(ox, invx, gminx, gmaxx, csx, dx)
    ny0, fy0 = axis_init(oy, invy, gminy, gmaxy, csy, dy)
    nz0, fz0 = axis_init(oz, invz, gminz, gmaxz, csz, dz)
    tnear = jnp.maximum(jnp.maximum(nx0, ny0), nz0)
    tfar = jnp.minimum(jnp.minimum(fx0, fy0), fz0)
    # no acceptable hit exists beyond the ray's own tmax (finite for
    # shadow rays toward a light) — stop marching there, not at the box
    tfar = jnp.minimum(tfar, rays.tmax)
    miss_box = (tnear > tfar) | (tfar < tmin) | (tnear > rays.tmax)
    start_t = jnp.maximum(jnp.maximum(tnear, tmin), 0.0)

    def cell_at(o_a, d_a, gmin_a, cs_a, g_a):
        return jnp.clip(
            jnp.floor((o_a + d_a * start_t - gmin_a) / cs_a)
            .astype(jnp.int32), 0, g_a - 1)

    cx = cell_at(ox, dx, gminx, csx, gx)
    cy = cell_at(oy, dy, gminy, csy, gy)
    cz = cell_at(oz, dz, gminz, csz, gz)
    stx = jnp.where(dx > 0, 1, jnp.where(dx < 0, -1, 0)).astype(jnp.int32)
    sty = jnp.where(dy > 0, 1, jnp.where(dy < 0, -1, 0)).astype(jnp.int32)
    stz = jnp.where(dz > 0, 1, jnp.where(dz < 0, -1, 0)).astype(jnp.int32)

    def tmax_at(c_a, st_a, o_a, inv_a, gmin_a, cs_a):
        bound = gmin_a + (c_a + (st_a > 0)).astype(jnp.float32) * cs_a
        return jnp.where(st_a != 0, (bound - o_a) * inv_a, _F32_MAX)

    tmx = tmax_at(cx, stx, ox, invx, gminx, csx)
    tmy = tmax_at(cy, sty, oy, invy, gminy, csy)
    tmz = tmax_at(cz, stz, oz, invz, gminz, csz)
    tdx = jnp.where(stx != 0, csx * jnp.abs(invx), _F32_MAX)
    tdy = jnp.where(sty != 0, csy * jnp.abs(invy), _F32_MAX)
    tdz = jnp.where(stz != 0, csz * jnp.abs(invz), _F32_MAX)

    done = ~active | miss_box
    if any_hit:
        done = done | (best_tri >= 0)
    off = jnp.zeros((num,), jnp.int32)
    steps = jnp.zeros((num,), jnp.int32)

    # macro-skip nudge: advance ~1e-3 of a cell along the dominant axis
    dmax = jnp.maximum(jnp.maximum(jnp.abs(dx), jnp.abs(dy)), jnp.abs(dz))
    dt_nudge = 1e-3 * jnp.minimum(jnp.minimum(csx, csy), csz) / jnp.maximum(
        dmax, 1e-20)

    # Per-ray loop invariants, bundled so the residue phase can gather a
    # compact chunk of them (all flat [R] — see the layout rule above).
    ctx0 = dict(ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                invx=invx, invy=invy, invz=invz,
                stx=stx, sty=sty, stz=stz,
                tdx=tdx, tdy=tdy, tdz=tdz,
                tmin=tmin, nudge=dt_nudge)
    st0 = dict(cx=cx, cy=cy, cz=cz, tmx=tmx, tmy=tmy, tmz=tmz, off=off,
               done=done, bt=best_t, btr=best_tri, tt=tri_tests,
               steps=steps, tfar=tfar)
    iter_cap = 8 * max(gx, gy, gz) + (1 << 17)

    def run_dda(ctx, st, max_iter):
        """The DDA while_loop over state ``st`` with per-ray invariants
        ``ctx`` (any width), bounded to ``max_iter`` iterations."""
        ox, oy, oz = ctx["ox"], ctx["oy"], ctx["oz"]
        dx, dy, dz = ctx["dx"], ctx["dy"], ctx["dz"]
        invx, invy, invz = ctx["invx"], ctx["invy"], ctx["invz"]
        stx, sty, stz = ctx["stx"], ctx["sty"], ctx["stz"]
        tdx, tdy, tdz = ctx["tdx"], ctx["tdy"], ctx["tdz"]
        tmin, dt_nudge = ctx["tmin"], ctx["nudge"]

        def cond(s):
            return jnp.any(~s["done"]) & (s["iter"] < max_iter)

        def body(s):
            cx, cy, cz = s["cx"], s["cy"], s["cz"]
            tmx, tmy, tmz = s["tmx"], s["tmy"], s["tmz"]
            off, done = s["off"], s["done"]
            bt, btr, tt, steps = s["bt"], s["btr"], s["tt"], s["steps"]

            cid = jnp.where(done, g3, (cz * gy + cy) * gx + cx)
            start = grid.cell_start[cid]
            word = grid.cell_word[cid]
            count = word & ((1 << GD_SHIFT) - 1)
            dist = word >> GD_SHIFT  # L-inf empty radius (bvh/grid.py)
            rem = count - off
            for j in range(block):
                live_j = ~done & (j < rem)
                ridx = grid.refs[jnp.clip(start + off + j, 0,
                                          grid.refs.shape[0] - 1)]
                ridx = jnp.minimum(ridx, num_rows - 1)
                # vertex words only (12 of 16): the [12, P] transposed
                # operand is loop-invariant and the gather moves 25% fewer
                # bytes; prim/rot words are reconstructed post-loop.
                pt = take_cols(rows[:, :12], ridx)  # [12, R] channel-major
                t, enc = _mt_cols(pt, ox, oy, oz, dx, dy, dz, tmin, bt)
                upd = live_j & (enc >= 0) & (t < bt)
                bt = jnp.where(upd, t, bt)
                btr = jnp.where(upd, (ridx << 1) | enc, btr)
                tt = tt + 2 * live_j.astype(jnp.int32)

            drained = ~done & (rem <= block)
            texit = jnp.minimum(jnp.minimum(tmx, tmy), tmz)
            if any_hit:
                # occlusion needs no cell drain — first accepted hit retires
                finished = ~done & (btr >= 0)
            else:
                # front-to-back: a hit at or before this cell's exit is final
                finished = drained & (bt <= texit)

            # one fine DDA step for drained, unfinished rays
            stepping = drained & ~finished
            ax_x = (tmx <= tmy) & (tmx <= tmz)
            ax_y = ~ax_x & (tmy <= tmz)
            ax_z = ~ax_x & ~ax_y
            cx_n = cx + jnp.where(stepping & ax_x, stx, 0)
            cy_n = cy + jnp.where(stepping & ax_y, sty, 0)
            cz_n = cz + jnp.where(stepping & ax_z, stz, 0)
            tmx_n = jnp.where(stepping & ax_x, tmx + tdx, tmx)
            tmy_n = jnp.where(stepping & ax_y, tmy + tdy, tmy)
            tmz_n = jnp.where(stepping & ax_z, tmz + tdz, tmz)
            oob = ((cx_n < 0) | (cx_n >= gx) | (cy_n < 0) | (cy_n >= gy)
                   | (cz_n < 0) | (cz_n >= gz) | (texit > s["tfar"]))
            done_n = done | finished | (stepping & oob)
            off_n = jnp.where(drained, 0, off + block)

            # --- distance-field empty-space skip (bvh/grid.py:cell_word):
            # a ray in an empty cell whose packed dist is D >= 2 advances
            # to just before its (D-1)-th boundary crossing on ANY axis —
            # every cell it can touch lies in the L-inf ball of radius
            # D-1 around the current cell, which the distance transform
            # guarantees empty. Overrides the single fine step; count==0
            # made this iteration's block tests no-ops for these rays. ---
            skip = ~done & (dist >= 2)
            dd = (dist - 1).astype(jnp.float32)
            # crossing k on axis a happens at tm_a + (k-1)*td_a; stay
            # strictly before crossing D on every axis (dt_nudge is the
            # backward margin; td sentinels for st==0 axes are F32_MAX
            # and fall out of the min)
            t_land = (jnp.minimum(
                jnp.minimum(tmx + dd * tdx, tmy + dd * tdy),
                tmz + dd * tdz) - dt_nudge)

            def land(o_a, d_a, gmin_a, cs_a, g_a):
                return jnp.clip(
                    jnp.floor((o_a + d_a * t_land - gmin_a) / cs_a)
                    .astype(jnp.int32), 0, g_a - 1)

            cx_l = land(ox, dx, gminx, csx, gx)
            cy_l = land(oy, dy, gminy, csy, gy)
            cz_l = land(oz, dz, gminz, csz, gz)
            done_s = done | (t_land > s["tfar"])
            if not any_hit:
                done_s = done_s | (bt <= t_land)
            tmx_l = tmax_at(cx_l, stx, ox, invx, gminx, csx)
            tmy_l = tmax_at(cy_l, sty, oy, invy, gminy, csy)
            tmz_l = tmax_at(cz_l, stz, oz, invz, gminz, csz)

            cx_n = jnp.where(skip, cx_l, cx_n)
            cy_n = jnp.where(skip, cy_l, cy_n)
            cz_n = jnp.where(skip, cz_l, cz_n)
            tmx_n = jnp.where(skip, tmx_l, tmx_n)
            tmy_n = jnp.where(skip, tmy_l, tmy_n)
            tmz_n = jnp.where(skip, tmz_l, tmz_n)
            done_n = jnp.where(skip, done_s, done_n)
            off_n = jnp.where(skip, 0, off_n)

            steps = steps + (~done).astype(jnp.int32)
            return dict(cx=cx_n, cy=cy_n, cz=cz_n, tmx=tmx_n, tmy=tmy_n,
                        tmz=tmz_n, off=off_n, done=done_n, bt=bt, btr=btr,
                        tt=tt, steps=steps, tfar=s["tfar"],
                        iter=s["iter"] + 1)

        return jax.lax.while_loop(cond, body,
                                  {**st, "iter": jnp.int32(0)})

    if residue_after <= 0:
        out = run_dda(ctx0, st0, iter_cap)
    else:
        # Phase 1: full width, bounded to the mean-covering iteration
        # budget (still exits early if everything retires sooner).
        out1 = run_dda(ctx0, st0, residue_after)
        live_count = jnp.sum((~out1["done"]).astype(jnp.int32))
        w2 = residue_width
        if w2 <= 0:
            w2 = max(4096, -(-num // 8))
        w2 = min(-(-w2 // 1024) * 1024, num)  # lane-tile aligned
        st1 = {k: out1[k] for k in st0}
        upd_keys = ("bt", "btr", "tt", "steps")

        def finish(st1):
            # Stable sort-by-done: survivors first, in ray order. One
            # int32 payload — all other state is GATHERED per chunk, so
            # the >9 sort-payload compile cliff (docs/TPU_NOTES.md)
            # never applies.
            order = jnp.argsort(out1["done"].astype(jnp.int32),
                                stable=True).astype(jnp.int32)

            def chunk_cond(c):
                return c["i"] * w2 < live_count

            def chunk_body(c):
                pos = c["i"] * w2 + jnp.arange(w2, dtype=jnp.int32)
                mask = pos < live_count
                idx = order[jnp.minimum(pos, num - 1)]
                g = lambda a: a[idx]  # noqa: E731
                ctx2 = jax.tree.map(g, ctx0)
                st2 = {k: g(c[k]) for k in st1}
                st2["done"] = ~mask  # pos < live_count => a live ray
                out2 = run_dda(ctx2, st2, iter_cap)
                sidx = jnp.where(mask, idx, num)  # masked lanes drop
                upd = lambda a, v: a.at[sidx].set(  # noqa: E731
                    v, mode="drop")
                return dict(
                    i=c["i"] + 1,
                    **{k: upd(c[k], out2[k]) for k in upd_keys},
                    **{k: c[k] for k in st1 if k not in upd_keys})

            fin = jax.lax.while_loop(
                chunk_cond, chunk_body, dict(i=jnp.int32(0), **st1))
            return tuple(fin[k] for k in upd_keys)

        # Skip the sort + chunk machinery entirely when phase 1 retired
        # everything (the common case for late path-trace bounces where
        # most lanes are already dead).
        done_vals = jax.lax.cond(
            live_count > 0, finish,
            lambda s: tuple(s[k] for k in upd_keys), st1)
        out = {**out1, **dict(zip(upd_keys, done_vals))}

    rec = _reconstruct(pairs, rays, out["bt"], out["btr"])
    if any_hit:
        rec = rec.replace(t=jnp.where(rec.hit, out["bt"], rays.tmax))
    stats = TraceStats(box_tests=out["steps"], tri_tests=out["tt"])
    return rec, stats


def make_grid_tracer(any_hit: bool = False, block: int = 4,
                     segments: int = 1, residue_after: int = 0,
                     residue_width: int = 0):
    """Tracer with the (trav, pairs, rays, active) signature the render
    pipeline expects — trav is the UniformGrid."""
    def tracer(grid, pairs, rays, max_width=2, active=None):
        del max_width
        return trace_rays_grid(grid, pairs, rays, active=active,
                               any_hit=any_hit, block=block,
                               segments=segments,
                               residue_after=residue_after,
                               residue_width=residue_width)
    return tracer
