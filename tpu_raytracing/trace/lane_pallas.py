"""Per-lane treelet traversal — the round-3 flagship Pallas kernel.

The round-2 packet kernel (trace/split_pallas.py) pops ONE node per
scalar-loop iteration: ~480-550 ns of serialized scalar control per pop,
times packet-union divergence (~23x the per-ray-ideal pop count on
incoherent rays). This kernel inverts the mapping: **every ray owns a
VPU lane** and advances through its OWN traversal one tree element per
iteration — 128 independent lane-advances per iteration with zero
scalar control in the hot loop. Measured basis (docs/TPU_NOTES.md
"Round 3", benchmarks/probe_lane_machine*.py):

* per-lane dynamic gather (`take_along_axis(table, idx, axis=1)`) lets
  128 lanes fetch 128 different columns of a VMEM table in ~130 ns —
  but only within ONE 128-lane tile, hence the treelet structure
  (bvh/treelet.py): the tree cut into <=128-element subtrees, each a
  [WH, 128] column table.
* per-lane stacks are pure vector ops: variable per-lane shift by
  k in [-1, 7] = 4 static `pltpu.roll`s + bit selects.
* loop-carried lane state lives in dedicated (8,128)-tiled VMEM
  scratches read as FULL tiles (sub-tile out_ref feedback compiled
  20,000x slower in 2 of 4 byte-identical builds).
* two+ interleaved packets hide the serial fetch->use->state chain:
  290 ns per packet-iteration at C=2 (~2.3 ns per lane-visit).

Traversal state per lane is one int32 **entry word**
``tid << 9 | col << 2 | typ`` (typ: 0 dead/empty, 1 inner column,
2 window column). Portal entries (CHILD_INST metas in the table)
convert at push time into the child treelet's root entry
(``child_tid << 9 | 1``), so the stack needs no portal kind: a lane
whose current entry's tid differs from the slot's resident treelet
simply stalls until the scheduler swaps tables. The scheduler (after
every CHUNK iterations, per slot): if any lane matches the resident
treelet, keep going; else DMA the min wanted tid's table from HBM
(~100 KB, roughly one iteration's cost); else the packet is done —
stage results out and refill the slot from the packet cursor.

Ordering preserves the reference semantics per lane (near child first,
higher entry id on distance ties — src/Tracer.cu:341-362): hits are
ranked by (near, -entry_id) with a vectorized 8x8 comparison matrix and
scattered into push slots by rank. Within a window, later pair slots /
second triangles win distance ties (<=), matching the fat tracers.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_raytracing.bvh import invariants
from tpu_raytracing.bvh.treelet import INNER_WIDTH, TreeletBVH
from tpu_raytracing.trace.brute import HitRecord
from tpu_raytracing.trace.ray import Rays
from tpu_raytracing.trace.traverse import PackedPairs, TraceStats
from tpu_raytracing.trace.wide_fat import _reconstruct

# Packet slots in flight (TPURT_LANE_C): >=2 hides the serial
# gather->use chain (probe 3: 1.1 us/iter alone, 290 ns interleaved).
C = int(_os.environ.get("TPURT_LANE_C", "2"))
# Iterations between scheduler checks per slot (TPURT_LANE_CHUNK).
# Measured on the v5e bounce workload (benchmarks/probe_lane_kernel.py,
# T sweep): 1 is best by 2.6x over 16 — treelet switches are frequent
# enough that postponing the scheduler wastes whole chunks on stalls.
CHUNK = int(_os.environ.get("TPURT_LANE_CHUNK", "1"))
# Per-lane stack depth. Measured watermark on the 1M bounce workload is
# ~18-24 (the 8-wide tree pushes ~1-2 live entries per level), and the
# stack rolls are ~38% of the iteration's VPU tiles at 128 rows — so the
# default is small. Overflow is DETECTED (depth watermark > STACK-8 at
# drain marks the lane unfinished-at-root in out row 7) and the restart
# driver re-traces those lanes from the root, so a too-small stack costs
# time, never correctness (when driven through trace_rays_lane_restart).
STACK = int(_os.environ.get("TPURT_LANE_STACK", "32"))
# Per-packet phase skip (TPURT_LANE_SKIP): gate the window / inner
# blocks on "any lane in that phase" reductions so straggler and drain
# iterations cost a pop-only stack shift instead of a full-table gather
# + Moller-Trumbore. 0 restores the unconditional body.
SKIP = int(_os.environ.get("TPURT_LANE_SKIP", "1"))
# Post-final recovery rounds (TPURT_LANE_RECOVER): after the unbudgeted
# round, lanes whose stack watermark neared STACK may have dropped far
# subtrees (circular rolls) — the kernel flags them in out row 7 and the
# drivers re-run them from the root (tmax tightened to the carried
# tbest) this many extra times. Each extra round over a mostly-finished
# array costs ~1 drain iteration per packet. Depth pathologies that
# survive every recovery round need TPURT_LANE_STACK sized to the
# worst case (~7 x tree depth; 128 covered the 1M scenes).
RECOVER = int(_os.environ.get("TPURT_LANE_RECOVER", "2"))

_F32_MAX = float(jnp.finfo(jnp.float32).max)
_TRI_EPS = 1e-9
_BIG = 2 ** 30
_NONE = 0  # entry word: dead / empty-stack sentinel


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _entry(tid, col, typ):
    return (tid << 9) | (col << 2) | typ


def _lane_kernel(tables, rays_hbm, state_hbm, root_smem, out_hbm, state_out,
                 # scratch
                 tab, ray_scr, cur, stk, tbest, tribest, cbox, ctri,
                 ctid_v, aux, out_stage, st_stage, cur_tid, done, cursor,
                 cnt, sem_tab, sem_ray, sem_out, sem_state,
                 *, wh, lw, c_slots, any_hit, max_outer, chunk, budget=0,
                 no_switch=False):
    """See the module docstring. Shapes:

    tables [T, wh, 128] f32 HBM; rays_hbm [num_p, 8, 128] f32 HBM;
    state_hbm / state_out [num_p, SROWS, 128] i32 HBM — full per-lane
    continuation state (rows: 0 cur entry, 1 tbest bits, 2 tribest,
    3 stack depth, 4 depth watermark, 5.. the STACK stack rows). Every
    launch RESUMES from state_hbm (a fresh trace passes init_state) and
    exports the suspended state at drain, so a driver can regroup lanes
    between budget rounds with zero re-traversal.
    root_smem [1] i32 (root treelet id); out_hbm [num_p, 8, 128] f32
    (rows: 0 t, 1 tri bits, 2 box tests, 3 tri tests, 4 resident
    iterations, 5 treelet switches, 6 max stack depth, 7 want+1/0).
    tab (C, wh, 128) f32; ray_scr (C, 16, 128) f32 (rows 0-2 o, 3-5 d,
    6 tmin, 7 tmax, 8-10 inv_d); cur (C, 8, 128) i32 row-uniform entry
    words; stk (C, STACK, 128) i32; tbest/tribest/cbox/ctri (C, 8, 128)
    row-uniform; ctid_v (C, 8, 128) i32 row-uniform resident-tid;
    aux (C, 8, 128) i32 (row 0 stack depth, row 1 max depth);
    cnt (2C,) SMEM [iters, switches] per slot since refill.
    """
    num_p = out_hbm.shape[0]
    nsub = jax.lax.broadcasted_iota(jnp.int32, (STACK, 128), 0)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    f2i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    i2f = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)  # noqa

    def load_rays(p, pkt):
        cp = pltpu.make_async_copy(
            rays_hbm.at[pkt], ray_scr.at[p, 0:8], sem_ray.at[p])
        cp.start()
        cp.wait()
        d = ray_scr[p, 3:6]
        safe = jnp.where(jnp.abs(d) < 1e-30,
                         jnp.where(d < 0, -1e-30, 1e-30), d)
        ray_scr[p, 8:11] = 1.0 / safe

    def load_table(p, tid):
        cp = pltpu.make_async_copy(tables.at[tid], tab.at[p], sem_tab.at[p])
        cp.start()
        cp.wait()
        cur_tid[p] = tid
        ctid_v[p] = jnp.full((8, 128), tid, jnp.int32)

    def load_state(p, pkt):
        cp = pltpu.make_async_copy(
            state_hbm.at[pkt], st_stage.at[p], sem_state.at[p])
        cp.start()
        cp.wait()
        s = st_stage[p]
        cur[p] = jnp.broadcast_to(s[0:1], (8, 128))
        tbest[p] = jnp.broadcast_to(i2f(s[1:2]), (8, 128))
        tribest[p] = jnp.broadcast_to(s[2:3], (8, 128))
        aux[p] = jnp.concatenate(
            [s[3:4], s[4:5], jnp.zeros((6, 128), jnp.int32)], axis=0)
        stk[p] = s[5:5 + STACK]
        cbox[p] = jnp.zeros((8, 128), jnp.int32)
        ctri[p] = jnp.zeros((8, 128), jnp.int32)
        cnt[2 * p] = 0
        cnt[2 * p + 1] = 0

    # ---- the per-lane iteration ----
    # SKIP=1 (default) gates the two heavy phases on per-packet masks:
    # the window block (12*lw+1-row gather + 2x Moller-Trumbore) runs
    # only when SOME lane sits on a window column, and the inner block
    # (56-row gather + slab + rank) only when some lane sits on an inner
    # column — otherwise a cheap pop-only stack update runs. Straggler /
    # mostly-dead / restart-drain iterations drop from a full ~wh-row
    # gather + MT to a few (STACK,128) rolls. SKIP=0 keeps the original
    # unconditional body (the masks make both orders equivalent).
    def iterate(p):
        rays = ray_scr[p]
        o = rays[0:3]
        d = rays[3:6]
        tmn = rays[6:7]
        inv = rays[8:11]
        c8 = cur[p]
        e = c8[0:1]                     # (1,128) live entry word
        typ = e & 3
        col = (e >> 2) & 127
        etid = jax.lax.shift_right_logical(e, 9)
        ctv = ctid_v[p][0:1]
        match = (etid == ctv) & (typ != 0)
        a_inner = match & (typ == 1)
        a_win = match & (typ == 2)
        tb1 = tbest[p][0:1]

        # ---- window phase: lw pairs x 2 Moller-Trumbore per lane;
        # writes tbest/tribest/ctri only ----
        def window_block():
            nrow = 12 * lw + 1
            gw = jnp.take_along_axis(
                tab[p][0:nrow], jnp.broadcast_to(col, (nrow, 128)), axis=1)
            gv = gw[0:12 * lw].reshape(12, lw, 128)

            def mt(a, b, cc):
                e1 = b - a
                e2 = cc - a
                dx, dy, dz = d[0][None], d[1][None], d[2][None]
                hx = dy * e2[2] - dz * e2[1]
                hy = dz * e2[0] - dx * e2[2]
                hz = dx * e2[1] - dy * e2[0]
                det = e1[0] * hx + e1[1] * hy + e1[2] * hz
                f = 1.0 / jnp.where(jnp.abs(det) < _TRI_EPS, _TRI_EPS, det)
                sx = o[0][None] - a[0]
                sy = o[1][None] - a[1]
                sz = o[2][None] - a[2]
                u = f * (sx * hx + sy * hy + sz * hz)
                qx = sy * e1[2] - sz * e1[1]
                qy = sz * e1[0] - sx * e1[2]
                qz = sx * e1[1] - sy * e1[0]
                v = f * (dx * qx + dy * qy + dz * qz)
                t = f * (e2[0] * qx + e2[1] * qy + e2[2] * qz)
                ok = ((jnp.abs(det) >= _TRI_EPS) & (u >= 0) & (u <= 1)
                      & (v >= 0) & (u + v <= 1))
                return t, ok

            ta, oka = mt(gv[0:3], gv[3:6], gv[6:9])
            tb_, okb = mt(gv[6:9], gv[3:6], gv[9:12])
            okd = oka & (ta >= tmn) & (ta <= tb1) & a_win   # (lw,128)
            okd2 = okb & (tb_ >= tmn) & (tb_ <= tb1) & a_win
            tva = jnp.where(okd, ta, _F32_MAX)
            tvb = jnp.where(okd2, tb_, _F32_MAX)
            wmin = jnp.minimum(
                jnp.min(tva, axis=0, keepdims=True),
                jnp.min(tvb, axis=0, keepdims=True))        # (1,128)
            whit = wmin <= tb1
            gstart = f2i(gw[12 * lw:12 * lw + 1])           # (1,128)
            piot = jax.lax.broadcasted_iota(jnp.int32, (lw, 128), 0)
            # winner index: max (p*2+second) among t == wmin (later slot
            # / second tri wins ties, matching the fat tracers' order)
            ia = jnp.where(tva == wmin, piot * 2, -1)
            ib = jnp.where(tvb == wmin, piot * 2 + 1, -1)
            widx = jnp.maximum(jnp.max(ia, axis=0, keepdims=True),
                               jnp.max(ib, axis=0, keepdims=True))
            wtri = gstart * 2 + widx
            tbest[p] = jnp.broadcast_to(jnp.where(whit, wmin, tb1), (8, 128))
            tribest[p] = jnp.broadcast_to(
                jnp.where(whit, wtri, tribest[p][0:1]), (8, 128))
            ctri[p] = ctri[p] + jnp.where(a_win, 2 * lw, 0)

        # ---- stack update, shared by the inner and pop-only phases.
        # k1 (1,128) = per-lane push count (0 => pop); net shift k1-1 in
        # [-1, 7] = one pop roll or 3 bit rolls + fill of the top rows.
        def stack_update(k1, pushvals):
            st = stk[p]
            stall = (typ != 0) & ~match
            if any_hit:
                # tribest was updated by window_block above (scratch
                # reads are ordered), so this sees this iteration's hit
                found = tribest[p][0:1] >= 0
                stall = stall & ~found
                k1 = jnp.where(found, 0, k1)
            st_top = st[0:1]
            pv0 = pushvals[0:1] if pushvals is not None else st_top
            cur_new = jnp.where(stall, e,
                                jnp.where(k1 > 0, pv0, st_top))
            if any_hit:
                cur_new = jnp.where(found & ~stall, _NONE, cur_new)
            # pop variant (s = -1): rows shift up; bottom row empties
            st_pop = pltpu.roll(st, STACK - 1, axis=0)  # roll by -1
            st_pop = jnp.where(nsub == STACK - 1, _NONE, st_pop)
            if pushvals is not None:
                su = jnp.maximum(k1 - 1, 0)                 # (1,128)
                stp = st
                for bit in (4, 2, 1):
                    rolled = pltpu.roll(stp, bit, axis=0)
                    stp = jnp.where((su & bit) != 0, rolled, stp)
                pv_sh = pltpu.roll(pushvals, 7, axis=0)  # [i]=push[i+1]
                fill = jnp.concatenate(
                    [pv_sh[0:7], jnp.zeros((STACK - 7, 128), jnp.int32)],
                    axis=0)
                stp = jnp.where(nsub < su, fill, stp)
                st_new = jnp.where(stall, st,
                                   jnp.where(k1 > 0, stp, st_pop))
            else:
                st_new = jnp.where(stall, st, st_pop)
            if any_hit:
                st_new = jnp.where(found & ~stall, _NONE, st_new)
            stk[p] = st_new
            cur[p] = jnp.broadcast_to(cur_new, (8, 128))

            # stack-depth watermark (row 0 depth, row 1 max) — overflow
            # past STACK silently drops far entries; the drain flags
            # watermark > STACK-8 for the host restart (out row 7).
            a8 = aux[p]
            dep = a8[0:1]
            ddelta = jnp.where(stall, 0, jnp.where(k1 > 0, k1 - 1, -1))
            dep_new = jnp.maximum(dep + ddelta, 0)
            if any_hit:
                dep_new = jnp.where(found & ~stall, 0, dep_new)
            mx = jnp.maximum(a8[1:2], dep_new)
            aux[p] = jnp.concatenate(
                [dep_new, mx, jnp.zeros((6, 128), jnp.int32)], axis=0)

        # ---- inner phase: 8-entry slab test + rank + push ----
        def inner_block():
            gi = jnp.take_along_axis(
                tab[p][0:56], jnp.broadcast_to(col, (56, 128)), axis=1)
            gb = gi[0:48].reshape(6, 8, 128)
            t0 = (gb[0:3] - o[:, None]) * inv[:, None]
            t1 = (gb[3:6] - o[:, None]) * inv[:, None]
            tn = jnp.max(jnp.minimum(t0, t1), axis=0)      # (8,128)
            tf = jnp.min(jnp.maximum(t0, t1), axis=0)
            tn = jnp.maximum(tn, tmn)
            tf = jnp.minimum(tf, tbest[p][0:1])
            m_i = f2i(gi[48:56])
            mtyp = m_i & 7
            hit = (tf >= tn) & (mtyp != 0) & a_inner        # (8,128)
            key = jnp.where(hit, tn, _F32_MAX)
            # rank r = #{e' hit: nearer, or equal and higher id} -> r=0
            # pops first = nearest (ties: higher id), src/Tracer.cu:346
            ka = key[:, None]                               # (8,1,128)
            kb = key[None]                                  # (1,8,128)
            closer = (kb < ka) | ((kb == ka)
                                  & (sub8[None] > sub8[:, None]))
            r = jnp.sum((closer & hit[None]).astype(jnp.int32), axis=1)
            k = jnp.sum(hit.astype(jnp.int32), axis=0, keepdims=True)
            child = jax.lax.shift_right_logical(m_i, 5)
            ev = jnp.where(
                mtyp == 3,
                (child << 9) | 1,                   # portal -> child root
                (ctv << 9) | (child << 2) | jnp.where(mtyp == 2, 2, 1))
            # pushvals[q] = ev of the rank-q hit (one-hot over sublanes)
            eq = (r[None] == sub8[:, None]) & hit[None]     # (8,8,128)
            pushvals = jnp.sum(jnp.where(eq, ev[None], 0), axis=1)
            cbox[p] = cbox[p] + jnp.where(a_inner, 8, 0)
            stack_update(jnp.where(a_inner, k, 0), pushvals)

        if SKIP:
            n_w = jnp.sum(a_win.astype(jnp.int32))
            n_i = jnp.sum(a_inner.astype(jnp.int32))

            @pl.when(n_w > 0)
            def _():
                window_block()

            @pl.when(n_i > 0)
            def _():
                inner_block()

            @pl.when(n_i == 0)
            def _():
                stack_update(jnp.zeros((1, 128), jnp.int32), None)
        else:
            window_block()
            inner_block()

    # ---- scheduler: treelet switch / packet drain / slot refill ----
    def advance(p):
        e = cur[p][0:1]
        typ = e & 3
        etid = jax.lax.shift_right_logical(e, 9)
        want = jnp.where(typ != 0, etid, _BIG)
        n_match = jnp.sum(
            ((etid == ctid_v[p][0:1]) & (typ != 0)).astype(jnp.int32))
        m_want = jnp.min(want)
        is_done = done[p] == 1
        # Iteration budget: force-drain long packets; unfinished lanes
        # are flagged in out row 7 (wanted tid + 1) and the HOST restarts
        # them from the root with tmax tightened to the partial tbest
        # (correct: a restart visits a subset of the remaining work).
        # This bounds the straggler tail — the packet-lockstep pathology
        # where 1-2 divergent lanes serialize dozens of treelet switches.
        if budget:
            over = cnt[2 * p] >= budget
        else:
            over = is_done & jnp.logical_not(is_done)  # False

        @pl.when(jnp.logical_not(is_done))
        def _count():
            cnt[2 * p] = cnt[2 * p] + chunk

        # no_switch (treelet-major phase mode): a slot may align its
        # table to the packet's wanted treelet ONCE right after refill
        # (the driver feeds tid-grouped packets, so this is the packet's
        # shared table); any later mismatch DRAINS the packet instead of
        # serializing table switches — the driver regroups lanes by
        # wanted treelet between rounds.
        if no_switch:
            may_switch = cnt[2 * p] <= chunk
        else:
            may_switch = jnp.logical_not(is_done)  # i.e. always

        @pl.when(jnp.logical_not(is_done) & (n_match == 0)
                 & (m_want < _BIG) & jnp.logical_not(over) & may_switch)
        def _switch():
            cnt[2 * p + 1] = cnt[2 * p + 1] + 1
            load_table(p, m_want)

        if no_switch:
            drain_cond = ((m_want >= _BIG) | over
                          | ((n_match == 0) & jnp.logical_not(may_switch)))
        else:
            drain_cond = (m_want >= _BIG) | over

        @pl.when(jnp.logical_not(is_done) & drain_cond)
        def _drain():
            # stage + write out, then refill or retire the slot
            out_stage[p, 0:1] = tbest[p][0:1]
            out_stage[p, 1:2] = i2f(tribest[p][0:1])
            out_stage[p, 2:3] = cbox[p][0:1].astype(jnp.float32)
            out_stage[p, 3:4] = ctri[p][0:1].astype(jnp.float32)
            out_stage[p, 4:5] = jnp.full((1, 128), cnt[2 * p], jnp.int32
                                         ).astype(jnp.float32)
            out_stage[p, 5:6] = jnp.full((1, 128), cnt[2 * p + 1], jnp.int32
                                         ).astype(jnp.float32)
            out_stage[p, 6:7] = aux[p][1:2].astype(jnp.float32)
            # row 7: 0 = lane finished; else wanted treelet id + 1 for
            # the host restart pass. Stack occupancy is top-contiguous,
            # so cur==NONE && top==NONE <=> nothing left. A lane whose
            # depth watermark neared STACK may have dropped far entries
            # (circular rolls) — flag it wanted-at-root; the restart
            # re-traverses everything under the tightened tmax.
            st_top0 = stk[p][0:1]
            live = (e != _NONE) | (st_top0 != _NONE)
            ovf = aux[p][1:2] > (STACK - 8)
            live_e = jnp.where(typ != 0, e, st_top0)
            wtid = jnp.where(
                live, jax.lax.shift_right_logical(live_e, 9),
                root_smem[0])
            out_stage[p, 7:8] = jnp.where(
                live | ovf, wtid + 1, 0).astype(jnp.float32)
            pkt = cursor[1 + p]
            cp = pltpu.make_async_copy(
                out_stage.at[p], out_hbm.at[pkt], sem_out.at[p])
            cp.start()
            cp.wait()
            # suspended continuation state -> state_out (a wave driver
            # regroups lanes by wanted treelet and resumes; finished
            # lanes carry cur==NONE + empty stack and drain instantly)
            st_stage[p, 0:1] = cur[p][0:1]
            st_stage[p, 1:2] = f2i(tbest[p][0:1])
            st_stage[p, 2:3] = tribest[p][0:1]
            st_stage[p, 3:4] = aux[p][0:1]
            st_stage[p, 4:5] = aux[p][1:2]
            st_stage[p, 5:5 + STACK] = stk[p]
            cp2 = pltpu.make_async_copy(
                st_stage.at[p], state_out.at[pkt], sem_state.at[p])
            cp2.start()
            cp2.wait()
            nxt = cursor[0]

            @pl.when(nxt < num_p)
            def _refill():
                cursor[0] = nxt + 1
                cursor[1 + p] = nxt
                load_rays(p, nxt)
                load_state(p, nxt)

            @pl.when(nxt >= num_p)
            def _retire():
                done[p] = 1

        return jnp.where(done[p] == 1, 0, 1)

    # ---- init: slot p starts on packet p ----
    cursor[0] = jnp.int32(c_slots)
    for p in range(c_slots):
        done[p] = jnp.where(p < num_p, 0, 1)
        cursor[1 + p] = jnp.int32(min(p, num_p - 1))

        @pl.when(done[p] == 0)
        def _(p=p):
            load_rays(p, jnp.int32(p))
            load_table(p, root_smem[0])
            load_state(p, jnp.int32(p))

    def outer_body(carry):
        it, _ = carry

        def chunk_body(i, _):
            for p in range(c_slots):
                @pl.when(done[p] == 0)
                def _(p=p):
                    iterate(p)
            return 0

        jax.lax.fori_loop(0, chunk, chunk_body, 0)
        alive = jnp.int32(0)
        for p in range(c_slots):
            alive = alive | advance(p)
        return it + 1, alive

    jax.lax.while_loop(
        lambda c: (c[1] != 0) & (c[0] < max_outer), outer_body,
        (jnp.int32(0), jnp.int32(1)))


SROWS = 5 + STACK  # continuation-state rows per packet (see _lane_kernel)


def init_state(root_tid, tmax, active=None):
    """Fresh continuation state [num_p, SROWS, 128] for a trace from the
    root: cur = root entry (NONE for inactive lanes), tbest = tmax,
    tribest = -1, empty stack."""
    num = tmax.shape[0]
    num_p = num // 128
    e0 = jnp.full((num,), (root_tid.astype(jnp.int32) << 9) | 1, jnp.int32)
    if active is not None:
        e0 = jnp.where(active, e0, _NONE)
        tmax = jnp.where(active, tmax, -_F32_MAX)
    f2i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
    rows = [e0.reshape(num_p, 1, 128),
            f2i(tmax).reshape(num_p, 1, 128),
            jnp.full((num_p, 1, 128), -1, jnp.int32),
            jnp.zeros((num_p, 2 + STACK, 128), jnp.int32)]
    return jnp.concatenate(rows, axis=1)


def trace_rays_lane_pallas(
    tb: TreeletBVH, packed: PackedPairs, rays: Rays, active=None,
    any_hit: bool = False, c_slots: int = None, raw: bool = False,
    chunk: int = None, budget: int = 0, state=None, no_switch: bool = False,
) -> Tuple[HitRecord, TraceStats]:
    """Closest-hit (or any-hit) trace against a TreeletBVH.

    Ray count must be a multiple of 128 (one packet per lane tile).
    Dead rays (active False) get an empty interval so nothing accepts.
    ``state``: optional [num_p, SROWS, 128] continuation state to RESUME
    from (see _lane_kernel); default = fresh from-the-root state. With
    raw=True the suspended state rides as a 4th return for wave drivers.
    """
    assert tb.leaf_width >= INNER_WIDTH
    assert tb.tables.shape[2] == 128, (
        "the lane kernel needs full 128-lane treelet tables "
        f"(got ecap={tb.tables.shape[2]})")
    lw = tb.leaf_width
    wh = tb.wh
    num_rays = rays.origin.shape[0]
    assert num_rays % 128 == 0, num_rays
    num_p = num_rays // 128
    cc = C if c_slots is None else c_slots
    ck = CHUNK if chunk is None else chunk

    tmin, tmax = rays.tmin, rays.tmax
    if active is not None:
        tmin = jnp.where(active, tmin, _F32_MAX)
        tmax = jnp.where(active, tmax, -_F32_MAX)
    rays8 = jnp.stack([
        rays.origin[:, 0].reshape(num_p, 128),
        rays.origin[:, 1].reshape(num_p, 128),
        rays.origin[:, 2].reshape(num_p, 128),
        rays.direction[:, 0].reshape(num_p, 128),
        rays.direction[:, 1].reshape(num_p, 128),
        rays.direction[:, 2].reshape(num_p, 128),
        tmin.reshape(num_p, 128),
        tmax.reshape(num_p, 128),
    ], axis=1)  # [num_p, 8, 128]
    if state is None:
        state = init_state(tb.root_tid, rays.tmax, active)

    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    root = tb.root_tid.reshape(1).astype(jnp.int32)
    # Iteration safety bound: generous (num_p packets x a full worst-case
    # traversal each) — the loop exits on drain, this only stops hangs.
    max_outer = 1 << 24

    out, state_out = pl.pallas_call(
        functools.partial(_lane_kernel, wh=wh, lw=lw, c_slots=cc,
                          any_hit=any_hit, max_outer=max_outer, chunk=ck,
                          budget=budget, no_switch=no_switch),
        in_specs=[hbm, hbm, hbm, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[hbm, hbm],
        out_shape=[jax.ShapeDtypeStruct((num_p, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((num_p, SROWS, 128), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((cc, wh, 128), jnp.float32),    # tab
            pltpu.VMEM((cc, 16, 128), jnp.float32),    # ray_scr
            pltpu.VMEM((cc, 8, 128), jnp.int32),       # cur
            pltpu.VMEM((cc, STACK, 128), jnp.int32),   # stk
            pltpu.VMEM((cc, 8, 128), jnp.float32),     # tbest
            pltpu.VMEM((cc, 8, 128), jnp.int32),       # tribest
            pltpu.VMEM((cc, 8, 128), jnp.int32),       # cbox
            pltpu.VMEM((cc, 8, 128), jnp.int32),       # ctri
            pltpu.VMEM((cc, 8, 128), jnp.int32),       # ctid_v
            pltpu.VMEM((cc, 8, 128), jnp.int32),       # aux
            pltpu.VMEM((cc, 8, 128), jnp.float32),     # out_stage
            pltpu.VMEM((cc, SROWS, 128), jnp.int32),   # st_stage
            pltpu.SMEM((cc,), jnp.int32),              # cur_tid
            pltpu.SMEM((cc,), jnp.int32),              # done
            pltpu.SMEM((1 + cc,), jnp.int32),          # cursor + slot pkt
            pltpu.SMEM((2 * cc,), jnp.int32),          # cnt iters/switches
            pltpu.SemaphoreType.DMA((cc,)),            # sem_tab
            pltpu.SemaphoreType.DMA((cc,)),            # sem_ray
            pltpu.SemaphoreType.DMA((cc,)),            # sem_out
            pltpu.SemaphoreType.DMA((cc,)),            # sem_state
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(tb.tables, rays8, state, root)

    t_flat = out[:, 0, :].reshape(num_rays)
    tri_flat = jax.lax.bitcast_convert_type(
        out[:, 1, :], jnp.int32).reshape(num_rays)
    stats = TraceStats(
        box_tests=out[:, 2, :].reshape(num_rays).astype(jnp.int32),
        tri_tests=out[:, 3, :].reshape(num_rays).astype(jnp.int32))
    if any_hit:
        t_flat = rays.tmax
    if raw:
        # third element: per-packet debug block (rows 4 iters, 5 treelet
        # switches, 6 max stack depth, 7 restart want) for probes/tests;
        # fourth: the suspended continuation state.
        return (t_flat, tri_flat), stats, out, state_out
    rec = _reconstruct(packed, rays, t_flat, tri_flat)
    return rec, stats


def _warn_unfinished(want, where: str) -> None:
    """ADVICE r4 low: a lane still flagged wanting work after the final
    recovery round silently drops hits (e.g. tiny TPURT_LANE_STACK with
    no tbest tightening between attempts). Expose it instead: debug-mode
    checkify invariant plus a host-side warning (works under jit via
    debug.callback; prints only when the count is nonzero)."""
    n = jnp.sum((want > 0).astype(jnp.int32))
    invariants.check(
        n == 0, "lane driver: lanes unfinished after RECOVER rounds "
                "(hits may be dropped)")

    def _cb(nv):
        if int(nv):
            import sys
            print(
                f"WARNING tpu_raytracing.lane_pallas [{where}]: {int(nv)} "
                f"lanes still unfinished after recovery rounds - hits may "
                f"be missing (raise TPURT_LANE_RECOVER or TPURT_LANE_STACK)",
                file=sys.stderr, flush=True)
    jax.debug.callback(_cb, n)


def trace_rays_lane_restart(
    tb: TreeletBVH, packed: PackedPairs, rays: Rays, active=None,
    any_hit: bool = False, c_slots: int = None, raw: bool = False,
    chunk: int = None, budgets=None,
) -> Tuple[HitRecord, TraceStats]:
    """Budget-restart driver over the lane kernel.

    The packet-lockstep pathology: one or two lanes whose rays diverge
    to distant treelets serialize dozens of treelet switches while the
    other ~126 lanes sit finished. Round 0 therefore runs every packet
    under an ITERATION BUDGET (kernel force-drain, see _lane_kernel);
    lanes cut off mid-traversal restart from the root in the next round,
    sorted so same-wanted-treelet rays share packets, with tmax
    tightened to the partial tbest. Restarting from the root is correct
    — a tighter tmax makes the re-traversal visit a subset of the
    original tree work, and the carried (t, tri) stands unless a new
    accepted hit beats it. The last round runs unbudgeted. No host
    syncs: every round is full-width with finished rays masked dead
    (all-dead packets drain in ~1 iteration).

    Stack-overflow recovery: an UNBUDGETED round can still flag lanes
    whose stack watermark neared STACK (circular rolls may have dropped
    far subtrees); RECOVER extra unbudgeted rounds re-run exactly those
    lanes from the root, so a too-small stack costs time, not hits.
    """
    from tpu_raytracing.ops.gather import take_rows

    if budgets is None:
        budgets = tuple(
            int(x) for x in _os.environ.get(
                "TPURT_LANE_BUDGETS", "128").split(",") if x)
    num = rays.origin.shape[0]
    (t, tri), stats, out, _ = trace_rays_lane_pallas(
        tb, packed, rays, active=active, any_hit=any_hit, raw=True,
        c_slots=c_slots, chunk=chunk, budget=budgets[0] if budgets else 0)
    want = out[:, 7, :].astype(jnp.int32).reshape(num)
    box, trit = stats.box_tests, stats.tri_tests
    for b in list(budgets[1:]) + [0] * (1 + RECOVER):
        key = jnp.where(want > 0, want, _BIG)
        perm = jnp.argsort(key)
        inv = jnp.argsort(perm)
        sub = jax.tree.map(lambda a: take_rows(a, perm), rays)
        sub = sub.replace(tmax=jnp.minimum(sub.tmax, t[perm]))
        act2 = (want > 0)[perm]
        (t2, tri2), st2, out2, _ = trace_rays_lane_pallas(
            tb, packed, sub, active=act2, any_hit=any_hit, raw=True,
            c_slots=c_slots, chunk=chunk, budget=b)
        improved = (tri2 >= 0)[inv]
        t = jnp.where(improved, t2[inv], t)
        tri = jnp.where(improved, tri2[inv], tri)
        box = box + st2.box_tests[inv]
        trit = trit + st2.tri_tests[inv]
        want = out2[:, 7, :].astype(jnp.int32).reshape(num)[inv]
    _warn_unfinished(want, "restart")
    stats = TraceStats(box_tests=box, tri_tests=trit)
    if any_hit:
        t = rays.tmax
    if raw:
        return (t, tri), stats, want
    rec = _reconstruct(packed, rays, t, tri)
    return rec, stats


def trace_rays_lane_wave(
    tb: TreeletBVH, packed: PackedPairs, rays: Rays, active=None,
    any_hit: bool = False, c_slots: int = None, raw: bool = False,
    chunk: int = None, budgets=None,
) -> Tuple[HitRecord, TraceStats]:
    """Suspend/resume wavefront driver — the utilization fix.

    The lane kernel's measured wall is lane-slot utilization (~9% at 1M:
    a packet's 128 lanes diverge across treelets and the scheduler
    serves one treelet at a time, so most lanes stall most iterations —
    docs/TPU_NOTES.md "Lane kernel on hardware"). Each round here runs
    under an iteration budget; at drain the kernel exports every lane's
    FULL continuation state (entry word + stack + tbest — _lane_kernel
    state rows), the driver regroups rays by the treelet they want next
    (finished rays sink to the back), and the next round RESUMES each
    lane exactly where it stopped: zero re-traversal, and round-start
    packets are single-treelet coherent. The last round runs unbudgeted.

    Overflow recovery: a lane whose stack watermark neared STACK may
    have dropped far entries (circular rolls); between rounds it is
    reset to a from-the-root restart with its carried (t, tri) standing
    — correct because the tightened tmax makes the re-traversal visit a
    subset of the remaining work.
    """
    from tpu_raytracing.ops.gather import take_rows

    if budgets is None:
        budgets = tuple(
            int(x) for x in _os.environ.get(
                "TPURT_LANE_WAVE_BUDGETS", "48,48,48").split(",") if x)
    num = rays.origin.shape[0]
    num_p = num // 128
    root = tb.root_tid.astype(jnp.int32)
    orig = jnp.arange(num, dtype=jnp.int32)
    cur_rays, cur_act, state = rays, active, None
    box = jnp.zeros((num,), jnp.int32)
    trit = jnp.zeros((num,), jnp.int32)
    # Post-final rounds: an unbudgeted round completes every lane EXCEPT
    # those flagged overflowed (out row 7) — the regroup below resets
    # them to from-the-root restarts and the next unbudgeted round
    # re-runs them (RECOVER attempts; see the module RECOVER comment).
    rounds = list(budgets) + [0] * (1 + RECOVER)
    for i, b in enumerate(rounds):
        (t, tri), st2, out, state = trace_rays_lane_pallas(
            tb, packed, cur_rays, active=cur_act, any_hit=any_hit,
            raw=True, c_slots=c_slots, chunk=chunk, budget=b, state=state)
        box = box + st2.box_tests
        trit = trit + st2.tri_tests
        if i == len(rounds) - 1:
            break
        want = out[:, 7, :].astype(jnp.int32).reshape(num)
        mxd = out[:, 6, :].astype(jnp.int32).reshape(num)
        ovf = (want > 0) & (mxd > STACK - 8)
        # reset overflowed lanes: row 0 -> root entry, rows 3+ -> empty;
        # tbest/tribest (rows 1-2) stand
        rowi = jax.lax.broadcasted_iota(jnp.int32, (1, SROWS, 1), 1)
        st_reset = jnp.where(rowi == 0, (root << 9) | 1,
                             jnp.where(rowi < 3, state, 0))
        state = jnp.where(
            jnp.broadcast_to(ovf.reshape(num_p, 1, 128),
                             (num_p, SROWS, 128)),
            st_reset, state)
        want = jnp.where(ovf, root + 1, want)
        key = jnp.where(want > 0, want, _BIG)
        perm = jnp.argsort(key, stable=True)
        # permute rays + per-ray state columns + accumulators together
        pst = state.transpose(0, 2, 1).reshape(num, SROWS)
        pst = take_rows(pst, perm)
        state = pst.reshape(num_p, 128, SROWS).transpose(0, 2, 1)
        cur_rays = jax.tree.map(lambda a: take_rows(a, perm), cur_rays)
        box, trit, orig = box[perm], trit[perm], orig[perm]
        cur_act = None  # liveness rides in the state (cur/stack/tbest)
    _warn_unfinished(out[:, 7, :].astype(jnp.int32).reshape(num), "wave")
    inv = jnp.argsort(orig)
    t, tri = t[inv], tri[inv]
    stats = TraceStats(box_tests=box[inv], tri_tests=trit[inv])
    if any_hit:
        t = rays.tmax
    if raw:
        return (t, tri), stats
    rec = _reconstruct(packed, rays, t, tri)
    return rec, stats


def trace_rays_lane_phase(
    tb: TreeletBVH, packed: PackedPairs, rays: Rays, active=None,
    any_hit: bool = False, c_slots: int = None, raw: bool = False,
    chunk: int = None, budgets=None, phases: int = None,
) -> Tuple[HitRecord, TraceStats]:
    """Treelet-MAJOR scheduling: the round-4 utilization design.

    The wave driver regroups lanes by wanted treelet but each round
    still serializes table switches once lanes re-diverge, so measured
    utilization stayed ~9% (docs/TPU_NOTES.md round 4). This driver
    removes in-round switching entirely: every round runs the kernel in
    ``no_switch`` mode — a slot aligns its table to its packet's wanted
    treelet once at refill, then any all-lane mismatch DRAINS the packet
    (full continuation state out). Between rounds lanes are regrouped by
    wanted treelet, so each round's packets are single-treelet tiles and
    a resident table always serves lanes that want exactly it. A final
    switching round (plus RECOVER overflow re-runs) completes the
    stragglers. ``phases`` bounds the no-switch rounds
    (TPURT_LANE_PHASES, default 10).
    """
    from tpu_raytracing.ops.gather import take_rows

    del budgets
    if phases is None:
        phases = int(_os.environ.get("TPURT_LANE_PHASES", "10"))
    num = rays.origin.shape[0]
    num_p = num // 128
    root = tb.root_tid.astype(jnp.int32)
    orig = jnp.arange(num, dtype=jnp.int32)
    cur_rays, cur_act, state = rays, active, None
    box = jnp.zeros((num,), jnp.int32)
    trit = jnp.zeros((num,), jnp.int32)
    rounds = [True] * phases + [False] * (1 + RECOVER)
    for i, ns in enumerate(rounds):
        (t, tri), st2, out, state = trace_rays_lane_pallas(
            tb, packed, cur_rays, active=cur_act, any_hit=any_hit,
            raw=True, c_slots=c_slots, chunk=chunk, budget=0, state=state,
            no_switch=ns)
        box = box + st2.box_tests
        trit = trit + st2.tri_tests
        if i == len(rounds) - 1:
            break
        want = out[:, 7, :].astype(jnp.int32).reshape(num)
        mxd = out[:, 6, :].astype(jnp.int32).reshape(num)
        ovf = (want > 0) & (mxd > STACK - 8)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (1, SROWS, 1), 1)
        st_reset = jnp.where(rowi == 0, (root << 9) | 1,
                             jnp.where(rowi < 3, state, 0))
        state = jnp.where(
            jnp.broadcast_to(ovf.reshape(num_p, 1, 128),
                             (num_p, SROWS, 128)),
            st_reset, state)
        want = jnp.where(ovf, root + 1, want)
        key = jnp.where(want > 0, want, _BIG)
        perm = jnp.argsort(key, stable=True)
        pst = state.transpose(0, 2, 1).reshape(num, SROWS)
        pst = take_rows(pst, perm)
        state = pst.reshape(num_p, 128, SROWS).transpose(0, 2, 1)
        cur_rays = jax.tree.map(lambda a: take_rows(a, perm), cur_rays)
        box, trit, orig = box[perm], trit[perm], orig[perm]
        cur_act = None
    _warn_unfinished(out[:, 7, :].astype(jnp.int32).reshape(num), "phase")
    inv = jnp.argsort(orig)
    t, tri = t[inv], tri[inv]
    stats = TraceStats(box_tests=box[inv], tri_tests=trit[inv])
    if any_hit:
        t = rays.tmax
    if raw:
        return (t, tri), stats
    rec = _reconstruct(packed, rays, t, tri)
    return rec, stats


# Driver over the kernel (TPURT_LANE_DRIVER): 'wave' = suspend/resume
# rounds with treelet regrouping (default), 'phase' = no-switch
# treelet-major rounds (trace_rays_lane_phase), 'restart' = budget
# rounds restarting from the root, 'single' = one unbudgeted launch.
DRIVER = _os.environ.get("TPURT_LANE_DRIVER", "wave")


def make_lane_tracer(any_hit: bool = False, c_slots: int = None,
                     chunk: int = None, budgets=None, driver: str = None):
    """Tracer with the (trav, pairs, rays, active) signature the render
    pipeline expects — trav is the TreeletBVH. Any ray count: non-128-
    multiple batches are edge-padded with dead rays (empty [tmax, tmin]
    interval, active False) and the outputs sliced back."""
    drv = DRIVER if driver is None else driver
    # 'single' = one unbudgeted launch, but still through the restart
    # driver with an empty budget list so flagged stack-overflow lanes
    # get the RECOVER re-runs (a bare trace_rays_lane_pallas call has no
    # recovery and could silently drop hits with a small STACK).
    fn = {"wave": trace_rays_lane_wave,
          "phase": trace_rays_lane_phase,
          "restart": trace_rays_lane_restart,
          "single": trace_rays_lane_restart}[drv]
    if drv == "single":
        budgets = ()

    def tracer(tb, pairs, rays, max_width=2, active=None):
        del max_width
        num = rays.origin.shape[0]
        pad = (-num) % 128
        if pad:
            ext = lambda a: jnp.concatenate(  # noqa: E731
                [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])])
            rays = jax.tree.map(ext, rays)
            act = jnp.ones((num,), bool) if active is None else active
            active = jnp.concatenate([act, jnp.zeros((pad,), bool)])
        rec, stats = fn(
            tb, pairs, rays, active=active, any_hit=any_hit,
            c_slots=c_slots, chunk=chunk, budgets=budgets)
        if pad:
            rec = jax.tree.map(lambda a: a[:num], rec)
            stats = jax.tree.map(lambda a: a[:num], stats)
        return rec, stats
    return tracer
