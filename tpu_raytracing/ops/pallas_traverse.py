"""Pallas BVH traversal kernel — per-packet control flow on the TensorCore.

The XLA wavefront tracers advance every packet in lockstep: each while_loop
step pays for all packets (dense masked math) until the slowest packet
drains. This kernel gives every packet its own program (grid = packets), its
own scalar stack in SMEM and its own trip count, so total work equals the
sum of per-packet traversal lengths instead of packets x max-trip:

* grid over packets; the packet's 128 rays live in VMEM blocks with the ray
  axis on the 128-lane dimension;
* one fat wide-node row (8 entries: box + inlined pair geometry) is DMA'd
  from HBM per pop into a VMEM scratch and read back as broadcast scalars;
* the traversal stack is an SMEM int32 array driven by scalar ops, and the
  pop/push loop is a lax.while_loop with genuinely dynamic trip count.

Box children are sorted by packet-min entry distance with a scalar
compare-swap network and pushed far-to-near, so the nearest child pops
first (the reference's ordering rule at packet granularity).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_raytracing.bvh.types import CHILD_BOX, CHILD_TRI
from tpu_raytracing.bvh.wide import WIDE, FatWideBVH
from tpu_raytracing.trace.brute import HitRecord
from tpu_raytracing.trace.ray import Rays
from tpu_raytracing.trace.traverse import (
    _META_CHILD_SHIFT,
    _META_COUNT_MASK,
    _META_COUNT_SHIFT,
    _META_TYPE_MASK,
    TraceStats,
)

K = 128  # rays per packet = lane width

# Optimal 8-input sorting network (19 comparators).
_PUSH_NETWORK = [
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7),
    (1, 5), (2, 6),
    (1, 4), (3, 6),
    (2, 4), (3, 5),
    (3, 4),
]
STACK = 64
_TRI_EPS = 1e-9
_F32_MAX = float(jnp.finfo(jnp.float32).max)


def pad_rows_256(rows: jnp.ndarray):
    """[W, 192] fat rows -> ([W, 256] i32, [W, 256] f32 bit view).

    Mosaic has no scalar bitcast, so the kernel DMAs two typed views of the
    same words and reads ints (metadata/ids) from one and floats (geometry)
    from the other.
    """
    w = rows.shape[0]
    padded = jnp.pad(rows, ((0, 0), (0, 256 - rows.shape[1]))).reshape(w, 2, 128)
    return padded, jax.lax.bitcast_convert_type(padded, jnp.float32)


def _kernel(rows_i_hbm, rows_f_hbm, ox, oy, oz, dx, dy, dz, tmn, tmx0,
            hit_o, t_o, prim_o, tri_o, u_o, v_o,
            row_i, row_f, sem_i, sem_f, stack):
    # safe inverse: 0*inf=NaN and TPU min/max propagate NaN (CUDA
    # fminf ignores it) - axis-aligned rays would prune real subtrees
    def _safe(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                               jnp.where(d < 0, -1e-30, 1e-30), d)

    invx = _safe(dx[:])
    invy = _safe(dy[:])
    invz = _safe(dz[:])

    stack[0] = jnp.int32(0)
    # Vector state lives in the output refs (Mosaic while loops carry
    # scalars only); initialize before the loop.
    hit_o[:] = jnp.zeros_like(hit_o)
    t_o[:] = tmx0[:]
    prim_o[:] = jnp.zeros_like(prim_o)
    tri_o[:] = jnp.zeros_like(tri_o)
    u_o[:] = jnp.zeros_like(u_o)
    v_o[:] = jnp.zeros_like(v_o)

    def cond(sp):
        return sp > 0

    def body(sp):
        sp = sp - 1
        node = stack[sp]

        dma_i = pltpu.make_async_copy(rows_i_hbm.at[node], row_i, sem_i)
        dma_f = pltpu.make_async_copy(rows_f_hbm.at[node], row_f, sem_f)
        dma_i.start()
        dma_f.start()
        dma_i.wait()
        dma_f.wait()

        def word(w):
            return row_i[w // 128, w % 128]

        def fword(w):
            return row_f[w // 128, w % 128]

        t = t_o[:]
        hit = hit_o[:] != 0
        cand_d = []
        cand_c = []
        for e in range(WIDE):
            meta = word(e * 8 + 6)
            ntype = meta & _META_TYPE_MASK
            child = meta >> _META_CHILD_SHIFT
            ccount = (meta >> _META_COUNT_SHIFT) & _META_COUNT_MASK

            fx0, fy0, fz0 = fword(e * 8 + 0), fword(e * 8 + 1), fword(e * 8 + 2)
            fx1, fy1, fz1 = fword(e * 8 + 3), fword(e * 8 + 4), fword(e * 8 + 5)

            tx0 = (fx0 - ox[:]) * invx
            tx1 = (fx1 - ox[:]) * invx
            ty0 = (fy0 - oy[:]) * invy
            ty1 = (fy1 - oy[:]) * invy
            tz0 = (fz0 - oz[:]) * invz
            tz1 = (fz1 - oz[:]) * invz
            front = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            back = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            box_hit = (back >= front) & (front <= t) & (back >= tmn[:])
            any_hit = jnp.any(box_hit)

            is_leaf = ntype == CHILD_TRI
            p = 64 + e * 16
            ax, ay, az = fword(p + 0), fword(p + 1), fword(p + 2)
            bx, by, bz = fword(p + 3), fword(p + 4), fword(p + 5)
            cx, cy, cz = fword(p + 6), fword(p + 7), fword(p + 8)
            qx3, qy3, qz3 = fword(p + 9), fword(p + 10), fword(p + 11)
            p0 = word(p + 12)
            p1 = word(p + 13)

            def mt(v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z):
                e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
                e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
                hx = dy[:] * e2z - dz[:] * e2y
                hy = dz[:] * e2x - dx[:] * e2z
                hz = dx[:] * e2y - dy[:] * e2x
                det = e1x * hx + e1y * hy + e1z * hz
                degen = (det > -_TRI_EPS) & (det < _TRI_EPS)
                f = 1.0 / det
                sx, sy, sz = ox[:] - v0x, oy[:] - v0y, oz[:] - v0z
                uu = f * (sx * hx + sy * hy + sz * hz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                vv = f * (dx[:] * qx + dy[:] * qy + dz[:] * qz)
                tt = f * (e2x * qx + e2y * qy + e2z * qz)
                acc = (
                    ~degen & (uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0)
                    & (uu + vv <= 1.0) & (tt >= tmn[:]) & (tt <= t)
                )
                return acc, tt, uu, vv

            leaf_lanes = box_hit & is_leaf
            acc, tt, uu, vv = mt(ax, ay, az, bx, by, bz, cx, cy, cz)
            take = leaf_lanes & acc
            t = jnp.where(take, tt, t)
            hit = hit | take
            prim_o[:] = jnp.where(take, p0, prim_o[:])
            tri_o[:] = jnp.where(take, child << 1, tri_o[:])
            u_o[:] = jnp.where(take, uu, u_o[:])
            v_o[:] = jnp.where(take, vv, v_o[:])

            acc, tt, uu, vv = mt(cx, cy, cz, bx, by, bz, qx3, qy3, qz3)
            take = leaf_lanes & (ccount > 0) & acc
            t = jnp.where(take, tt, t)
            hit = hit | take
            prim_o[:] = jnp.where(take, p1, prim_o[:])
            tri_o[:] = jnp.where(take, (child << 1) + 1, tri_o[:])
            u_o[:] = jnp.where(take, uu, u_o[:])
            v_o[:] = jnp.where(take, vv, v_o[:])

            # Collect interior candidates with their packet-min distance.
            do_push = any_hit & (ntype == CHILD_BOX)
            dist_e = jnp.min(jnp.where(box_hit, front, _F32_MAX))
            cand_d.append(jnp.where(do_push, dist_e, -_F32_MAX))
            cand_c.append(jnp.where(do_push, child, -1))

        # Scalar sort network, descending by distance (ties: higher id
        # nearer, src/Tracer.cu:346-347), then push far-to-near.
        for a, b in _PUSH_NETWORK:
            swap = (cand_d[a] < cand_d[b]) | (
                (cand_d[a] == cand_d[b]) & (cand_c[a] > cand_c[b])
            )
            da = jnp.where(swap, cand_d[b], cand_d[a])
            db = jnp.where(swap, cand_d[a], cand_d[b])
            ca = jnp.where(swap, cand_c[b], cand_c[a])
            cb = jnp.where(swap, cand_c[a], cand_c[b])
            cand_d[a], cand_d[b] = da, db
            cand_c[a], cand_c[b] = ca, cb

        for e in range(WIDE):
            ok = (cand_c[e] >= 0) & (sp < STACK - 1)

            @pl.when(ok)
            def _():
                stack[sp] = cand_c[e]

            sp = sp + ok.astype(jnp.int32)

        t_o[:] = t
        hit_o[:] = hit.astype(jnp.int32)
        return sp

    jax.lax.while_loop(cond, body, jnp.int32(1))


def trace_rays_pallas(
    rows256,
    rays: Rays,
    active=None,
) -> Tuple[HitRecord, TraceStats]:
    """Trace ray packets with the Pallas kernel.

    rows256: the (int view, float view) pair from pad_rows_256. Ray count
    must be a multiple of 128. Dead rays (active False) get tmax < tmin, so
    their lanes never hit and all-dead packets drain in one pop.
    """
    rows_i, rows_f = rows256
    num_rays = rays.origin.shape[0]
    assert num_rays % K == 0
    num_p = num_rays // K

    def comp(a, c):
        # [num_p, 1, K]: TPU block specs need the trailing dims to be whole
        # (the middle 1 equals the array dim; the last is the 128 lanes).
        return a[:, c].reshape(num_p, 1, K)

    tmax = rays.tmax
    if active is not None:
        tmax = jnp.where(active, tmax, -1.0)

    block = pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((num_p, 1, K), jnp.int32),   # hit
        jax.ShapeDtypeStruct((num_p, 1, K), jnp.float32),  # t
        jax.ShapeDtypeStruct((num_p, 1, K), jnp.int32),   # prim
        jax.ShapeDtypeStruct((num_p, 1, K), jnp.int32),   # tri
        jax.ShapeDtypeStruct((num_p, 1, K), jnp.float32),  # u
        jax.ShapeDtypeStruct((num_p, 1, K), jnp.float32),  # v
    ]
    hit, t, prim, tri, u, v = pl.pallas_call(
        _kernel,
        grid=(num_p,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2 + [block] * 8,
        out_specs=[block] * 6,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((2, 128), jnp.int32),
            pltpu.SMEM((2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((STACK,), jnp.int32),
        ],
    )(
        rows_i, rows_f,
        comp(rays.origin, 0), comp(rays.origin, 1), comp(rays.origin, 2),
        comp(rays.direction, 0), comp(rays.direction, 1), comp(rays.direction, 2),
        rays.tmin.reshape(num_p, 1, K), tmax.reshape(num_p, 1, K),
    )

    flat = lambda a: a.reshape(num_rays)  # noqa: E731
    rec = HitRecord(
        hit=flat(hit).astype(bool),
        t=flat(t),
        prim_id=flat(prim),
        tri_id=flat(tri),
        bary_u=flat(u),
        bary_v=flat(v),
    )
    zeros = jnp.zeros((num_rays,), jnp.int32)
    return rec, TraceStats(box_tests=zeros, tri_tests=zeros)


def make_pallas_tracer(rows256, width: int, height: int):
    """Tiled drop-in tracer using the Pallas kernel (128-ray screen tiles).

    With rows256=None the (int, float) row views ride in the tracer's
    ``trav`` argument — REQUIRED for jitted callers at scale, otherwise the
    closure embeds the row arrays as compile-time constants (gigabytes in
    the compiled module).
    """
    from tpu_raytracing.trace.packet import tile_reorder, tile_restore

    def tracer(trav, pairs, rays, max_width=2, active=None):
        del pairs, max_width
        rows = rows256 if rows256 is not None else trav
        tiled = jax.tree.map(lambda a: tile_reorder(a, width, height, 16, 8), rays)
        act = None if active is None else tile_reorder(active, width, height, 16, 8)
        rec, stats = trace_rays_pallas(rows, tiled, active=act)
        rec = jax.tree.map(lambda a: tile_restore(a, width, height, 16, 8), rec)
        return rec, stats

    return tracer
