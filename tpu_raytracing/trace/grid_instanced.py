"""Two-level instanced tracing on the uniform grid — stackless wavefront.

The stack-based instanced tracer (trace/instanced.py) inherits the
packet kernel's per-pop scalar-control wall and its packet-union waste.
This module re-poses instancing as two dense phases with no stack and
no per-node decisions, the same move the uniform grid made for the
single-level tracers (bvh/grid.py):

1. CANDIDATE SWEEP: every ray slab-tests every instance's world AABB
   (a fori_loop over instances; ~12 flat [R] ops each — exact, ordered
   work, O(R * I), the right trade below a few thousand instances; a
   TLAS-level grid would drop the I factor if instance counts grow).
   Overlaps insert the instance id into M per-ray candidate slots held
   as M flat [R] arrays (an [R, M] buffer would tile-pad M -> 128).
2. WORK-ITEM EXPANSION + ONE BLAS GRID PASS: the (ray, instance)
   pairs compact into a flat work list (static cap + host guard, the
   check_grid_capacity pattern); each item maps its ray through the
   instance's inverse transform (direction left unnormalized so t
   stays parameterized on the world ray, exactly like
   trace/instanced.py:85-89) and ALL items trace the shared
   object-space BLAS grid in ONE trace_rays_grid call. Per-ray winners
   reduce back with two scatter-mins (min t, then min item index among
   the t-winners for deterministic ties).

Closest-hit cannot early-terminate across an individual ray's
instances (items trace independently), but items are bounded by the
ray's own tmax and the reduction is exact — hits match the stack
tracer bit-for-bit wherever the winning (t, instance) is unique.

Reference capability being extended: ChildType_Inst is declared but
never built in the reference (src/Common.cuh:40); see bvh/tlas.py.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from tpu_raytracing.bvh.grid import UniformGrid, build_grid
from tpu_raytracing.bvh.tlas import instance_world_aabbs, invert_affine
from tpu_raytracing.trace.brute import HitRecord
from tpu_raytracing.trace.grid_trace import trace_rays_grid
from tpu_raytracing.trace.ray import Rays
from tpu_raytracing.trace.traverse import PackedPairs, TraceStats

_F32_MAX = float(jnp.finfo(jnp.float32).max)


@flax.struct.dataclass
class InstancedGridAS:
    """Shared-BLAS instancing over the uniform grid."""

    blas_grid: UniformGrid       # object-space grid over the mesh pairs
    inst_min: jnp.ndarray        # [I, 3] instance world AABBs
    inst_max: jnp.ndarray        # [I, 3]
    inv_transforms: jnp.ndarray  # [I, 3, 4] object<-world


def build_instanced_grid(
    pairs: PackedPairs,
    transforms: jnp.ndarray,
    res=None,
) -> InstancedGridAS:
    """Build the object-space BLAS grid over the mesh pair rows plus the
    per-instance world AABBs/inverse transforms.

    transforms: [I, 3, 4] world<-object affine per instance.
    """
    rows = pairs.rows
    v = jax.lax.bitcast_convert_type(rows[:, :12], jnp.float32)
    v3 = v.reshape(rows.shape[0], 4, 3)
    bmin = jnp.min(v3, axis=(0, 1))
    bmax = jnp.max(v3, axis=(0, 1))
    grid = build_grid(rows, jnp.int32(rows.shape[0]), res=res)
    wmin, wmax = instance_world_aabbs(bmin, bmax, transforms)
    return InstancedGridAS(
        blas_grid=grid, inst_min=wmin, inst_max=wmax,
        inv_transforms=invert_affine(transforms))


def trace_rays_instanced_grid(
    ias: InstancedGridAS,
    pairs: PackedPairs,
    rays: Rays,
    m_cand: int = 8,
    work_factor: int = 4,
    any_hit: bool = False,
    block: int = 4,
) -> Tuple[HitRecord, jnp.ndarray, TraceStats, jnp.ndarray]:
    """Closest-hit (or any-hit) over the instanced grid.

    Returns (HitRecord, hit_instance [R] int32 (-1 = none), stats,
    overflow [] int32). ``overflow`` > 0 means a ray overlapped more
    than ``m_cand`` instance AABBs or the work list exceeded
    ``work_factor * R`` items — hits may be missing; callers host-check
    via check_instanced_grid_capacity."""
    num = rays.origin.shape[0]
    n_inst = ias.inst_min.shape[0]
    ox, oy, oz = (rays.origin[:, i] for i in range(3))
    dx, dy, dz = (rays.direction[:, i] for i in range(3))
    safe = lambda a: jnp.where(jnp.abs(a) < 1e-20, 1e-20, a)  # noqa: E731
    ivx, ivy, ivz = 1.0 / safe(dx), 1.0 / safe(dy), 1.0 / safe(dz)

    # --- phase 1: candidate sweep (M flat [R] slot arrays) ---
    def sweep(i, carry):
        cnt, over, *slots = carry
        lo = ias.inst_min[i]
        hi = ias.inst_max[i]
        t0x, t1x = (lo[0] - ox) * ivx, (hi[0] - ox) * ivx
        t0y, t1y = (lo[1] - oy) * ivy, (hi[1] - oy) * ivy
        t0z, t1z = (lo[2] - oz) * ivz, (hi[2] - oz) * ivz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), rays.tmin))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), rays.tmax))
        ov = tn <= tf
        new_slots = []
        for j, s in enumerate(slots):
            new_slots.append(jnp.where(ov & (cnt == j), i, s))
        over = over + jnp.sum((ov & (cnt >= m_cand)).astype(jnp.int32))
        cnt = cnt + ov.astype(jnp.int32)
        return (cnt, over, *new_slots)

    init = (jnp.zeros((num,), jnp.int32), jnp.zeros((), jnp.int32),
            *[jnp.full((num,), -1, jnp.int32) for _ in range(m_cand)])
    cnt, overflow, *slots = jax.lax.fori_loop(0, n_inst, sweep, init)

    # --- phase 2: work-item expansion (slot-major 1-D concat) ---
    cand_flat = jnp.concatenate(slots)            # [M * R]
    live = cand_flat >= 0
    work_cap = min(max(work_factor * num, 1024), m_cand * num)
    (widx,) = jnp.nonzero(live, size=work_cap, fill_value=m_cand * num)
    n_work = jnp.sum(live.astype(jnp.int32))
    overflow = overflow + jnp.maximum(n_work - work_cap, 0)
    sidx = jnp.minimum(widx, m_cand * num - 1)
    ray_id = jnp.where(widx < m_cand * num, sidx % num, num)  # num = drop
    inst = cand_flat[sidx]
    g = lambda a: a[jnp.minimum(ray_id, num - 1)]  # noqa: E731
    tf = ias.inv_transforms[jnp.maximum(inst, 0)]  # [W, 3, 4]
    worig = jnp.einsum("wjk,wk->wj", tf[:, :, :3], g(rays.origin)) \
        + tf[:, :, 3]
    wdir = jnp.einsum("wjk,wk->wj", tf[:, :, :3], g(rays.direction))
    wrays = Rays(origin=worig, direction=wdir,
                 tmin=g(rays.tmin), tmax=g(rays.tmax))
    valid = ray_id < num

    rec_w, st_w = trace_rays_grid(
        ias.blas_grid, pairs, wrays, active=valid, any_hit=any_hit,
        block=block)

    # --- per-ray reduction: min t, then min item index among winners ---
    whit = rec_w.hit & valid
    wt = jnp.where(whit, rec_w.t, _F32_MAX)
    min_t = jnp.full((num,), _F32_MAX, jnp.float32).at[ray_id].min(
        wt, mode="drop")
    big = jnp.int32(work_cap)
    iota = jnp.arange(work_cap, dtype=jnp.int32)
    is_win = whit & (wt <= min_t[jnp.minimum(ray_id, num - 1)])
    win_idx = jnp.full((num,), big, jnp.int32).at[
        jnp.where(is_win, ray_id, num)].min(iota, mode="drop")
    got = win_idx < big
    wsel = jnp.minimum(win_idx, work_cap - 1)
    pick = lambda a, d: jnp.where(got, a[wsel], d)  # noqa: E731
    rec = HitRecord(
        hit=got,
        t=jnp.where(got, rec_w.t[wsel], rays.tmax),
        prim_id=pick(rec_w.prim_id, jnp.int32(0)),
        tri_id=pick(rec_w.tri_id, jnp.int32(0)),
        bary_u=pick(rec_w.bary_u, jnp.float32(0)),
        bary_v=pick(rec_w.bary_v, jnp.float32(0)),
    )
    inst_id = jnp.where(got, inst[wsel], -1)
    zero = jnp.zeros((num,), jnp.int32)
    stats = TraceStats(
        box_tests=jnp.full((num,), n_inst, jnp.int32)
        + zero.at[ray_id].add(st_w.box_tests, mode="drop"),
        tri_tests=zero.at[ray_id].add(st_w.tri_tests, mode="drop"),
    )
    return rec, inst_id, stats, overflow


def check_instanced_grid_capacity(overflow) -> None:
    """Host-fetch guard: raises if candidate slots or the work list
    overflowed their static bounds (missing hits otherwise)."""
    ov = int(overflow)
    if ov > 0:
        raise RuntimeError(
            f"instanced-grid overflow: {ov} (ray, instance) pairs past "
            f"m_cand / work_factor — raise them "
            f"(trace/grid_instanced.py)")
