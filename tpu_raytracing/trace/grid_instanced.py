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
    overflow [] int32). ``overflow`` > 0 means the (ray, instance) work
    list exceeded ``work_factor * R`` items — hits may be missing;
    callers host-check via check_instanced_grid_capacity. ``m_cand`` is
    accepted for API compatibility and ignored (the dense sweep has no
    per-ray candidate limit)."""
    num = rays.origin.shape[0]
    n_inst = ias.inst_min.shape[0]
    ox, oy, oz = (rays.origin[:, i] for i in range(3))
    dx, dy, dz = (rays.direction[:, i] for i in range(3))
    safe = lambda a: jnp.where(jnp.abs(a) < 1e-20, 1e-20, a)  # noqa: E731
    ivx, ivy, ivz = 1.0 / safe(dx), 1.0 / safe(dy), 1.0 / safe(dz)

    # --- phase 1: candidate sweep — dense [I, R] overlap mask, built in
    # instance CHUNKS of a static python loop. The original fori_loop
    # carried m_cand+1 flat [R] slot arrays and REWROTE all of them
    # every instance iteration — the documented carried-operand
    # pathology made the 1k-instance sweep ~10 s at 262k rays (round-4
    # measurement); the dense mask is pure elementwise work and one
    # compaction, and its instance-major order groups the work list by
    # instance so the BLAS grid pass sees object-space-coherent items.
    del m_cand  # kept in the signature for API compatibility
    ch = 128
    masks = []
    for c0 in range(0, n_inst, ch):
        c1 = min(c0 + ch, n_inst)
        lo = ias.inst_min[c0:c1]                        # [C, 3]
        hi = ias.inst_max[c0:c1]
        t0x = (lo[:, 0:1] - ox[None, :]) * ivx[None, :]  # [C, R]
        t1x = (hi[:, 0:1] - ox[None, :]) * ivx[None, :]
        t0y = (lo[:, 1:2] - oy[None, :]) * ivy[None, :]
        t1y = (hi[:, 1:2] - oy[None, :]) * ivy[None, :]
        t0z = (lo[:, 2:3] - oz[None, :]) * ivz[None, :]
        t1z = (hi[:, 2:3] - oz[None, :]) * ivz[None, :]
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z),
                                     rays.tmin[None, :]))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z),
                                     rays.tmax[None, :]))
        masks.append(tn <= tf)
    live = jnp.concatenate(masks).reshape(-1)           # [I * R]

    # --- phase 2: work-item expansion (instance-major) ---
    work_cap = min(max(work_factor * num, 1024), n_inst * num)
    (widx,) = jnp.nonzero(live, size=work_cap, fill_value=n_inst * num)
    n_work = jnp.sum(live.astype(jnp.int32))
    overflow = jnp.maximum(n_work - work_cap, 0)
    sidx = jnp.minimum(widx, n_inst * num - 1)
    in_cap = widx < n_inst * num
    ray_id = jnp.where(in_cap, sidx % num, num)  # num = drop
    inst = sidx // num
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
