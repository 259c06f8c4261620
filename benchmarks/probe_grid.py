"""Uniform-grid DDA vs the split-Pallas kernel on the bounce workload.

Builds both structures over the SAME sorted pair rows (so tri ids are
interchangeable), derives the bounce ray set exactly like bench.py's
frame (primary hits -> cosine bounce, cell+octant sorted), then times:
  * grid build (full rebuild path for animated scenes)
  * bounce closest-hit: split kernel vs grid DDA
  * bounce shadows (any-hit): split kernel vs grid DDA
Also reports per-ray step/test counts for the grid.

Usage: TPURT_BENCH_TRIS=... python benchmarks/probe_grid.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TPURT_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    res = int(os.environ.get("TPURT_BENCH_RES", 1024))
    iters = int(os.environ.get("TPURT_BENCH_ITERS", 3))
    grid_res = os.environ.get("TPURT_GRID_RES")
    grid_res = int(grid_res) if grid_res else None
    block = int(os.environ.get("TPURT_GRID_BLOCK", "4"))

    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.bvh.grid import (
        auto_res3,
        build_grid,
        check_grid_capacity,
    )
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace import pathtrace as pt
    from tpu_raytracing.trace import split_pallas as sp
    from tpu_raytracing.trace.grid_trace import trace_rays_grid
    from tpu_raytracing.trace.ray import generate_primary_rays
    from tpu_raytracing.trace.render import _shadow_rays

    scene = procedural.terrain(num_tris)
    dev_scene = scene_to_device(scene)
    host_cam = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    host_cam.position = (scene.aabb_max * 0.0).astype("float32")
    host_cam.position[1] = float(scene.aabb_max[1]) * 1.5 + 20.0
    host_cam.position[2] = float(scene.aabb_min[2]) * 0.7
    host_cam.yaw = 0.0
    host_cam.pitch = 0.7
    camera = cam.camera_to_device(cam.update_camera(host_cam))
    triangles = jnp.asarray(scene.triangles)
    log(f"device={jax.devices()[0]}, {num_tris} tris, {res}x{res}, "
        f"grid_res={grid_res or 'auto'} block={block}")

    @jax.jit
    def build_bucket(t):
        split, packed = bucket.build_bucket_split(
            t, enable_pairs=True, leaf_width=sp.LEAFW)
        return sp.prep_split_views(split, packed), packed, split

    views, packed, split = build_bucket(triangles)
    jax.block_until_ready(views)

    # --- grid build over the same rows ---
    scale = float(os.environ.get("TPURT_GRID_SCALE", "1.0"))
    if grid_res is None:
        grid_res = auto_res3(scene.aabb_max - scene.aabb_min, num_tris,
                             scale=scale)
    # footprint tiers scale ~1/scale^2 (bvh/grid.py:tier_params)
    from tpu_raytracing.bvh.grid import tier_params

    tp = tier_params(scale)
    k2 = int(os.environ.get("TPURT_GRID_K2", str(tp["k2"])))
    med_frac = int(os.environ.get("TPURT_GRID_MEDFRAC",
                                  str(tp["med_frac"])))
    _build_grid = jax.jit(lambda rows, nl: build_grid(
        rows, nl, res=grid_res, k2=k2, med_frac=med_frac))
    grid = _build_grid(packed.rows, split.num_leaves)
    check_grid_capacity(grid)
    jax.block_until_ready(grid.refs)
    log(f"grid: res={grid.res} refs_cap={grid.refs.shape[0]} "
        f"num_big={int(grid.num_big)}")
    t0 = time.perf_counter()
    for i in range(iters):
        rows_i = packed.rows.at[:, 0].add(i + 1)  # defeat memoization
        g2 = _build_grid(rows_i, split.num_leaves)
    float(jnp.sum(g2.cell_count.astype(jnp.float32)))
    log(f"grid build: {(time.perf_counter() - t0) / iters * 1000:.1f} ms "
        f"(rows->tables only)")
    # same build without the live-key compaction, to price the
    # compacted-sort stage on this backend (bvh/grid.py:build_grid)
    _build_grid_nc = jax.jit(lambda rows, nl: build_grid(
        rows, nl, res=grid_res, k2=k2, med_frac=med_frac, compact_cap=0))
    g2 = _build_grid_nc(packed.rows, split.num_leaves)
    jax.block_until_ready(g2.refs)
    t0 = time.perf_counter()
    for i in range(iters):
        rows_i = packed.rows.at[:, 0].add(i + 1)
        g2 = _build_grid_nc(rows_i, split.num_leaves)
    float(jnp.sum(g2.cell_count.astype(jnp.float32)))
    log(f"grid build (uncompacted sort): "
        f"{(time.perf_counter() - t0) / iters * 1000:.1f} ms")

    # --- bounce ray set (same derivation as probe_tree) ---
    num = res * res
    rays = jax.jit(generate_primary_rays, static_argnames=("width", "height"))(
        camera, res, res)
    alive = jnp.ones((num,), bool)
    max_t = camera["max_depth"]
    tracer0 = sp.make_split_pallas_tracer(None, None, res, res)
    rec, _ = jax.jit(lambda v, p, r, a: tracer0(v, p, r, active=a))(
        views, packed, rays, alive)
    u = jax.random.uniform(jax.random.PRNGKey(0), (num, 2))
    _, _, alive2, _, rays2 = jax.jit(lambda *a: pt._bounce_stage(
        *a, compaction=True, sort_cells=True))(
        dev_scene, packed, rays, rec, jnp.zeros((num,), bool),
        jnp.ones((num, 3), jnp.float32), jnp.zeros((num, 3), jnp.float32),
        alive, jnp.arange(num, dtype=jnp.int32), u, max_t)
    n_alive = int(jnp.sum(alive2.astype(jnp.int32)))
    log(f"bounce rays alive: {n_alive}")

    def timeit(name, f, *args):
        out = f(*args, 0.0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(*args, (i + 1) * 1e-5)
        jax.block_until_ready(out)
        _ = float(jnp.sum(out[0].t))
        ms = (time.perf_counter() - t0) / iters * 1000.0
        log(f"{name}: {ms:.0f} ms")
        return out

    # split kernel bounce (bench config)
    sp_bounce = sp.make_split_pallas_tracer(
        None, None, res, res, k=256, c_slots=16, sort_mode="presorted")
    fsp = jax.jit(lambda v, p, r, a, j: sp_bounce(
        v, p, r.replace(origin=r.origin + j), active=a))
    timeit("bounce closest [split]", fsp, views, packed, rays2, alive2)

    fg = jax.jit(lambda g, p, r, a, j: trace_rays_grid(
        g, p, r.replace(origin=r.origin + j), active=a, block=block))
    outg = timeit("bounce closest [grid]", fg, grid, packed, rays2, alive2)
    st = outg[1]
    act = jnp.asarray(alive2, jnp.float32)
    log(f"  grid steps/ray: "
        f"{float(jnp.sum(st.box_tests * act)) / max(n_alive, 1):.1f} "
        f"(max {int(jnp.max(st.box_tests))}), tri tests/ray: "
        f"{float(jnp.sum(st.tri_tests * act)) / max(n_alive, 1):.1f}")
    for segs in (4, 16):
        fgN = jax.jit(lambda g, p, r, a, j, s=segs: trace_rays_grid(
            g, p, r.replace(origin=r.origin + j), active=a, block=block,
            segments=s))
        timeit(f"bounce closest [grid, {segs} segments]", fgN, grid,
               packed, rays2, alive2)

    # residue compaction sweep: phase-1 budget around the ~20-step mean
    # (sizes bench.py's RESID_DEFAULT on real hardware)
    for ra in (16, 32, 64):
        fgR = jax.jit(lambda g, p, r, a, j, ra=ra: trace_rays_grid(
            g, p, r.replace(origin=r.origin + j), active=a, block=block,
            residue_after=ra))
        outr = timeit(f"bounce closest [grid, residue {ra}]", fgR, grid,
                      packed, rays2, alive2)
        live = float(jnp.mean(
            (outr[1].box_tests > ra).astype(jnp.float32)))
        log(f"  survivors past phase 1: {live * 100:.1f}%")

    # equivalence spot check (same rays, tie-insensitive fields)
    rec_s, _ = fsp(views, packed, rays2, alive2, 0.0)
    rec_g, _ = fg(grid, packed, rays2, alive2, 0.0)
    import numpy as np
    hs = np.asarray(rec_s.hit)[np.asarray(alive2)]
    hg = np.asarray(rec_g.hit)[np.asarray(alive2)]
    ts = np.asarray(rec_s.t)[np.asarray(alive2)]
    tg = np.asarray(rec_g.t)[np.asarray(alive2)]
    log(f"  parity: hit match {np.mean(hs == hg):.6f}, "
        f"t close {np.mean(np.isclose(ts, tg, rtol=1e-4, atol=1e-4)):.6f}")

    # shadow (any-hit) from bounce-hit origins
    srays = jax.jit(_shadow_rays)(dev_scene, rays2, rec_g)
    sp_shadow = sp.make_split_pallas_tracer(
        None, None, res, res, k=256, any_hit=True, c_slots=8,
        sort_mode="origin")
    fss = jax.jit(lambda v, p, r, a, j: sp_shadow(
        v, p, r.replace(origin=r.origin + j), active=a))
    timeit("bounce shadow [split, origin-sorted]", fss, views, packed,
           srays, alive2)
    fgs = jax.jit(lambda g, p, r, a, j: trace_rays_grid(
        g, p, r.replace(origin=r.origin + j), active=a, any_hit=True,
        block=block))
    timeit("bounce shadow [grid]", fgs, grid, packed, srays, alive2)

    # primary for reference
    fgp = jax.jit(lambda g, p, r, a, j: trace_rays_grid(
        g, p, r.replace(origin=r.origin + j), active=a, block=block))
    timeit("primary [grid]", fgp, grid, packed, rays, alive)


if __name__ == "__main__":
    main()
