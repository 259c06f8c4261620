"""Structural grid metrics at production scale, runnable WITHOUT the TPU.

The DDA loop's TPU cost model is (global iterations) x (~450 dense [R]
ops + ~5 gathers): both factors are pure structure — steps per ray,
lockstep max steps, refs per cell — and identical on any backend. This
probe builds the 1M grid and traces the bench-style primary set plus a
scattered interior set on the CPU, reporting the factors that predict
the TPU pass time (benchmarks/probe_grid.py measures the real thing).

Usage: TPURT_BENCH_TRIS=1000000 python benchmarks/probe_grid_cpu.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    res = int(os.environ.get("TPURT_BENCH_RES", 512))
    grid_res = os.environ.get("TPURT_GRID_RES")
    grid_res = int(grid_res) if grid_res else None

    from tpu_raytracing.bvh.grid import (
        build_grid_from_triangles,
        check_grid_capacity,
    )
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace.grid_trace import trace_rays_grid
    from tpu_raytracing.trace.ray import Rays, generate_primary_rays

    scene = procedural.terrain(num_tris)
    tris = jnp.asarray(scene.triangles)
    # per-axis resolution from the HOST-known scene AABB: cubic cells of
    # size s = (cube span / G0) * cell_scale, each axis sized to its span
    span = np.asarray(scene.aabb_max - scene.aabb_min, np.float64)
    scale = float(os.environ.get("TPURT_GRID_SCALE", "1.0"))
    res3_env = os.environ.get("TPURT_GRID_RES3")
    if res3_env:
        grid_res = tuple(int(x) for x in res3_env.split(","))
    elif grid_res is None:
        from tpu_raytracing.bvh.grid import auto_res3

        grid_res = auto_res3(span, num_tris, scale=scale)
    # Footprint tiers: finer scales grow footprints ~1/scale^2, so scale
    # the direct/medium caps with the cell count unless overridden.
    k = int(os.environ.get("TPURT_GRID_K", "8"))
    k2 = int(os.environ.get(
        "TPURT_GRID_K2", str(max(32, int(32 / (scale * scale))))))
    med_frac = int(os.environ.get("TPURT_GRID_MEDFRAC", "16"))
    t0 = time.perf_counter()
    grid, packed = jax.jit(
        lambda t: build_grid_from_triangles(
            t, True, res=grid_res, k=k, k2=k2, med_frac=med_frac))(tris)
    check_grid_capacity(grid)
    cc = np.asarray(grid.cell_count)
    log(f"grid: res={grid.res} scale={scale} built in "
        f"{time.perf_counter() - t0:.1f}s (CPU) refs={int(cc.sum())} "
        f"big={int(grid.num_big)}")
    nz = cc[cc > 0]
    log(f"cells: nonempty={nz.size}/{cc.size - 1} mean_refs={nz.mean():.2f} "
        f"p99={np.percentile(nz, 99):.0f} max={nz.max()}")

    host_cam = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    host_cam.position = (scene.aabb_max * 0.0).astype("float32")
    host_cam.position[1] = float(scene.aabb_max[1]) * 1.5 + 20.0
    host_cam.position[2] = float(scene.aabb_min[2]) * 0.7
    host_cam.yaw = 0.0
    host_cam.pitch = 0.7
    camera = cam.camera_to_device(cam.update_camera(host_cam))

    block = int(os.environ.get("TPURT_GRID_BLOCK", "4"))

    def report(name, rays, active=None):
        t0 = time.perf_counter()
        rec, stats = jax.jit(
            lambda g, p, r: trace_rays_grid(g, p, r, active=active,
                                            block=block))(
            grid, packed, rays)
        steps = np.asarray(stats.box_tests)
        tri = np.asarray(stats.tri_tests)
        hit = np.asarray(rec.hit)
        log(f"{name}: cpu {time.perf_counter() - t0:.1f}s | "
            f"steps mean={steps.mean():.1f} p99={np.percentile(steps, 99):.0f} "
            f"max={steps.max()} | tri/ray mean={tri.mean():.1f} "
            f"p99={np.percentile(tri, 99):.0f} | hit={hit.mean():.3f}")
        return steps

    rays = jax.jit(generate_primary_rays,
                   static_argnames=("width", "height"))(camera, res, res)
    report(f"primary {res}x{res}", rays)

    # scattered interior rays (bounce-like: origins on the surface zone)
    num = res * res
    rng = np.random.default_rng(0)
    span = np.asarray(scene.aabb_max - scene.aabb_min)
    orig = (np.asarray(scene.aabb_min)
            + rng.uniform(0.05, 0.6, (num, 3)) * span).astype(np.float32)
    dirs = rng.normal(size=(num, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rays_b = Rays(origin=jnp.asarray(orig), direction=jnp.asarray(dirs),
                  tmin=jnp.full((num,), 1e-3, jnp.float32),
                  tmax=jnp.full((num,), float(camera["max_depth"]),
                                jnp.float32))
    steps = report("scattered interior", rays_b)
    # TPU estimate: iterations x ~0.7 ms (450 [R]-ops at 1M lanes)
    log(f"TPU-iteration estimate (lockstep max, no segments): "
        f"{int(steps.max())} iters")


if __name__ == "__main__":
    main()
