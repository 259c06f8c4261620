"""Headline benchmark: Mrays/s/chip (primary + bounce) on a 1M-triangle
scene (tessellated terrain: a surface mesh, the realistic 1M-tri case),
plus per-frame LBVH rebuild time (targets in BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}; supporting
numbers go to stderr. Scale via TPURT_BENCH_TRIS / TPURT_BENCH_RES for smoke
runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    res = int(os.environ.get("TPURT_BENCH_RES", 1024))
    bounces = int(os.environ.get("TPURT_BENCH_BOUNCES", 1))
    iters = int(os.environ.get("TPURT_BENCH_ITERS", 2))

    from tpu_raytracing.bvh import lbvh, wide
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace.pathtrace import path_trace
    from tpu_raytracing.trace.traverse import pack_pairs
    from tpu_raytracing.trace.wide_fat import make_tiled_fat_tracer

    log(f"bench: {num_tris} tris, {res}x{res}, {bounces} bounce(s), "
        f"device={jax.devices()[0]}")

    scene = procedural.terrain(num_tris)
    dev_scene = scene_to_device(scene)
    # Aerial view: the scene-framing default puts the camera at the AABB
    # centre (inside the hills), making every ray graze hundreds of cells;
    # look down at ~40 degrees instead, as a renderer benchmark would.
    host_cam = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    host_cam.position = (scene.aabb_max * 0.0).astype("float32")
    host_cam.position[1] = float(scene.aabb_max[1]) * 1.5 + 20.0
    host_cam.position[2] = float(scene.aabb_min[2]) * 0.7
    host_cam.yaw = 0.0
    host_cam.pitch = 0.7
    camera = cam.camera_to_device(cam.update_camera(host_cam))
    triangles = jnp.asarray(scene.triangles)

    # --- per-frame rebuild: Karras LBVH + wide collapse. The gather-free
    # implicit builder (bvh/implicit.py) rebuilds in ~140 ms but its
    # median-split tree quality collapses traversal throughput ~30x on
    # terrain, so Karras wins end-to-end despite the gather-bound build. ---
    def full_build(tris):
        bvh, pairs = lbvh.build_lbvh(tris)
        packed = pack_pairs(pairs)
        return wide.build_wide_fat(bvh, packed.rows), packed

    build = jax.jit(full_build)
    fat, packed = build(triangles)
    float(jnp.sum(fat.rows[0]))  # force completion (block_until_ready lies here)
    # Vary the input every frame (this backend memoizes identical executions)
    # and fetch at the end: throughput timing over pipelined frames.
    t0 = time.perf_counter()
    for i in range(iters):
        fat, packed = build(triangles + (i + 1) * 1e-5)
    float(jnp.sum(fat.rows[0]))
    build_ms = (time.perf_counter() - t0) / iters * 1000.0
    log(f"LBVH + wide rebuild: {build_ms:.2f} ms/frame (target < 20 ms)")

    # --- trace throughput (primary + NEE shadow + bounce rays) ---
    # XLA wide-fat tracer: beats the Pallas kernel at 1M tris (the Pallas
    # grid is sequential per packet; lockstep parallelism wins on deep trees).
    # phased=True: host-staged packet compaction — per-step cost tracks the
    # active packet count instead of paying all packets until the slowest
    # drains.
    tracer = make_tiled_fat_tracer(None, res, res, 8, 8, phased=True)

    def frame(key, jitter):
        cam_j = dict(camera)
        cam_j["position"] = camera["position"] + jitter  # defeat exec memoization
        return path_trace(
            fat, packed, dev_scene, cam_j, res, res, num_bounces=bounces,
            key=key, tracer=tracer,
        )

    img, rays_traced = jax.block_until_ready(frame(jax.random.PRNGKey(0), 0.0))
    t0 = time.perf_counter()
    total_rays = 0
    for i in range(iters):
        img, rays_traced = frame(jax.random.PRNGKey(i), (i + 1) * 1e-4)
        total_rays += int(jax.block_until_ready(rays_traced))
    elapsed = time.perf_counter() - t0
    mrays = total_rays / elapsed / 1e6
    log(f"trace: {total_rays} rays in {elapsed:.3f}s -> {mrays:.1f} Mrays/s "
        f"(target >= 300)")

    print(json.dumps({
        "metric": "Mrays/s/chip (primary+bounce) at 1M tris",
        "value": round(mrays, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / 300.0, 4),
    }))


if __name__ == "__main__":
    main()
