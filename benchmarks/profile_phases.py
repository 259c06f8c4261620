"""Isolate where the phased tracer's time goes: schedule sweep + dispatch
overhead of chained jitted calls on this backend."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    res = int(os.environ.get("TPURT_BENCH_RES", 1024))

    from tpu_raytracing.bvh import lbvh, wide
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace.ray import generate_primary_rays
    from tpu_raytracing.trace.traverse import pack_pairs
    from tpu_raytracing.trace import wide_fat
    from tpu_raytracing.trace.packet import tile_reorder

    # --- dispatch overhead: chain N trivial jitted calls, fetch at end ---
    @jax.jit
    def bump(x):
        return x + 1.0

    x = jnp.zeros((16384, 64), jnp.float32)
    float(jnp.sum(bump(x)))
    for chain in (1, 8, 32):
        t0 = time.perf_counter()
        reps = 5
        for r in range(reps):
            y = x + r
            for _ in range(chain):
                y = bump(y)
            float(jnp.sum(y))
        el = (time.perf_counter() - t0) / reps
        log(f"chain {chain:3d} trivial jits: {el*1000:.1f} ms/frame")

    scene = procedural.terrain(num_tris)
    host_cam = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    host_cam.position = (scene.aabb_max * 0.0).astype("float32")
    host_cam.position[1] = float(scene.aabb_max[1]) * 1.5 + 20.0
    host_cam.position[2] = float(scene.aabb_min[2]) * 0.7
    host_cam.yaw = 0.0
    host_cam.pitch = 0.7
    camera = cam.camera_to_device(cam.update_camera(host_cam))
    triangles = jnp.asarray(scene.triangles)

    def build(tris):
        bvh, prs = lbvh.build_lbvh(tris)
        packed = pack_pairs(prs)
        return wide.build_wide_fat(bvh, packed.rows), packed

    fat, packed = jax.jit(build)(triangles)
    float(jnp.sum(fat.rows[0]))

    tile_w, tile_h = 8, 8
    k = tile_w * tile_h

    @jax.jit
    def prim_rays(jitter):
        cam_j = dict(camera)
        cam_j["position"] = camera["position"] + jitter
        return generate_primary_rays(cam_j, res, res)

    def frame_phased(rows, prows, rays, shrink, min_packets):
        w = wide_fat.FatWideBVH(rows=rows, num_nodes=fat.num_nodes)
        tiled = jax.tree.map(lambda a: tile_reorder(a, res, res, tile_w, tile_h), rays)
        rec, _ = wide_fat.trace_rays_wide_fat_phased(
            w, type(packed)(rows=prows), tiled, packet_size=k,
            shrink=shrink, min_packets=min_packets)
        return jnp.sum(rec.t)

    for shrink, mp in ((4, 256), (8, 1024), (16, 1024), (16, 4096), (64, 4096)):
        float(frame_phased(fat.rows, packed.rows, prim_rays(0.0), shrink, mp))
        t0 = time.perf_counter()
        n = 3
        for i in range(n):
            float(frame_phased(fat.rows, packed.rows,
                               prim_rays((i + 1) * 1e-4), shrink, mp))
        el = (time.perf_counter() - t0) / n
        total = res * res
        log(f"phased shrink={shrink} min={mp}: {el*1000:.0f} ms/frame "
            f"-> {total/el/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
