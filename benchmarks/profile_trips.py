"""Measure per-packet traversal trip counts on the 1M-tri terrain bench
scene — sizes the win from phased packet compaction in the fat tracer.

Run on the real TPU. Prints the trip-count distribution over packets plus
honest (vary-input + fetch) timing of the current fat tracer.
"""

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

    log(f"device={jax.devices()[0]}, {num_tris} tris, {res}x{res}")
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
    log(f"fat rows: {fat.rows.shape}, num wide nodes: {int(fat.num_nodes)}")

    tile_w, tile_h = 8, 8
    k = tile_w * tile_h

    def trips(rows, cam_pos_jitter):
        cam_j = dict(camera)
        cam_j["position"] = camera["position"] + cam_pos_jitter
        rays = generate_primary_rays(cam_j, res, res)
        tiled = jax.tree.map(lambda a: tile_reorder(a, res, res, tile_w, tile_h), rays)
        w = wide_fat.FatWideBVH(rows=rows, num_nodes=fat.num_nodes)
        rec, stats, nsteps = wide_fat.trace_rays_wide_fat(
            w, packed, tiled, packet_size=k, with_trips=True
        )
        return nsteps, stats.box_tests

    jt = jax.jit(trips)
    nsteps, bt = jt(fat.rows, 0.0)
    ns = np.asarray(nsteps)
    log(f"packets: {ns.size}")
    for q in (50, 75, 90, 95, 99, 99.9, 100):
        log(f"  trip p{q}: {np.percentile(ns, q):.0f}")
    log(f"  trip mean: {ns.mean():.1f}  sum: {ns.sum()}")
    log(f"  lockstep cost (max*P): {ns.max() * ns.size}")
    log(f"  ideal cost (sum): {ns.sum()}  ratio: {ns.max() * ns.size / ns.sum():.1f}x")
    log(f"  box tests/ray: {np.asarray(bt).mean():.0f}")

    # honest timing, primary rays only: lockstep vs phased. The BVH rows ride
    # as jit ARGUMENTS (closure constants overflow the remote-compile payload
    # at this scale).
    @jax.jit
    def prim_rays(jitter):
        cam_j = dict(camera)
        cam_j["position"] = camera["position"] + jitter
        return generate_primary_rays(cam_j, res, res)

    @jax.jit
    def frame_lockstep(rows, prows, rays):
        w = wide_fat.FatWideBVH(rows=rows, num_nodes=fat.num_nodes)
        tiled = jax.tree.map(lambda a: tile_reorder(a, res, res, tile_w, tile_h), rays)
        rec, _ = wide_fat.trace_rays_wide_fat(
            w, type(packed)(rows=prows), tiled, packet_size=k)
        return jnp.sum(rec.t)

    def frame_phased(rows, prows, rays):
        w = wide_fat.FatWideBVH(rows=rows, num_nodes=fat.num_nodes)
        tiled = jax.tree.map(lambda a: tile_reorder(a, res, res, tile_w, tile_h), rays)
        rec, _ = wide_fat.trace_rays_wide_fat_phased(
            w, type(packed)(rows=prows), tiled, packet_size=k)
        return jnp.sum(rec.t)

    for name, fn in (("lockstep", frame_lockstep), ("phased", frame_phased)):
        log(f"timing {name} fat tracer (primary only)...")
        float(fn(fat.rows, packed.rows, prim_rays(0.0)))
        t0 = time.perf_counter()
        n = 3
        acc = 0.0
        for i in range(n):
            acc += float(fn(fat.rows, packed.rows, prim_rays((i + 1) * 1e-4)))
        el = time.perf_counter() - t0
        total = n * res * res
        log(f"  {name}: {total} rays in {el:.3f}s -> {total/el/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
