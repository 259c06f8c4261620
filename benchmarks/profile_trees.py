"""Tree-quality comparison on the terrain bench scene: builder x pairing x
packet size -> build time, box tests/ray, trip distribution, phased trace
throughput."""

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

    from tpu_raytracing.bvh import lbvh, sah, wide
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace.ray import generate_primary_rays
    from tpu_raytracing.trace.traverse import pack_pairs
    from tpu_raytracing.trace import wide_fat
    from tpu_raytracing.trace.packet import tile_reorder

    scene = procedural.terrain(num_tris)
    host_cam = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    host_cam.position = (scene.aabb_max * 0.0).astype("float32")
    host_cam.position[1] = float(scene.aabb_max[1]) * 1.5 + 20.0
    host_cam.position[2] = float(scene.aabb_min[2]) * 0.7
    host_cam.yaw = 0.0
    host_cam.pitch = 0.7
    camera = cam.camera_to_device(cam.update_camera(host_cam))
    triangles = jnp.asarray(scene.triangles)
    log(f"device={jax.devices()[0]}, {num_tris} tris, {res}x{res}")

    @jax.jit
    def prim_rays(jitter):
        cam_j = dict(camera)
        cam_j["position"] = camera["position"] + jitter
        return generate_primary_rays(cam_j, res, res)

    def measure(name, build_fn, tile):
        tile_w, tile_h = tile
        k = tile_w * tile_h
        try:
            jb = jax.jit(build_fn)
            fat, packed = jb(triangles)
            float(jnp.sum(fat.rows[0]))
            t0 = time.perf_counter()
            fat, packed = jb(triangles + 1e-5)
            float(jnp.sum(fat.rows[0]))
            build_ms = (time.perf_counter() - t0) * 1000.0

            def trips(rows, prows, rays):
                w = wide_fat.FatWideBVH(rows=rows, num_nodes=fat.num_nodes)
                tiled = jax.tree.map(
                    lambda a: tile_reorder(a, res, res, tile_w, tile_h), rays
                )
                _, stats, nsteps = wide_fat.trace_rays_wide_fat(
                    w, type(packed)(rows=prows), tiled, packet_size=k,
                    with_trips=True)
                return nsteps, stats.box_tests

            ns, bt = jax.jit(trips)(fat.rows, packed.rows, prim_rays(0.0))
            ns = np.asarray(ns)

            def frame(rows, prows, rays):
                w = wide_fat.FatWideBVH(rows=rows, num_nodes=fat.num_nodes)
                tiled = jax.tree.map(
                    lambda a: tile_reorder(a, res, res, tile_w, tile_h), rays
                )
                rec, _ = wide_fat.trace_rays_wide_fat_phased(
                    w, type(packed)(rows=prows), tiled, packet_size=k)
                return jnp.sum(rec.t)

            float(frame(fat.rows, packed.rows, prim_rays(0.0)))
            t0 = time.perf_counter()
            n = 3
            for i in range(n):
                float(frame(fat.rows, packed.rows, prim_rays((i + 1) * 1e-4)))
            el = (time.perf_counter() - t0) / n
            log(f"{name} tile={tile_w}x{tile_h}: build {build_ms:.0f} ms, "
                f"boxtests/ray {np.asarray(bt).mean():.0f}, "
                f"trips p50/p99/max {np.percentile(ns,50):.0f}/"
                f"{np.percentile(ns,99):.0f}/{ns.max()}, "
                f"sum {ns.sum()}, "
                f"trace {el*1000:.0f} ms -> {res*res/el/1e6:.2f} Mrays/s")
        except Exception as e:  # noqa: BLE001
            log(f"{name} tile={tile_w}x{tile_h}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")

    def karras(pairsflag):
        def f(tris):
            bvh, prs = lbvh.build_lbvh(tris, enable_pairs=pairsflag)
            packed = pack_pairs(prs)
            return wide.build_wide_fat(bvh, packed.rows), packed
        return f

    def sahb(pairsflag):
        def f(tris):
            bvh, prs = sah.build_sah(tris, enable_pairs=pairsflag)
            packed = pack_pairs(prs)
            return wide.build_wide_fat(bvh, packed.rows), packed
        return f

    which = os.environ.get("TPURT_TREES", "kp,k32,k128,sah,sahp").split(",")
    if "kp" in which:
        measure("karras+pairs", karras(True), (8, 8))
    if "k32" in which:
        measure("karras", karras(False), (8, 4))
    if "k128" in which:
        measure("karras", karras(False), (16, 8))
    if "sah" in which:
        measure("sah", sahb(False), (8, 8))
    if "sahp" in which:
        measure("sah+pairs", sahb(True), (8, 8))


if __name__ == "__main__":
    main()
