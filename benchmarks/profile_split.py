"""Split-BVH Pallas kernel (v2) on real TPU: build + trace throughput vs the
phased XLA wide-fat tracer, honest fetch timing."""

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
    iters = int(os.environ.get("TPURT_BENCH_ITERS", 3))

    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace import split_pallas as sp
    from tpu_raytracing.trace.packet import tile_reorder
    from tpu_raytracing.trace.ray import generate_primary_rays

    scene = procedural.terrain(num_tris)
    host_cam = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    host_cam.position = (scene.aabb_max * 0.0).astype("float32")
    host_cam.position[1] = float(scene.aabb_max[1]) * 1.5 + 20.0
    host_cam.position[2] = float(scene.aabb_min[2]) * 0.7
    host_cam.yaw = 0.0
    host_cam.pitch = 0.7
    camera = cam.camera_to_device(cam.update_camera(host_cam))
    triangles = jnp.asarray(scene.triangles)
    log(f"device={jax.devices()[0]}, {num_tris} tris, {res}x{res}, C={sp.C}, K={sp.K}, LEAFW={sp.LEAFW}")

    inner_w = int(os.environ.get("TPURT_SPLIT_W", 8))
    use_pairs = bool(int(os.environ.get("TPURT_SPLIT_PAIRS", "0")))
    log(f"inner_width={inner_w} pairs={use_pairs}")

    @jax.jit
    def build(tris):
        split, packed = bucket.build_bucket_split(
            tris, enable_pairs=use_pairs, leaf_width=sp.LEAFW,
            inner_width=inner_w)
        return sp.prep_split_views(split, packed), packed, split.num_inner

    t0 = time.perf_counter()
    views, packed, ni = build(triangles)
    float(jnp.sum(views[0][0]).astype(jnp.float32))
    log(f"build first call: {time.perf_counter()-t0:.1f} s, "
        f"num_inner={int(ni)}")
    t0 = time.perf_counter()
    for i in range(iters):
        views, packed, ni = build(triangles + (i + 1) * 1e-5)
    float(jnp.sum(views[0][0]).astype(jnp.float32))
    log(f"split build: {(time.perf_counter()-t0)/iters*1000:.0f} ms")

    @jax.jit
    def prim_rays(jitter):
        cam_j = dict(camera)
        cam_j["position"] = camera["position"] + jitter
        return generate_primary_rays(cam_j, res, res)

    @jax.jit
    def frame(views, prows, rays):
        from tpu_raytracing.trace.traverse import PackedPairs

        tiled = jax.tree.map(
            lambda a: tile_reorder(a, res, res, 16, 8), rays
        )
        rec, _ = sp.trace_rays_split_pallas(
            views, PackedPairs(rows=prows), tiled
        )
        return jnp.sum(rec.t)

    t0 = time.perf_counter()
    print(float(frame(views, packed.rows, prim_rays(0.0))), file=sys.stderr)
    log(f"trace first call (compile+run): {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    for i in range(iters):
        s = frame(views, packed.rows, prim_rays((i + 1) * 1e-4))
    float(s)
    el = (time.perf_counter() - t0) / iters
    log(f"split-pallas trace: {el*1000:.0f} ms -> {res*res/el/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
