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
    iters = int(os.environ.get("TPURT_BENCH_ITERS", 5))

    from tpu_raytracing.bvh import lbvh, wide
    from tpu_raytracing.ops.pallas_traverse import make_pallas_tracer, pad_rows_256
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace.pathtrace import path_trace
    from tpu_raytracing.trace.traverse import pack_pairs

    log(f"bench: {num_tris} tris, {res}x{res}, {bounces} bounce(s), "
        f"device={jax.devices()[0]}")

    scene = procedural.terrain(num_tris)
    dev_scene = scene_to_device(scene)
    camera = cam.camera_to_device(cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    triangles = jnp.asarray(scene.triangles)

    # --- per-frame rebuild: LBVH + 8-wide collapse (the full build path) ---
    def full_build(tris):
        bvh, pairs = lbvh.build_lbvh(tris)
        packed = pack_pairs(pairs)
        return wide.build_wide_fat(bvh, packed.rows), packed

    build = jax.jit(full_build)
    fat, packed = jax.block_until_ready(build(triangles))
    t0 = time.perf_counter()
    for _ in range(iters):
        fat, packed = build(triangles)
    jax.block_until_ready(fat)
    build_ms = (time.perf_counter() - t0) / iters * 1000.0
    log(f"LBVH + wide rebuild: {build_ms:.2f} ms/frame (target < 20 ms)")

    # --- trace throughput (primary + NEE shadow + bounce rays) ---
    rows256 = jax.jit(pad_rows_256)(fat.rows)
    # rows ride in the trav argument (a closure would embed them as
    # compile-time constants — gigabytes at 1M triangles).
    tracer = make_pallas_tracer(None, res, res)

    def frame(key):
        return path_trace(
            rows256, packed, dev_scene, camera, res, res, num_bounces=bounces,
            key=key, tracer=tracer,
        )

    img, rays_traced = jax.block_until_ready(frame(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    total_rays = 0
    for i in range(iters):
        img, rays_traced = frame(jax.random.PRNGKey(i))
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
