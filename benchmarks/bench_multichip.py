"""Multi-chip scaling measurement for the sharded flagship path.

Runs path_trace_sharded over meshes of 1, 2, 4, ... devices (whatever
the platform exposes) and reports per-mesh frame time + throughput, so
the ray-band scaling shape is measured, not asserted. On real multi-chip
TPU hardware the numbers are wall-clock speedups over ICI; on the
virtual CPU mesh (TPURT_PLATFORM=cpu + --xla_force_host_platform_
device_count=N) they validate the sharded program end-to-end and show
the partitioning overhead, while absolute times are CPU-bound.

Usage:
  # virtual 8-device CPU mesh
  XLA_FLAGS=--xla_force_host_platform_device_count=8 TPURT_PLATFORM=cpu \
      python benchmarks/bench_multichip.py
  # real chips: run under a multi-chip runtime; it uses jax.devices()
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("TPURT_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 20_000))
    res = int(os.environ.get("TPURT_BENCH_RES", 256))
    iters = int(os.environ.get("TPURT_BENCH_ITERS", 2))

    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.parallel.flagship import path_trace_sharded
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace import split_pallas as sp

    devs = jax.devices()
    log(f"platform={devs[0].platform}, devices={len(devs)}, "
        f"{num_tris} tris, {res}x{res}")

    scene = procedural.terrain(num_tris)
    dev_scene = scene_to_device(scene)
    host_cam = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    camera = cam.camera_to_device(cam.update_camera(host_cam))
    triangles = jnp.asarray(scene.triangles)
    split, packed = jax.jit(lambda t: bucket.build_bucket_split(
        t, enable_pairs=True, leaf_width=sp.LEAFW))(triangles)
    views = sp.prep_split_views(split, packed)
    tracer_kind = os.environ.get("TPURT_MC_TRACER", "split")
    if tracer_kind == "grid":
        from tpu_raytracing.bvh.grid import build_grid

        views = jax.jit(build_grid)(packed.rows, split.num_leaves)
        log(f"tracer: uniform grid res={views.res}")

    n = 1
    sizes = []
    while n <= len(devs):
        sizes.append(n)
        n *= 2
    results = {}
    for nd in sizes:
        mesh = Mesh(devs[:nd], ("rays",))
        # path_trace_sharded needs each band to tile into 16x8 packets
        if res % (8 * nd) != 0:
            log(f"mesh={nd}: skipped ({res} rows not divisible into "
                f"{nd} packet-aligned bands)")
            continue
        img, rays_traced = path_trace_sharded(
            mesh, views, packed, dev_scene, camera, res, res,
            num_bounces=1, key=jax.random.PRNGKey(0),
            tracer_kind=tracer_kind)
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        total = 0
        for i in range(iters):
            cam_j = dict(camera)
            cam_j["position"] = camera["position"] + (i + 1) * 1e-4
            img, rays_traced = path_trace_sharded(
                mesh, views, packed, dev_scene, cam_j, res, res,
                num_bounces=1, key=jax.random.PRNGKey(i),
                tracer_kind=tracer_kind)
            total += int(jax.block_until_ready(rays_traced))
        dt = time.perf_counter() - t0
        mrays = total / dt / 1e6
        results[nd] = mrays
        speedup = results[nd] / results[sizes[0]] if sizes[0] in results else 1.0
        log(f"mesh={nd}: {dt / iters * 1000:.0f} ms/frame, "
            f"{mrays:.2f} Mrays/s, x{speedup:.2f} vs mesh={sizes[0]}")


if __name__ == "__main__":
    main()
