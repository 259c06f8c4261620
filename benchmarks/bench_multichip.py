"""Multi-chip scaling benchmark: the flagship wavefront path trace
sharded over a device mesh (parallel/flagship.py:path_trace_sharded).

The reference is a single-GPU program (SURVEY.md §2: no distributed
backend); multi-chip rendering is this framework's new capability, so
its perf story needs its own harness: run the SAME frame over meshes of
1, 2, 4, ... N devices and report Mrays/s plus parallel efficiency
(the AS/scene are replicated, rays band-sharded, collectives on ICI —
scaling should be near-linear until the per-band ray count is too small
to fill a chip).

On real multi-chip hardware this measures true ICI scaling. With
TPURT_MC_VIRTUAL=1 (or on a machine without N chips) it provisions the
virtual CPU mesh instead — numbers then only validate the scaling
SHAPE and the collective wiring, and are labeled as such.

Env knobs: TPURT_MC_TRIS (200k), TPURT_MC_RES (512), TPURT_MC_BOUNCES
(1), TPURT_MC_DEVICES (all), TPURT_MC_TRACER (grid|split, default
grid), TPURT_MC_VIRTUAL (0).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

VIRTUAL = os.environ.get("TPURT_MC_VIRTUAL") == "1"
if VIRTUAL:
    # must precede any backend init (same recipe as tests/conftest.py
    # and __graft_entry__.dryrun_multichip)
    n = int(os.environ.get("TPURT_MC_DEVICES", "8"))
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)

import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    num_tris = int(os.environ.get("TPURT_MC_TRIS", 200_000))
    res = int(os.environ.get("TPURT_MC_RES", 512))
    bounces = int(os.environ.get("TPURT_MC_BOUNCES", 1))
    kind = os.environ.get("TPURT_MC_TRACER", "grid")
    iters = int(os.environ.get("TPURT_MC_ITERS", 2))

    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.parallel.flagship import path_trace_sharded
    from tpu_raytracing.parallel.render import make_mesh
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace import split_pallas as sp

    devices = jax.devices()
    want = int(os.environ.get("TPURT_MC_DEVICES", str(len(devices))))
    if len(devices) < want:
        log(f"only {len(devices)} device(s) present; rerun with "
            f"TPURT_MC_VIRTUAL=1 for the virtual CPU mesh")
        want = len(devices)
    plat = devices[0].platform
    log(f"multichip bench: {num_tris} tris, {res}x{res}, "
        f"{bounces} bounce(s), tracer={kind}, platform={plat}"
        + (" [VIRTUAL CPU MESH — scaling shape only]" if plat == "cpu"
           else ""))

    scene = procedural.terrain(num_tris)
    dev_scene = scene_to_device(scene)
    host_cam = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    camera = cam.camera_to_device(cam.update_camera(host_cam))
    triangles = jnp.asarray(scene.triangles)

    split, packed = jax.jit(lambda t: bucket.build_bucket_split(
        t, enable_pairs=True, leaf_width=sp.LEAFW))(triangles)
    bucket.check_split_capacity(split, num_tris)
    if kind == "grid":
        from tpu_raytracing.bvh.grid import (auto_res3, build_grid,
                                             check_grid_capacity)

        res3 = auto_res3(scene.aabb_max - scene.aabb_min, num_tris)
        views = jax.jit(build_grid, static_argnames=("res",))(
            packed.rows, split.num_leaves, res=res3)
        check_grid_capacity(views)
    else:
        views = sp.prep_split_views(split, packed)
    jax.block_until_ready(packed.rows)

    sizes = []
    s = 1
    while s <= want:
        sizes.append(s)
        s *= 2
    if sizes[-1] != want:
        sizes.append(want)

    results = []
    for n in sizes:
        mesh = make_mesh(devices[:n])
        th = 128 // 16
        if res % (th * n) != 0:
            log(f"mesh={n}: skipped ({res} rows not divisible by "
                f"{th * n})")
            continue

        def frame(j):
            cam_j = dict(camera)
            cam_j["position"] = camera["position"] + j
            return path_trace_sharded(
                mesh, views, packed, dev_scene, cam_j, res, res,
                num_bounces=bounces, key=jax.random.PRNGKey(0),
                tracer_kind=kind)

        img, rays_traced = frame(0.0)
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        total = 0
        for i in range(iters):
            img, rays_traced = frame((i + 1) * 1e-4)
            total += int(jax.block_until_ready(rays_traced))
        dt = time.perf_counter() - t0
        mrays = total / dt / 1e6
        results.append((n, mrays))
        eff = mrays / (results[0][1] * n) if results[0][1] else 0.0
        log(f"mesh={n}: {mrays:.2f} Mrays/s "
            f"({dt / iters * 1000:.0f} ms/frame, "
            f"efficiency vs 1-dev x{n}: {eff:.2f})")

    if results:
        n, mrays = results[-1]
        import json

        print(json.dumps({
            "metric": f"Mrays/s over {n}-device mesh "
                      f"({plat}, tracer={kind}, {num_tris} tris)",
            "value": round(mrays, 2),
            "unit": "Mray/s",
            "scaling_efficiency": round(
                mrays / (results[0][1] * n), 3) if results[0][1] else 0,
        }))


if __name__ == "__main__":
    main()
