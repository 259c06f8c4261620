"""Sweep the v3 kernel's knobs (leafw build/trace width, packet size k,
slots-in-flight C) on the bounce-closest pass — the frame's dominant cost.
Real bounce rays: primary trace + one diffuse bounce stage at 1M terrain.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    res = int(os.environ.get("TPURT_BENCH_RES", 1024))
    iters = int(os.environ.get("TPURT_BENCH_ITERS", 3))

    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace import pathtrace as pt
    from tpu_raytracing.trace import split_pallas as sp

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
        f"V={sp.KERNEL_V}")

    from tpu_raytracing.trace.ray import generate_primary_rays

    views_by_lw = {}
    for lw in (32, 64):
        bl = jax.jit(lambda t, lw=lw: (lambda s, p: (
            sp.prep_split_views(s, p), p))(*bucket.build_bucket_split(
                t, enable_pairs=True, leaf_width=lw)))
        views_by_lw[lw] = bl(triangles)

    num = res * res
    rays = jax.jit(generate_primary_rays, static_argnames=("width", "height"))(
        camera, res, res)
    alive = jnp.ones((num,), bool)
    max_t = camera["max_depth"]

    views, packed = views_by_lw[64]
    tracer = sp.make_split_pallas_tracer(None, None, res, res)
    traced = jax.jit(lambda v, p, r, a: tracer(v, p, r, active=a))
    rec, _ = traced(views, packed, rays, alive)
    srec_hit = jnp.zeros((num,), bool)

    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (num, 2))
    throughput = jnp.ones((num, 3), jnp.float32)
    radiance = jnp.zeros((num, 3), jnp.float32)
    pixel = jnp.arange(num, dtype=jnp.int32)
    bounce = jax.jit(lambda *a: pt._bounce_stage(*a, compaction=True))
    _, _, alive2, _, rays2 = bounce(
        dev_scene, packed, rays, rec, srec_hit, throughput, radiance,
        alive, pixel, u, max_t)
    log(f"bounce rays alive: {int(jnp.sum(alive2.astype(jnp.int32)))}")

    # primary-pass variants
    for (kk, cc) in ((256, 4), (256, 8)):
        tr = sp.make_split_pallas_tracer(None, None, res, res, k=kk,
                                         c_slots=cc)
        f = jax.jit(lambda v, p, r, a, j, tr=tr: tr(
            v, p, r.replace(origin=r.origin + j), active=a)[0].t)
        float(jnp.sum(f(views, packed, rays, alive, 0.0)))
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(views, packed, rays, alive, (i + 1) * 1e-5)
        float(jnp.sum(out))
        log(f"primary lw=64 k={kk} C={cc}: "
            f"{(time.perf_counter()-t0)/iters*1000:.0f} ms")

    # bounce-closest variants
    for lw in (64, 32):
        v_lw, p_lw = views_by_lw[lw]
        for (kk, cc) in ((256, 4), (128, 4), (256, 8), (128, 8)):
            tr = sp.make_split_pallas_tracer(None, None, res, res, k=kk,
                                             c_slots=cc, leafw=lw)
            f = jax.jit(lambda v, p, r, a, j, tr=tr: tr(
                v, p, r.replace(origin=r.origin + j), active=a)[0].t)
            float(jnp.sum(f(v_lw, p_lw, rays2, alive2, 0.0)))
            t0 = time.perf_counter()
            for i in range(iters):
                out = f(v_lw, p_lw, rays2, alive2, (i + 1) * 1e-5)
            float(jnp.sum(out))
            log(f"bounce lw={lw} k={kk} C={cc}: "
                f"{(time.perf_counter()-t0)/iters*1000:.0f} ms")


if __name__ == "__main__":
    main()
