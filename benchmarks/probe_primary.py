"""Primary-pass probe: time + pop counts for the current kernel/build.

Run with TPURT_SPLIT_V=2 / 3 to compare kernel generations (round-1 notes
recorded 133 ms / 210k pops for the tiled primary at 1M; the round-2
frame profile shows 267 ms — this localizes kernel vs tree-quality).
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
    from tpu_raytracing.trace import split_pallas as sp
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
    log(f"device={jax.devices()[0]}, {num_tris} tris, {res}x{res}, "
        f"KERNEL_V={sp.KERNEL_V} C={os.environ.get('TPURT_SPLIT_C', '?')}")

    @jax.jit
    def build(t):
        split, packed = bucket.build_bucket_split(
            t, enable_pairs=True, leaf_width=sp.LEAFW)
        return sp.prep_split_views(split, packed), packed

    views, packed = build(triangles)
    num = res * res
    rays = jax.jit(generate_primary_rays, static_argnames=("width", "height"))(
        camera, res, res)
    alive = jnp.ones((num,), bool)

    cs = os.environ.get("TPURT_SPLIT_C")
    tracer = sp.make_split_pallas_tracer(None, None, res, res,
                                         c_slots=int(cs) if cs else None)
    f = jax.jit(lambda v, p, r, a, j: tracer(
        v, p, r.replace(origin=r.origin + j), active=a))
    out = f(views, packed, rays, alive, 0.0)
    jax.block_until_ready(out)
    _, stats = out
    denom = 256 if sp.KERNEL_V >= 3 else 1
    ip = float(jnp.sum(stats.box_tests.astype(jnp.float32))) / (8 * denom)
    lp = float(jnp.sum(stats.tri_tests.astype(jnp.float32))) / (
        2 * sp.LEAFW * denom)
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(views, packed, rays, alive, (i + 1) * 1e-5)
    float(jnp.sum(out[0].t))
    ms = (time.perf_counter() - t0) / iters * 1000.0
    log(f"primary tiled: {ms:.0f} ms  ipops={ip:.0f} lpops={lp:.0f}")


if __name__ == "__main__":
    main()
