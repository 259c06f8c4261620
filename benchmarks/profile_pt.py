"""Stage-wise timing of the 1-bounce path-trace frame at bench scale.

Splits the frame into: primary trace, primary shadow (any-hit), bounce
shading stage, bounce trace (incoherent rays), bounce shadow. Honest
fetch-based timing per stage."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, *args, iters=2, fetch=None):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)[:1]))
    ms = (time.perf_counter() - t0) / iters * 1000.0
    log(f"{name}: {ms:.0f} ms")
    return out


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    res = int(os.environ.get("TPURT_BENCH_RES", 1024))

    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace import pathtrace as pt
    from tpu_raytracing.trace import split_pallas as sp
    from tpu_raytracing.trace.ray import generate_primary_rays

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
    log(f"device={jax.devices()[0]}, {num_tris} tris, {res}x{res}")

    views, packed = jax.jit(lambda t: (lambda s, p: (
        sp.prep_split_views(s, p), p))(*bucket.build_bucket_split(
            t, enable_pairs=True, leaf_width=sp.LEAFW)))(triangles)

    tracer = sp.make_split_pallas_tracer(None, None, res, res)
    sh_tracer = sp.make_split_pallas_tracer(None, None, res, res, any_hit=True)
    sh_sorted = sp.make_split_pallas_tracer(None, None, res, res, any_hit=True,
                                            sort_origin=True)
    traced = jax.jit(lambda v, p, r, a: tracer(v, p, r, active=a))
    sh_traced = jax.jit(lambda v, p, r, a: sh_tracer(v, p, r, active=a))
    sh_srt = jax.jit(lambda v, p, r, a: sh_sorted(v, p, r, active=a))

    num = res * res
    rays = jax.jit(generate_primary_rays, static_argnames=("width", "height"))(
        camera, res, res)
    alive = jnp.ones((num,), bool)
    max_t = camera["max_depth"]

    rec = timed("primary trace ", lambda: traced(views, packed, rays, alive)[0])
    rec, pstats = traced(views, packed, rays, alive)
    log(f"  primary pops: {int(jnp.max(pstats.box_tests))}")

    srays = jax.jit(pt._jit_shadow)(dev_scene, rays, rec)
    timed("primary shadow (any-hit)", lambda: sh_traced(views, packed, srays, alive)[0])
    srec = sh_traced(views, packed, srays, alive)[0]

    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (num, 2))
    throughput = jnp.ones((num, 3), jnp.float32)
    radiance = jnp.zeros((num, 3), jnp.float32)
    pixel = jnp.arange(num, dtype=jnp.int32)

    bounce = jax.jit(lambda *a: pt._bounce_stage(*a, compaction=True))
    out = timed("bounce shading stage", lambda: bounce(
        dev_scene, packed, rays, rec, srec.hit, throughput, radiance,
        alive, pixel, u, max_t))
    radiance2, throughput2, alive2, pixel2, rays2 = bounce(
        dev_scene, packed, rays, rec, srec.hit, throughput, radiance,
        alive, pixel, u, max_t)
    log(f"alive after bounce: {int(jnp.sum(alive2.astype(jnp.int32)))}")

    rec2 = timed("bounce trace (incoherent)",
                 lambda: traced(views, packed, rays2, alive2)[0])
    rec2, bstats = traced(views, packed, rays2, alive2)
    log(f"  bounce pops: {int(jnp.max(bstats.box_tests))}")
    rec2 = traced(views, packed, rays2, alive2)[0]
    srays2 = jax.jit(pt._jit_shadow)(dev_scene, rays2, rec2)
    timed("bounce shadow (any-hit)",
          lambda: sh_traced(views, packed, srays2, alive2)[0])
    timed("bounce shadow (any-hit, origin-sorted)",
          lambda: sh_srt(views, packed, srays2, alive2)[0])


if __name__ == "__main__":
    main()
