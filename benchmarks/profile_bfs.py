"""BFS wavefront tracer vs the packet Pallas kernel on the bounce-closest
pass (1M terrain, real first-bounce rays) + the primary pass."""

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
    from tpu_raytracing.trace.ray import generate_primary_rays
    from tpu_raytracing.trace.wavefront_bfs import (
        prep_bfs_views,
        trace_rays_bfs,
    )

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

    @jax.jit
    def build(t):
        split, packed = bucket.build_bucket_split(
            t, enable_pairs=True, leaf_width=sp.LEAFW)
        return (sp.prep_split_views(split, packed),
                prep_bfs_views(split, packed), packed)

    views_p, views_b, packed = build(triangles)

    num = res * res
    rays = jax.jit(generate_primary_rays, static_argnames=("width", "height"))(
        camera, res, res)
    alive = jnp.ones((num,), bool)
    max_t = camera["max_depth"]

    tracer = sp.make_split_pallas_tracer(None, None, res, res)
    traced = jax.jit(lambda v, p, r, a: tracer(v, p, r, active=a))
    rec, _ = traced(views_p, packed, rays, alive)
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
    n_alive = int(jnp.sum(alive2.astype(jnp.int32)))
    log(f"bounce rays alive: {n_alive}")

    def bench(name, f, *args):
        t0 = time.perf_counter()
        out = f(*args, 0.0)
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(jnp.ravel(leaf)[:4].astype(jnp.float32)))
        log(f"{name}: first call {time.perf_counter()-t0:.1f} s")
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(*args, (i + 1) * 1e-5)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(jnp.ravel(leaf)[:4].astype(jnp.float32)))
        log(f"{name}: {(time.perf_counter()-t0)/iters*1000:.0f} ms")
        return out

    cf = float(os.environ.get("TPURT_BFS_CAP", "3.0"))
    lf = float(os.environ.get("TPURT_BFS_LEAF", "1.5"))

    @jax.jit
    def bfs_bounce(v, p, r, a, j):
        rec, stats, ovf = trace_rays_bfs(
            v, p, r.replace(origin=r.origin + j), active=a,
            cap_factor=cf, leaf_factor=lf)
        return rec.t, stats.box_tests, stats.tri_tests, ovf

    out = bench("BFS bounce closest", bfs_bounce, views_b, packed, rays2,
                alive2)
    log(f"  overflow={bool(out[3])} "
        f"box_tests={int(jnp.sum(out[1], dtype=jnp.int64))} "
        f"tri_tests={int(jnp.sum(out[2], dtype=jnp.int64))}")

    @jax.jit
    def pk_bounce(v, p, r, a, j):
        rec, stats = tracer(v, p, r.replace(origin=r.origin + j), active=a)
        return rec.t, stats.box_tests, stats.tri_tests

    out = bench("packet bounce closest", pk_bounce, views_p, packed, rays2,
                alive2)
    log(f"  box_tests={int(jnp.sum(out[1], dtype=jnp.int64))} "
        f"tri_tests={int(jnp.sum(out[2], dtype=jnp.int64))}")

    out = bench("BFS primary", bfs_bounce, views_b, packed, rays, alive)
    log(f"  overflow={bool(out[3])}")


if __name__ == "__main__":
    main()
