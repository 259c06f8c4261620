"""Bounce-closest sweep in the SORTED regime: cell+octant sorting cut
total pops 6.5x (3.58M -> 552k at k=256) but time only 1.5x — the kernel
flipped from scalar-control-bound to vector-compute-bound (a leaf pop
runs Moller-Trumbore over leafw x k lanes ~ 1.5 us at 64x256). This
sweeps leaf width x packet size under the sort and prints interior/leaf
pops separately to locate the vector work."""

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

    def build_lw(lw):
        @jax.jit
        def build(t):
            split, packed = bucket.build_bucket_split(
                t, enable_pairs=True, leaf_width=lw)
            return sp.prep_split_views(split, packed), packed

        return build(triangles)

    num = res * res
    rays = jax.jit(generate_primary_rays, static_argnames=("width", "height"))(
        camera, res, res)
    alive = jnp.ones((num,), bool)
    max_t = camera["max_depth"]

    views64, packed64 = build_lw(64)
    tracer0 = sp.make_split_pallas_tracer(None, None, res, res)
    rec, _ = jax.jit(lambda v, p, r, a: tracer0(v, p, r, active=a))(
        views64, packed64, rays, alive)
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (num, 2))
    bounce = jax.jit(lambda *a: pt._bounce_stage(*a, compaction=True))
    _, _, alive2, _, rays2 = bounce(
        dev_scene, packed64, rays, rec, jnp.zeros((num,), bool),
        jnp.ones((num, 3), jnp.float32), jnp.zeros((num, 3), jnp.float32),
        alive, jnp.arange(num, dtype=jnp.int32), u, max_t)
    log(f"bounce rays alive: {int(jnp.sum(alive2.astype(jnp.int32)))}")

    variants = [
        (64, 256, 15),
        (64, 256, 13),
        (64, 256, 17),
        (128, 256, 15),
    ]
    cache = {64: (views64, packed64)}
    for lw, kk, shift in variants:
        if lw not in cache:
            cache[lw] = build_lw(lw)
        v_lw, p_lw = cache[lw]
        tr = sp.make_split_pallas_tracer(None, None, res, res, k=kk,
                                         c_slots=8, leafw=lw,
                                         sort_mode="cell_octant",
                                         cell_shift=shift)
        f = jax.jit(lambda v, p, r, a, j, tr=tr: tr(
            v, p, r.replace(origin=r.origin + j), active=a))
        out = f(v_lw, p_lw, rays2, alive2, 0.0)
        jax.block_until_ready(out)
        _, stats_o = out
        # float sums: the int32 repeat-sum overflows at ~2^31 ray-tests
        ip = int(float(jnp.sum(stats_o.box_tests.astype(jnp.float32)))
                 / (8 * kk))
        lp = int(float(jnp.sum(stats_o.tri_tests.astype(jnp.float32)))
                 / (2 * lw * kk))
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(v_lw, p_lw, rays2, alive2, (i + 1) * 1e-5)
        float(jnp.sum(out[0].t))
        ms = (time.perf_counter() - t0) / iters * 1000.0
        log(f"bounce lw={lw} k={kk} shift={shift}: {ms:.0f} ms "
            f"(ipops={ip}, lpops={lp})")


if __name__ == "__main__":
    main()
