"""Measure the stale-top stack skip + the bounce-shadow sort fix.

Variants on the 1M-tri terrain at 1024^2 (bench camera):
  1. bounce closest, stale_skip off (round-2 baseline ~1166 ms)
  2. bounce closest, stale_skip on
  3. bounce closest, skip on + diag_waste (residual stale share)
  4. primary closest, skip off vs on
  5. bounce shadow: presorted (bench wiring, 444 ms) vs own origin sort
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
    max_t = camera["max_depth"]

    tracer0 = sp.make_split_pallas_tracer(None, None, res, res, c_slots=8)
    rec, _ = jax.jit(lambda v, p, r, a: tracer0(v, p, r, active=a))(
        views, packed, rays, alive)
    u = jax.random.uniform(jax.random.PRNGKey(0), (num, 2))
    bounce = jax.jit(lambda *a: pt._bounce_stage(
        *a, compaction=True, sort_cells=True))
    _, _, alive2, _, rays2 = bounce(
        dev_scene, packed, rays, rec, jnp.zeros((num,), bool),
        jnp.ones((num, 3), jnp.float32), jnp.zeros((num, 3), jnp.float32),
        alive, jnp.arange(num, dtype=jnp.int32), u, max_t)
    log(f"bounce rays alive: {int(jnp.sum(alive2.astype(jnp.int32)))}")

    def timed(name, f, *args):
        out = f(*args, 0.0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(*args, (i + 1) * 1e-5)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1000.0
        log(f"{name}: {ms:.0f} ms")
        return out

    def raw(skip, diag=False, any_hit=False):
        return jax.jit(lambda v, p, r, a, j: sp.trace_rays_split_pallas(
            v, p, r.replace(origin=r.origin + j), active=a, k=256,
            c_slots=8, any_hit=any_hit, diag_waste=diag, stale_skip=skip))

    timed("bounce closest skip=off", raw(False), views, packed, rays2, alive2)
    out = timed("bounce closest skip=ON", raw(True), views, packed, rays2,
                alive2)
    _, stats = out
    ip = int(float(jnp.sum(stats.box_tests.astype(jnp.float32))) / (8 * 256))
    lp = int(float(jnp.sum(stats.tri_tests.astype(jnp.float32)))
             / (2 * sp.LEAFW * 256))
    log(f"  skip=ON pops: ipops={ip} lpops={lp} "
        f"(baseline 604059/866053)")
    out = timed("bounce closest skip=ON diag", raw(True, diag=True),
                views, packed, rays2, alive2)
    _, stats = out
    ip = int(float(jnp.sum(stats.box_tests.astype(jnp.float32))) / (8 * 256))
    lp = int(float(jnp.sum(stats.tri_tests.astype(jnp.float32)))
             / (2 * sp.LEAFW * 256))
    log(f"  residual WASTED: ipops={ip} lpops={lp} (was 25409/394745)")

    timed("primary closest skip=off", raw(False), views, packed, rays, alive)
    timed("primary closest skip=ON", raw(True), views, packed, rays, alive)

    # --- bounce shadow: presorted (bench wiring) vs own origin sort ---
    brec, _ = jax.jit(lambda v, p, r, a: sp.trace_rays_split_pallas(
        v, p, r, active=a, k=256, c_slots=8))(views, packed, rays2, alive2)
    srays = pt._jit_shadow(dev_scene, rays2, brec)
    for mode in ("presorted", "origin"):
        tr = sp.make_split_pallas_tracer(None, None, res, res, k=256,
                                         c_slots=8, any_hit=True,
                                         sort_mode=mode)
        f = jax.jit(lambda v, p, r, a, j, tr=tr: tr(
            v, p, r.replace(origin=r.origin + j), active=a))
        timed(f"bounce shadow sort={mode}", f, views, packed, srays, alive2)


if __name__ == "__main__":
    main()
