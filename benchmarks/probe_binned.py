"""Treelet-binned bounce pass vs the plain presorted packet pass.

Same bounce-ray set as probe_mt (cell+octant sorted); reports total ms,
item count (capacity check), and pop counters for each config.
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
    from tpu_raytracing.trace import binned as bn
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

    num = res * res
    rays = jax.jit(generate_primary_rays, static_argnames=("width", "height"))(
        camera, res, res)
    alive = jnp.ones((num,), bool)
    max_t = camera["max_depth"]

    tracer0 = sp.make_split_pallas_tracer(None, None, res, res, c_slots=4)
    rec, _ = jax.jit(lambda v, p, r, a: tracer0(v, p, r, active=a))(
        views, packed, rays, alive)
    u = jax.random.uniform(jax.random.PRNGKey(0), (num, 2))
    _, _, alive2, _, rays2 = jax.jit(lambda *a: pt._bounce_stage(
        *a, compaction=True, sort_cells=True))(
        dev_scene, packed, rays, rec, jnp.zeros((num,), bool),
        jnp.ones((num, 3), jnp.float32), jnp.zeros((num, 3), jnp.float32),
        alive, jnp.arange(num, dtype=jnp.int32), u, max_t)
    log(f"bounce rays alive: {int(jnp.sum(alive2.astype(jnp.int32)))}")

    def run(name, f, kk):
        out = f(views, packed, rays2, alive2, 0.0)
        jax.block_until_ready(out)
        rec_, stats = out[0], out[1]
        extra = f"  needed={int(out[2])}" if len(out) > 2 else ""
        ip = float(jnp.sum(stats.box_tests.astype(jnp.float32))) / (8 * kk)
        lp = float(jnp.sum(stats.tri_tests.astype(jnp.float32))) / (
            2 * sp.LEAFW * kk)
        nhit = int(jnp.sum(rec_.hit.astype(jnp.int32)))
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(views, packed, rays2, alive2, (i + 1) * 1e-5)
        float(jnp.sum(out[0].t))
        ms = (time.perf_counter() - t0) / iters * 1000.0
        log(f"{name}: {ms:.0f} ms  hits={nhit} ipops={ip:.0f} "
            f"lpops={lp:.0f}{extra}")

    fplain = jax.jit(lambda v, p, r, a, j: sp.trace_rays_split_pallas(
        v, p, r.replace(origin=r.origin + j), active=a, k=256, c_slots=8))
    run("plain presorted k=256 C=8", fplain, 256)
    for kk, cs, cf in ((256, 8, 2.0), (128, 8, 2.0), (128, 16, 2.0)):
        fb = jax.jit(
            lambda v, p, r, a, j, kk=kk, cs=cs, cf=cf: bn.trace_rays_binned(
                v, p, r.replace(origin=r.origin + j), active=a, k=kk,
                c_slots=cs, cap_factor=cf, return_needed=True))
        run(f"binned k={kk} C={cs}", fb, kk)


if __name__ == "__main__":
    main()
