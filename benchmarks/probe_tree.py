"""Tree quality vs the flagship kernel: Morton-bucket tree vs binned-SAH.

Same rays (bounce set derived once from the bucket-tree primary hit set),
same kernel configs as bench; prints per-pass ms + pop counts for each
tree. Localizes how much of the bounce pass's 1166 ms is tree quality.

ROUND-2 STATUS: the while_loop SAH frontier at 1M sat >20 min (its ~50
levels each scatter into loop-carried arena buffers — the documented
carried-operand pathology). The host-stepped frontier (one jitted step
per level, arena passed as jit ARGUMENTS) sidesteps it; this probe now
uses build_sah_split(host_stepped=True) so the 1M comparison can run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TPURT_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    res = int(os.environ.get("TPURT_BENCH_RES", 1024))
    iters = int(os.environ.get("TPURT_BENCH_ITERS", 3))

    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.bvh.split_convert import build_sah_split
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
    def build_bucket(t):
        split, packed = bucket.build_bucket_split(
            t, enable_pairs=True, leaf_width=sp.LEAFW)
        return sp.prep_split_views(split, packed), packed

    t0 = time.perf_counter()
    views_b, packed_b = build_bucket(triangles)
    jax.block_until_ready(views_b)
    log(f"bucket build (cold): {time.perf_counter() - t0:.1f} s")

    t0 = time.perf_counter()
    split_s, packed_s = build_sah_split(
        triangles, enable_pairs=True, leaf_width=sp.LEAFW,
        host_stepped=True)
    views_s = jax.jit(sp.prep_split_views)(split_s, packed_s)
    jax.block_until_ready(views_s)
    log(f"sah build host-stepped (cold): {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    split_s2, packed_s2 = build_sah_split(
        triangles, enable_pairs=True, leaf_width=sp.LEAFW,
        host_stepped=True)
    jax.block_until_ready(split_s2.inner)
    log(f"sah build host-stepped (warm): {time.perf_counter() - t0:.2f} s")

    num = res * res
    rays = jax.jit(generate_primary_rays, static_argnames=("width", "height"))(
        camera, res, res)
    alive = jnp.ones((num,), bool)
    max_t = camera["max_depth"]

    # bounce rays from the bucket-tree primary hits (same set for both)
    tracer0 = sp.make_split_pallas_tracer(None, None, res, res)
    rec, _ = jax.jit(lambda v, p, r, a: tracer0(v, p, r, active=a))(
        views_b, packed_b, rays, alive)
    u = jax.random.uniform(jax.random.PRNGKey(0), (num, 2))
    _, _, alive2, _, rays2 = jax.jit(lambda *a: pt._bounce_stage(
        *a, compaction=True, sort_cells=True))(
        dev_scene, packed_b, rays, rec, jnp.zeros((num,), bool),
        jnp.ones((num, 3), jnp.float32), jnp.zeros((num, 3), jnp.float32),
        alive, jnp.arange(num, dtype=jnp.int32), u, max_t)
    log(f"bounce rays alive: {int(jnp.sum(alive2.astype(jnp.int32)))}")

    def bench_pass(name, f, views, packed, rays_, alive_):
        out = f(views, packed, rays_, alive_, 0.0)
        jax.block_until_ready(out)
        _, stats = out
        ip = float(jnp.sum(stats.box_tests.astype(jnp.float32))) / (8 * 256)
        lp = float(jnp.sum(stats.tri_tests.astype(jnp.float32))) / (
            2 * sp.LEAFW * 256)
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(views, packed, rays_, alive_, (i + 1) * 1e-5)
        float(jnp.sum(out[0].t))
        ms = (time.perf_counter() - t0) / iters * 1000.0
        log(f"{name}: {ms:.0f} ms  ipops={ip:.0f} lpops={lp:.0f}")

    prim = sp.make_split_pallas_tracer(None, None, res, res, c_slots=4)
    fprim = jax.jit(lambda v, p, r, a, j: prim(
        v, p, r.replace(origin=r.origin + j), active=a))
    fbounce = jax.jit(lambda v, p, r, a, j: sp.trace_rays_split_pallas(
        v, p, r.replace(origin=r.origin + j), active=a, k=256, c_slots=8))

    for name, (vv, pp) in (("bucket", (views_b, packed_b)),
                           ("sah", (views_s, packed_s))):
        bench_pass(f"primary C=4 [{name}]", fprim, vv, pp, rays, alive)
        bench_pass(f"bounce C=8 [{name}]", fbounce, vv, pp, rays2, alive2)


if __name__ == "__main__":
    main()
