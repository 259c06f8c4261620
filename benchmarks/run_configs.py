"""Run the five BASELINE.md evaluation configs and print one JSON line each.

1. Cornell box 256^2, primary + flat shading, PSNR vs the brute-force CPU
   reference oracle.
2. Bunny-scale mesh (~82k tris) 512^2, LBVH build + primary + shadow rays.
3. Sponza-scale terrain mesh (262k tris) 1080p, 4-bounce path trace with compaction.
4. 1k-instance two-level TLAS/BLAS rebuilt per frame.
5. Animated 1M-tri scene, per-frame LBVH rebuild + 8-bounce path trace.

Scale down with TPURT_CFG_SCALE=N (divides resolutions and counts) for smoke
runs on CPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("TPURT_CFG_CPU") == "1":  # smoke runs without the TPU
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

SCALE = max(int(os.environ.get("TPURT_CFG_SCALE", 1)), 1)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(config, **kw):
    print(json.dumps({"config": config, **kw}), flush=True)


def _setup(scene, width, height, tracer_kind="wide"):
    from tpu_raytracing.bvh import lbvh, wide
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace.traverse import pack_pairs
    from tpu_raytracing.trace.wide_fat import make_tiled_fat_tracer

    tris = jnp.asarray(scene.triangles)
    bvh, pairs = jax.jit(lbvh.build_lbvh)(tris)
    packed = pack_pairs(pairs)
    fat = jax.jit(wide.build_wide_fat)(bvh, packed.rows)
    camera = cam.camera_to_device(cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    tracer = make_tiled_fat_tracer(fat, width, height, 8, 8)
    return scene_to_device(scene), fat, packed, camera, tracer


def _time(fn, iters=3):
    """fn(i) must vary its input with i: this backend memoizes executions
    with identical inputs, turning naive repeat timing into cache hits."""
    out = jax.block_until_ready(fn(0))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(i + 1)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def config1_cornell():
    from tpu_raytracing.bvh.pairing import identity_pairs
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace.brute import make_brute_tracer
    from tpu_raytracing.trace.modes import RenderType
    from tpu_raytracing.trace.render import render_frame
    from tpu_raytracing.trace.traverse import pack_pairs
    from tpu_raytracing.utils.compare import psnr

    res = 256 // SCALE
    scene = procedural.cornell_box()
    dev, fat, packed, camera, tracer = _setup(scene, res, res)
    def _frame(i):
        cam_j = dict(camera, position=camera["position"] + i * 1e-4)
        return render_frame(fat, packed, dev, cam_j, res, res,
                            RenderType.DIFFUSE, tracer=tracer)

    dt, (img, _) = _time(_frame)
    tris = jnp.asarray(scene.triangles)
    ref_img, _ = render_frame(
        fat, pack_pairs(identity_pairs(tris)), dev, camera, res, res,
        RenderType.DIFFUSE, tracer=make_brute_tracer(tris),
    )
    score = psnr(np.asarray(img), np.asarray(ref_img))
    emit("1-cornell-256", ms_per_frame=round(dt * 1000, 2),
         mrays_per_s=round(res * res / dt / 1e6, 2),
         psnr_vs_cpu_reference=round(float(score), 2) if np.isfinite(score) else "inf")


def config2_bunny():
    from tpu_raytracing.bvh import lbvh
    from tpu_raytracing.scene.genasset import generate_rock
    from tpu_raytracing.scene.objio import load_obj
    from tpu_raytracing.trace.modes import RenderType
    from tpu_raytracing.trace.render import render_frame

    res = 512 // SCALE
    # A real file-based asset through the real loader path (OBJ + MTL +
    # texture + light.txt), bunny-class scale: 81,922 tris at full scale.
    import tempfile

    adir = os.path.join(tempfile.gettempdir(), f"tpurt_rock_s{SCALE}")
    obj = generate_rock(adir, subdivisions=6 if SCALE == 1 else 3)
    scene = load_obj(obj)
    dev, fat, packed, camera, tracer = _setup(scene, res, res)
    tris = jnp.asarray(scene.triangles)
    build = jax.jit(lbvh.build_lbvh)
    bt, _ = _time(lambda i: build(tris + i * 1e-5)[0])

    def _frame(i):
        cam_j = dict(camera, position=camera["position"] + i * 1e-4)
        return render_frame(fat, packed, dev, cam_j, res, res,
                            RenderType.TEXTURE_LIT_SHADOWS, tracer=tracer)

    dt, (img, tests) = _time(_frame)
    # primary + shadow: 2 rays per pixel
    emit("2-bunny-512-shadows", num_tris=scene.num_triangles,
         build_ms=round(bt * 1000, 3), ms_per_frame=round(dt * 1000, 2),
         mrays_per_s=round(2 * res * res / dt / 1e6, 2))


def config3_sponza():
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace.pathtrace import path_trace

    w, h = 1920 // SCALE, 1080 // SCALE
    w -= w % 8
    h -= h % 8
    scene = procedural.terrain(262_000 // SCALE)
    dev, fat, packed, camera, tracer = _setup(scene, w, h)

    def frame(i):
        cam_j = dict(camera, position=camera["position"] + i * 1e-4)
        return path_trace(fat, packed, dev, cam_j, w, h, num_bounces=4,
                          key=jax.random.PRNGKey(i), tracer=tracer)

    dt, (img, rays) = _time(frame)
    emit("3-sponza-1080p-4bounce", num_tris=scene.num_triangles,
         ms_per_frame=round(dt * 1000, 2),
         mrays_per_s=round(int(rays) / dt / 1e6, 2))


def config4_instances():
    from tpu_raytracing.bvh import lbvh, tlas
    from tpu_raytracing.scene.procedural import icosphere
    from tpu_raytracing.trace.instanced import trace_rays_instanced
    from tpu_raytracing.trace.ray import Rays
    from tpu_raytracing.trace.traverse import pack_pairs

    num_inst = 1000 // SCALE
    mesh = icosphere(3, radius=0.4)  # 1280-tri BLAS
    blas, pairs = jax.jit(lbvh.build_lbvh)(jnp.asarray(mesh))
    packed = pack_pairs(pairs)
    rng = np.random.default_rng(0)
    res = 512 // SCALE

    def transforms(t):
        out = np.zeros((num_inst, 3, 4), np.float32)
        angles = rng.uniform(0, 2 * np.pi, num_inst) + t
        out[:, 0, 0] = np.cos(angles)
        out[:, 0, 1] = -np.sin(angles)
        out[:, 1, 0] = np.sin(angles)
        out[:, 1, 1] = np.cos(angles)
        out[:, 2, 2] = 1.0
        out[:, :, 3] = rng.uniform(-8, 8, (num_inst, 3))
        return jnp.asarray(out)

    build = jax.jit(tlas.build_instanced)
    bt, inst_as = _time(lambda i: build(blas, transforms(i * 0.1)))

    xs = np.linspace(-8, 8, res, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs)
    rays = Rays(
        origin=jnp.asarray(np.stack([gx.ravel(), gy.ravel(),
                                     np.full(res * res, -30.0, np.float32)], -1)),
        direction=jnp.tile(jnp.asarray(np.array([[0, 0, 1]], np.float32)), (res * res, 1)),
        tmin=jnp.full((res * res,), 1e-4),
        tmax=jnp.full((res * res,), 100.0),
    )
    trace = jax.jit(trace_rays_instanced)

    def _trace(i):
        r = Rays(origin=rays.origin + i * 1e-4, direction=rays.direction,
                 tmin=rays.tmin, tmax=rays.tmax)
        return trace(inst_as, packed, r)

    dt, (rec, inst_id, _) = _time(_trace)
    emit("4-tlas-1k-instances", num_instances=num_inst,
         tlas_rebuild_ms=round(bt * 1000, 3), ms_per_frame=round(dt * 1000, 2),
         mrays_per_s=round(res * res / dt / 1e6, 2),
         hit_fraction=round(float(np.asarray(rec.hit).mean()), 3))


def config5_animated():
    from tpu_raytracing.bvh import lbvh, wide
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace.pathtrace import path_trace
    from tpu_raytracing.trace.traverse import pack_pairs
    from tpu_raytracing.trace.wide_fat import make_tiled_fat_tracer
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene.types import scene_to_device

    num = 1_000_000 // SCALE
    res = 512 // SCALE
    scene = procedural.terrain(num)
    dev = scene_to_device(scene)
    camera = cam.camera_to_device(cam.initialise_camera(scene.aabb_min, scene.aabb_max))

    def full_build(tris):
        bvh, pairs = lbvh.build_lbvh(tris)
        packed = pack_pairs(pairs)
        return wide.build_wide_fat(bvh, packed.rows), packed

    build = jax.jit(full_build)
    base = scene.triangles
    fat, packed = jax.block_until_ready(build(jnp.asarray(base)))
    # wide=None: the per-frame fat structure rides in the trav argument.
    tracer = make_tiled_fat_tracer(None, res, res, 8, 8)

    # Warm the path-trace stages once.
    _ = jax.block_until_ready(path_trace(
        fat, packed, dev, camera, res, res, num_bounces=8,
        key=jax.random.PRNGKey(0), tracer=tracer))

    frames = 3
    t0 = time.perf_counter()
    total_rays = 0
    for f in range(frames):
        tris = jnp.asarray(procedural.animate_triangles(base, f * 0.1))
        fat, packed = build(tris)
        img, rays = path_trace(fat, packed, dev, camera, res, res,
                               num_bounces=8, key=jax.random.PRNGKey(f),
                               tracer=tracer)
        total_rays += int(jax.block_until_ready(rays))
    dt = (time.perf_counter() - t0) / frames
    emit("5-animated-1M-8bounce", num_tris=num, ms_per_frame=round(dt * 1000, 1),
         fps=round(1.0 / dt, 2), mrays_per_s=round(total_rays / frames / dt / 1e6, 2))


def main():
    for fn in [config1_cornell, config2_bunny, config3_sponza,
               config4_instances, config5_animated]:
        try:
            log(f"--- {fn.__name__} ---")
            fn()
        except Exception as e:  # keep going; report the failure
            emit(fn.__name__, error=str(e)[:200])


if __name__ == "__main__":
    main()
