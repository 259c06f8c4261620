"""Per-stage frame profile at bench scale: where do the ~2.07 s/frame go?

Times each stage of the path-traced frame separately (primary closest,
primary shadow, bounce stage shading/compaction, bounce closest, bounce
shadow, finalize) with honest fencing: vary inputs per iter, fetch a
scalar. Stage sum exceeds pipelined frame time slightly (dispatch syncs);
the map still localizes the non-kernel glue.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tpu_raytracing.bvh import bucket
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.scene.types import scene_to_device
from tpu_raytracing.trace import split_pallas as sp
from tpu_raytracing.trace import pathtrace as pt
from tpu_raytracing.trace.render import _shadow_rays

NUM_TRIS = 1_000_000
RES = 1024


def fetch(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]).astype(jnp.float32))


def timed(name, fn, *args, iters=3, vary=None):
    fn(*args)  # compile
    fetch(fn(*args))
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        if vary is not None:
            a[vary[0]] = vary[1](a[vary[0]], i)
        out = fn(*a)
    fetch(out)
    ms = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{name}: {ms:.1f} ms", flush=True)
    return out


def main():
    print(f"device={jax.devices()[0]}, {NUM_TRIS} tris, {RES}x{RES}", flush=True)
    scene = procedural.terrain(NUM_TRIS)
    dev_scene = scene_to_device(scene)
    host_cam = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    host_cam.position = (scene.aabb_max * 0.0).astype("float32")
    host_cam.position[1] = float(scene.aabb_max[1]) * 1.5 + 20.0
    host_cam.position[2] = float(scene.aabb_min[2]) * 0.7
    host_cam.yaw = 0.0
    host_cam.pitch = 0.7
    camera = cam.camera_to_device(cam.update_camera(host_cam))
    triangles = jnp.asarray(scene.triangles)

    # prep_split_views must run INSIDE the build jit: eager prep emits
    # view layouts the kernel DMAs hit badly (primary measured 271 ms on
    # eagerly-prepped views vs 132 on jit-prepped — probe_mt vs the old
    # profile; bench preps in-jit and its frame total matches 132).
    views, packed = jax.jit(lambda t: (lambda s, p: (
        sp.prep_split_views(s, p), p))(*bucket.build_bucket_split(
            t, enable_pairs=True, leaf_width=sp.LEAFW)))(triangles)

    # Mirror bench.py's per-pass configs exactly.
    tracer = sp.make_split_pallas_tracer(None, None, RES, RES, c_slots=4)
    bounce_tracer = sp.make_split_pallas_tracer(
        None, None, RES, RES, k=256, c_slots=16, sort_mode="presorted")
    shadow_tracer = sp.make_split_pallas_tracer(None, None, RES, RES,
                                                any_hit=True, c_slots=4)
    shadow_tracer_b = sp.make_split_pallas_tracer(None, None, RES, RES,
                                                  k=256, any_hit=True,
                                                  c_slots=8,
                                                  sort_mode="origin")
    traced = pt._jitted_tracer(tracer)
    traced_b = pt._jitted_tracer(bounce_tracer)
    shadow_traced = pt._jitted_tracer(shadow_tracer)
    shadow_traced_b = pt._jitted_tracer(shadow_tracer_b)

    num = RES * RES
    max_t = camera["max_depth"]
    gen = jax.jit(pt.generate_primary_rays, static_argnames=("width", "height"))

    def vary_rays(rays, i):
        return pt.Rays(rays.origin + (i + 1) * 1e-5, rays.direction,
                       rays.tmin, rays.tmax)

    rays = timed("gen primary", lambda c: gen(c, RES, RES), camera)
    pixel = jnp.arange(num, dtype=jnp.int32)
    throughput = jnp.ones((num, 3), jnp.float32)
    radiance = jnp.zeros((num, 3), jnp.float32)
    alive = jnp.ones((num,), bool)
    u_frame = jax.random.uniform(jax.random.PRNGKey(0), (num, 2))

    rec, _ = timed("primary closest", lambda t, p, r, a: traced(t, p, r, a),
                   views, packed, rays, alive, vary=(2, vary_rays))
    srays = timed("shadow-ray construct", pt._jit_shadow, dev_scene, rays, rec)
    srec, _ = timed("primary shadow (any-hit)",
                    lambda t, p, r, a: shadow_traced(t, p, r, a),
                    views, packed, srays, alive, vary=(2, vary_rays))
    out = timed(
        "bounce stage 0 (shade+NEE+sample+sortcompact)",
        pt._jit_bounce_stage(True, True, True),
        dev_scene, packed, rays, rec, srec.hit, throughput, radiance,
        alive, pixel, u_frame, max_t)
    radiance, throughput, alive, pixel, brays = out
    n_alive = int(jnp.sum(alive.astype(jnp.int32)))
    print(f"  bounce rays alive: {n_alive}", flush=True)

    brec, _ = timed("bounce closest", lambda t, p, r, a: traced_b(t, p, r, a),
                    views, packed, brays, alive, vary=(2, vary_rays))
    bsrays = timed("bounce shadow-ray construct", pt._jit_shadow,
                   dev_scene, brays, brec)
    bsrec, _ = timed("bounce shadow (any-hit)",
                     lambda t, p, r, a: shadow_traced_b(t, p, r, a),
                     views, packed, bsrays, alive, vary=(2, vary_rays))
    out = timed(
        "bounce stage 1 (shade+NEE only, final)",
        pt._jit_bounce_stage(True, True, False),
        dev_scene, packed, brays, brec, bsrec.hit, throughput, radiance,
        alive, pixel, u_frame, max_t)
    radiance = out[0]
    timed("finalize", pt._finalize, radiance, pixel)
    print("done", flush=True)


if __name__ == "__main__":
    main()
