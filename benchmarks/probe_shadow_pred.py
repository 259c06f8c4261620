"""Structural probe: occluder-prediction hit rate for shadow rays.

Ray-locality prediction (cf. arxiv 1910.01304, PAPERS.md): shadow rays
from nearby origins toward the same light tend to share an occluder.
A two-phase any-hit pass could (A) run the full DDA on 1-of-G pilot
rays in origin-sorted order, (B) test every ray against its pilot's
occluder with ONE dense Moller-Trumbore — any valid hit retires an
any-hit ray — and (C) finish only the misses through the normal loop
(residue-compacted). The win is bounded by the phase-B retire rate,
which is backend-independent: this probe measures it on the bench's
real bounce-shadow workload for several pilot strides.

Run on CPU (structure only): TPURT_PLATFORM=cpu python -u
benchmarks/probe_shadow_pred.py. Knobs: TPURT_PROBE_TRIS / _RES.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TPURT_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    num_tris = int(os.environ.get("TPURT_PROBE_TRIS", 200_000))
    res = int(os.environ.get("TPURT_PROBE_RES", 512))

    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.bvh.grid import (auto_res3, build_grid,
                                         check_grid_capacity)
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace import pathtrace as pt
    from tpu_raytracing.trace import split_pallas as sp
    from tpu_raytracing.trace.grid_trace import _mt_cols, trace_rays_grid
    from tpu_raytracing.trace.ray import generate_primary_rays

    scene = procedural.terrain(num_tris)
    dev_scene = scene_to_device(scene)
    host_cam = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    host_cam.position = (scene.aabb_max * 0.0).astype("float32")
    host_cam.position[1] = float(scene.aabb_max[1]) * 1.5 + 20.0
    host_cam.position[2] = float(scene.aabb_min[2]) * 0.7
    host_cam.yaw, host_cam.pitch = 0.0, 0.7
    camera = cam.camera_to_device(cam.update_camera(host_cam))
    triangles = jnp.asarray(scene.triangles)

    split, packed = jax.jit(lambda t: bucket.build_bucket_split(
        t, enable_pairs=True, leaf_width=sp.LEAFW))(triangles)
    bucket.check_split_capacity(split, num_tris)
    res3 = auto_res3(scene.aabb_max - scene.aabb_min, num_tris)
    grid = jax.jit(build_grid, static_argnames=("res",))(
        packed.rows, split.num_leaves, res=res3)
    check_grid_capacity(grid)

    # bench-identical bounce derivation: primary trace -> bounce stage
    # (compaction sorts rays by origin cell) -> shadow rays toward the
    # light from the bounce-hit points
    num = res * res
    rays = jax.jit(generate_primary_rays,
                   static_argnames=("width", "height"))(camera, res, res)
    alive = jnp.ones((num,), bool)
    views = jax.jit(sp.prep_split_views)(split, packed)
    tracer0 = sp.make_split_pallas_tracer(None, None, res, res)
    rec0, _ = jax.jit(lambda v, p, r, a: tracer0(v, p, r, active=a))(
        views, packed, rays, alive)
    u = jax.random.uniform(jax.random.PRNGKey(0), (num, 2))
    _, _, alive2, _, rays2 = jax.jit(lambda *a: pt._bounce_stage(
        *a, compaction=True, sort_cells=True))(
        dev_scene, packed, rays, rec0, jnp.zeros((num,), bool),
        jnp.ones((num, 3), jnp.float32), jnp.zeros((num, 3), jnp.float32),
        alive, jnp.arange(num, dtype=jnp.int32), u, camera["max_depth"])
    recb, _ = jax.jit(lambda g, p, r, a: trace_rays_grid(
        g, p, r, active=a))(grid, packed, rays2, alive2)

    from tpu_raytracing.trace.render import _shadow_rays

    srays = jax.jit(_shadow_rays)(dev_scene, rays2, recb)
    sactive = alive2 & recb.hit

    # ground truth: full any-hit pass, keep the winning row id
    rec_s, _ = jax.jit(lambda g, p, r, a: trace_rays_grid(
        g, p, r, active=a, any_hit=True))(grid, packed, srays, sactive)
    occluded = np.asarray(rec_s.hit & sactive)
    # prim encodes (row << 1 | second-tri); recover the row id
    occ_row = np.asarray(rec_s.tri_id) >> 1
    n_act = int(np.asarray(sactive).sum())
    n_occ = int(occluded.sum())
    log(f"shadow rays: {n_act} active, {n_occ} occluded "
        f"({n_occ / max(n_act, 1) * 100:.1f}%)")

    # phase-B simulation for pilot strides G: prediction for ray i is
    # the occluder of the last PRECEDING pilot (sorted order); test it
    # with the real MT against ray i.
    rows = packed.rows
    ox, oy, oz = (srays.origin[:, i] for i in range(3))
    dx, dy, dz = (srays.direction[:, i] for i in range(3))
    for g_stride in (8, 16, 32, 64):
        pilot = (np.arange(num) // g_stride) * g_stride
        pred = occ_row[pilot]
        pred_valid = occluded[pilot]
        pt_cols = jnp.asarray(rows)[jnp.asarray(pred), :12].T  # [12, R]
        t, enc = _mt_cols(pt_cols, ox, oy, oz, dx, dy, dz,
                          srays.tmin, srays.tmax)
        hit_pred = np.asarray(enc >= 0) & pred_valid & np.asarray(sactive)
        # retire rate over the rays that NEED retiring (occluded ones;
        # unoccluded rays always walk their full path in any scheme)
        rate_occ = hit_pred[occluded].mean() if n_occ else 0.0
        rate_all = hit_pred[np.asarray(sactive)].mean() if n_act else 0.0
        log(f"stride {g_stride:3d}: phase-B retires "
            f"{rate_all * 100:5.1f}% of active rays "
            f"({rate_occ * 100:5.1f}% of occluded; "
            f"pilot cost 1/{g_stride})")


if __name__ == "__main__":
    main()
