"""v4 (leaf-batched pops) vs v3 split kernel on the real TPU at 1M —
the round-5 VERDICT #1 measurement: does amortizing the per-pop scalar
control over LB leaf windows break the ~550 ns/pop wall?

Passes mirror benchmarks/probe_lane_kernel.py's honest-timing protocol
(vary inputs, fetch a value): primary 1024^2 (coherent) and the real
first-bounce closest set sorted by the production 'tid' key. Reports
ms, Mrays/s, pops (interior + leaf window visits) and ns/pop for both
kernels.

Knobs: TPURT_PROBE_TRIS / TPURT_PROBE_RES / TPURT_PROBE_ITERS,
TPURT_SPLIT_LB (batch width), TPURT_PROBE_PASSES (subset of "PB",
default both), TPURT_PROBE_VERSIONS (comma list, default "3,4").
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TPURT_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from tpu_raytracing.bvh import bucket, treelet
from tpu_raytracing.ops.gather import take_rows
from tpu_raytracing.ops.morton import morton3d
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace import split_pallas as sp
from tpu_raytracing.trace.packet import tile_reorder
from tpu_raytracing.trace.ray import Rays, generate_primary_rays

N = int(os.environ.get("TPURT_PROBE_TRIS", "1000000"))
RES = int(os.environ.get("TPURT_PROBE_RES", "1024"))
ITERS = int(os.environ.get("TPURT_PROBE_ITERS", "4"))
VERSIONS = [int(v) for v in os.environ.get(
    "TPURT_PROBE_VERSIONS", "3,4").split(",")]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_pops(label, fn, views, packed, rays, act, nrays, k, w, leafw,
               n=ITERS):
    (t_, tri_), stats = fn(views, packed, rays, act)
    jax.block_until_ready(t_)
    t0 = time.perf_counter()
    for i in range(n):
        (t_, tri_), stats = fn(
            views, packed,
            rays.replace(tmin=rays.tmin + (i % 3) * 1e-7), act)
    float(jnp.sum(t_[:64]))
    dt = (time.perf_counter() - t0) / n
    # stats.box_tests = repeat(ipops*w, k); tri_tests = repeat(lp*2*leafw)
    ip = int(jnp.sum(stats.box_tests[::k] // w))
    lp = int(jnp.sum(stats.tri_tests[::k] // (2 * leafw)))
    pops = ip + lp
    log(f"{label}: {dt*1e3:.1f} ms  ({nrays/dt/1e6:.2f} Mrays/s; "
        f"ipops {ip/1e3:.0f}k lpops {lp/1e3:.0f}k -> "
        f"{dt/max(pops,1)*1e9:.0f} ns/pop)")
    return dt


def main():
    log(f"device: {jax.devices()[0]}  N={N} RES={RES} "
        f"LB={sp.LEAF_BATCH} LEAFW={sp.LEAFW}")
    scene = procedural.terrain(N)
    tris = jnp.asarray(scene.triangles)
    front_j = jax.jit(lambda t: bucket.split_front(t, enable_pairs=True))
    front = front_j(tris)
    views = jax.jit(sp.prep_split_views)(
        *jax.jit(lambda f: bucket.emit_split(f, leaf_width=sp.LEAFW))(front))
    packed = jax.jit(
        lambda f: bucket.emit_split(f, leaf_width=sp.LEAFW)[1])(front)
    w = views[1].shape[1]

    host_cam = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    if os.environ.get("TPURT_PROBE_AERIAL", "1") == "1":
        # bench.py's aerial view (the headline camera): the scene-framing
        # default sits INSIDE the hills and makes every ray graze
        # hundreds of cells - a different (and pathological) regime.
        host_cam.position = (scene.aabb_max * 0.0).astype("float32")
        host_cam.position[1] = float(scene.aabb_max[1]) * 1.5 + 20.0
        host_cam.position[2] = float(scene.aabb_min[2]) * 0.7
        host_cam.yaw = 0.0
        host_cam.pitch = 0.7
    camera = cam.camera_to_device(cam.update_camera(host_cam))
    rays = generate_primary_rays(camera, RES, RES)
    nrays = RES * RES
    tiled = jax.block_until_ready(
        jax.tree.map(lambda a: tile_reorder(a, RES, RES, 16, 8), rays))
    ones = jnp.ones((nrays,), bool)

    passes = os.environ.get("TPURT_PROBE_PASSES", "PB")

    def make_fn(kv, k, cs):
        # big arrays as jit ARGUMENTS: closure constants overflow the
        # remote-compile payload (HTTP 413, docs/TPU_NOTES.md)
        return jax.jit(lambda v, p, r, a: sp.trace_rays_split_pallas(
            v, p, r, active=a, k=k, c_slots=cs, raw=True,
            kernel_v=kv))

    # ---- P: primary (screen-tile packets, coherent; K=256 C=4) ----
    out_p = None
    for kv in VERSIONS:
        fn = make_fn(kv, 256, 4)
        if "P" in passes:
            timed_pops(f"P v{kv} primary", fn, views, packed, tiled, ones,
                       nrays, 256, w, sp.LEAFW)
        if out_p is None:
            out_p = jax.block_until_ready(fn(views, packed, tiled, ones)[0])

    if "B" not in passes:
        return

    # ---- B: real first-bounce set, production 'tid' sort ----
    t_flat, tri_flat = out_p
    hit = tri_flat >= 0
    hp = tiled.origin + tiled.direction * t_flat[:, None]
    u = jax.random.uniform(jax.random.PRNGKey(9), (nrays, 2))
    r_ = jnp.sqrt(u[:, 0])
    phi = 2 * np.pi * u[:, 1]
    d = jnp.stack([r_ * jnp.cos(phi), r_ * jnp.sin(phi),
                   jnp.sqrt(1.0 - u[:, 0])], axis=1)
    brays = Rays(origin=hp, direction=d,
                 tmin=jnp.full((nrays,), 1e-3, jnp.float32),
                 tmax=jnp.full((nrays,), 1e30, jnp.float32))
    lo = jnp.min(hp, axis=0)
    hi = jnp.max(hp, axis=0)
    cell = morton3d((hp - lo) / jnp.maximum(hi - lo, 1e-20)).astype(jnp.int32)
    octant = ((d[:, 0] > 0).astype(jnp.int32)
              | ((d[:, 1] > 0).astype(jnp.int32) << 1)
              | ((d[:, 2] > 0).astype(jnp.int32) << 2))
    pair_tid = jax.jit(treelet.build_pair_tid)(front)
    otid = pair_tid[jnp.maximum(tri_flat, 0) // 2]
    dead = (~hit).astype(jnp.int32)
    key = ((dead << 30) | (otid << 18) | (octant << 15)
           | ((cell >> 15) & 0x7FFF))
    perm = jnp.argsort(key, stable=True)
    bsort = jax.tree.map(lambda a: take_rows(a, perm), brays)
    act = hit[perm]
    bsort, act = jax.block_until_ready((bsort, act))
    n_act = int(jnp.sum(hit))
    log(f"bounce set: {n_act}/{nrays} live (tid sort)")

    cs_b = int(os.environ.get("TPURT_PROBE_CS_B", "16"))
    for kv in VERSIONS:
        fn = make_fn(kv, 256, cs_b)
        timed_pops(f"B v{kv} bounce C={cs_b}", fn, views, packed, bsort,
                   act, n_act, 256, w, sp.LEAFW)


if __name__ == "__main__":
    main()
