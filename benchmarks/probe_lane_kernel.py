"""Per-lane treelet kernel (trace/lane_pallas.py) vs the packet split
kernel on the real TPU at 1M-triangle scale — the round-3 headline
question: does the per-lane machine break the ~550 ns/pop wall?

Passes (honest timing per docs/TPU_NOTES.md: vary inputs, fetch a value):

  P  primary 1024x1024 (screen-tile packets, coherent)
  B  first-bounce closest-hit: cosine-hemisphere directions from the
     real primary hit points, sorted by origin-cell + direction octant
     (the exact ray set + order bench.py's bounce loop consumes)
  S  same rays through the round-2 packet split kernel for the ratio

Knobs: TPURT_LANE_LEAFW (16), TPURT_LANE_C / _CHUNK (lane kernel),
TPURT_PROBE_TRIS (1000000), TPURT_PROBE_RES (1024),
TPURT_PROBE_TCAP (skip the slow treelet-capacity sync with a known cap),
TPURT_PROBE_PASSES (subset of "PSBT", default all; T = chunk sweep on
the bounce set), TPURT_PROBE_CHUNKS (comma list for the T pass).
"""

import functools
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
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace import lane_pallas
from tpu_raytracing.trace import split_pallas as sp
from tpu_raytracing.trace.packet import tile_reorder
from tpu_raytracing.trace.ray import Rays, generate_primary_rays

N = int(os.environ.get("TPURT_PROBE_TRIS", "1000000"))
RES = int(os.environ.get("TPURT_PROBE_RES", "1024"))
LW = int(os.environ.get("TPURT_LANE_LEAFW", "16"))
ITERS = int(os.environ.get("TPURT_PROBE_ITERS", "4"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def nudge_rays(rays: Rays, i: int) -> Rays:
    """Defeat execution memoization without changing traversal shape."""
    return rays.replace(tmin=rays.tmin + (i % 3) * 1e-7)


def timed(label, fn, rays, nrays, n=ITERS):
    out = fn(rays)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(nudge_rays(rays, i + 1))
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)[:64]))
    dt = (time.perf_counter() - t0) / n
    log(f"{label}: {dt*1e3:.2f} ms  ({nrays/dt/1e6:.2f} Mrays/s, "
        f"{dt/nrays*1e9:.1f} ns/ray)")
    return out, dt


def main():
    log(f"device: {jax.devices()[0]}  N={N} RES={RES} LW={LW} "
        f"C={lane_pallas.C} CHUNK={lane_pallas.CHUNK}")
    scene = procedural.terrain(N)
    tris = jnp.asarray(scene.triangles)

    # ---- build ----
    front_j = jax.jit(lambda t: bucket.split_front(t, enable_pairs=True))
    front = front_j(tris)
    if os.environ.get("TPURT_PROBE_TCAP"):
        tcap = int(os.environ["TPURT_PROBE_TCAP"])
        log(f"treelet capacity: {tcap} (from TPURT_PROBE_TCAP)")
    else:
        t0 = time.perf_counter()
        ntl = treelet.treelet_capacity(front, LW)
        log(f"treelets: {ntl} (capacity sync {time.perf_counter()-t0:.1f} s)")
        tcap = int(ntl * 1.25) + 32
    build_j = jax.jit(
        lambda f: treelet.build_treelet(f, tcap, leaf_width=LW))
    t0 = time.perf_counter()
    tb, packed = build_j(front)
    jax.block_until_ready(tb.tables)
    log(f"treelet build (cold): {time.perf_counter()-t0:.1f} s; "
        f"tables {tb.tables.shape} = "
        f"{tb.tables.size*4/1e6:.0f} MB, wh={tb.wh}")
    treelet.check_treelet_capacity(tb)

    camera = cam.camera_to_device(
        cam.update_camera(
            cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
    rays = generate_primary_rays(camera, RES, RES)
    nrays = RES * RES
    tiled = jax.tree.map(lambda a: tile_reorder(a, RES, RES, 16, 8), rays)
    tiled = jax.block_until_ready(tiled)

    passes = os.environ.get("TPURT_PROBE_PASSES", "PSBT")
    lane_passes = any(c in passes for c in "PBRT")

    # ---- split kernel (views passed as jit ARGS — 376 MB closure
    # constants blow up program serialization) ----
    # 'B' also needs views: its block runs the split kernel on the same
    # sorted bounce set for the ratio (the Q/B block below); 'H' (shadow
    # sort ablation) traces bounce hits + shadows through it too
    need_split = (("S" in passes) or ("Q" in passes) or ("B" in passes)
                  or ("H" in passes) or not lane_passes)
    if need_split:
        views = jax.jit(sp.prep_split_views)(
            *jax.jit(lambda f: bucket.emit_split(f, leaf_width=sp.LEAFW))(
                front))

    # ---- P: primary through the lane kernel (also derives the hit set
    # for the bounce passes; an S-only run uses the split kernel so no
    # lane compile is paid) ----
    if lane_passes:
        lane_j = jax.jit(lambda t, p, r: lane_pallas.trace_rays_lane_pallas(
            t, p, r, raw=True)[0])
        out_p = jax.block_until_ready(lane_j(tb, packed, tiled))
        if "P" in passes:
            out_p, _ = timed("P lane primary",
                             lambda r: lane_j(tb, packed, r), tiled, nrays)
    else:
        split_p0 = sp.make_split_pallas_tracer(None, None, RES, RES,
                                               c_slots=4)
        sp0_j = jax.jit(lambda v, p, r: (lambda rec: (
            rec.t, jnp.where(rec.hit, rec.tri_id, -1)))(
            split_p0(v, p, r)[0]))
        # tiled order to match the lane primary's output layout
        out_p = jax.block_until_ready(sp0_j(views, packed, tiled))
    if "S" in passes:
        split_primary = sp.make_split_pallas_tracer(
            None, None, RES, RES, c_slots=4)
        sp_j = jax.jit(lambda v, p, r: split_primary(v, p, r)[0].t)
        timed("S split primary", lambda r: sp_j(views, packed, r),
              rays, nrays)

    # ---- B: first-bounce rays from real hit points (tiled order) ----
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
    # cell+octant sort (what the path tracer's compaction produces)
    from tpu_raytracing.ops.gather import take_rows
    from tpu_raytracing.ops.morton import morton3d

    lo = jnp.min(hp, axis=0)
    hi = jnp.max(hp, axis=0)
    cell = morton3d((hp - lo) / jnp.maximum(hi - lo, 1e-20)).astype(jnp.int32)
    octant = ((d[:, 0] > 0).astype(jnp.int32)
              | ((d[:, 1] > 0).astype(jnp.int32) << 1)
              | ((d[:, 2] > 0).astype(jnp.int32) << 2))
    dead = (~hit).astype(jnp.int32)
    sort_mode = os.environ.get("TPURT_PROBE_SORT", "cell")
    if sort_mode == "tid":
        # group by the ORIGIN pair's treelet: a bounce ray's first
        # post-top treelet is (mostly) the one holding its origin, so
        # same-tid lanes stall far less on treelet switches.
        otid = tb.pair_tid[jnp.maximum(tri_flat, 0) // 2]
        key = ((dead << 30) | (otid << 18) | (octant << 15)
               | ((cell >> 15) & 0x7FFF))
    elif sort_mode == "pairq":
        # treelet-granular grouping WITHOUT a treelet structure: pair
        # index quantized to 128-pair blocks (~ the measured ~137
        # pairs/treelet), then octant — the production-compaction key
        # candidate if it matches the tid sort's win.
        pid = jnp.maximum(tri_flat, 0) // 2
        key = ((dead << 30) | ((pid >> 7) << 17) | (octant << 14)
               | ((cell >> 16) & 0x3FFF))
    elif sort_mode == "pair":
        # finest origin grouping: the hit pair index itself (pair rows
        # are Morton/tree-ordered, so nearby indices share subtrees) +
        # direction octant. Tests whether the split kernel's packet
        # union shrinks further with tighter-than-treelet grouping.
        pid = jnp.maximum(tri_flat, 0) // 2
        key = (dead << 30) | (pid << 3) | octant
    else:
        key = (dead << 28) | ((cell >> 9) << 3) | octant
    log(f"bounce sort mode: {sort_mode}")
    perm = jnp.argsort(key, stable=True)
    bsort = jax.tree.map(lambda a: take_rows(a, perm), brays)
    act = hit[perm]
    bsort, act = jax.block_until_ready((bsort, act))
    n_act = int(jnp.sum(hit))
    log(f"bounce set: {n_act}/{nrays} live")

    def lane_stats(label, out):
        dbg = np.asarray(out[:, 4:7, 0])  # per-packet: iters, switches
        mxd = np.asarray(out[:, 6]).max()
        iters, sw = dbg[:, 0], dbg[:, 1]
        log(f"{label}: iters/pkt mean {iters.mean():.0f} p99 "
            f"{np.percentile(iters, 99):.0f} max {iters.max():.0f}; "
            f"switches/pkt mean {sw.mean():.1f} max {sw.max():.0f}; "
            f"max stack depth {mxd:.0f} (STACK={lane_pallas.STACK}); "
            f"total iters {iters.sum():.3g}")

    if "B" in passes:
        lane_b = jax.jit(
            lambda t, p, r, a: lane_pallas.trace_rays_lane_pallas(
                t, p, r, active=a, raw=True)[0][0])
        timed("B lane bounce", lambda r: lane_b(tb, packed, r, act),
              bsort, n_act)
        lane_dbg = jax.jit(
            lambda t, p, r, a: lane_pallas.trace_rays_lane_pallas(
                t, p, r, active=a, raw=True)[2])
        lane_stats("B lane bounce dbg",
                   jax.block_until_ready(lane_dbg(tb, packed, bsort, act)))

    # ---- Q: the packet split kernel on the same (sorted) bounce set ----
    if "Q" in passes or "B" in passes:
        split_b = sp.make_split_pallas_tracer(
            None, None, RES, RES, k=256, c_slots=16, sort_mode="presorted")
        spb_j = jax.jit(
            lambda v, p, r, a: split_b(v, p, r, active=a)[0].t)
        timed("S split bounce", lambda r: spb_j(views, packed, r, act),
              bsort, n_act)

    # ---- R: budget-restart driver on the bounce set ----
    if "R" in passes:
        budgets = tuple(int(x) for x in os.environ.get(
            "TPURT_LANE_BUDGETS", "128").split(",") if x)
        fr = jax.jit(functools.partial(
            lambda t, p, r, a, budgets: lane_pallas.trace_rays_lane_restart(
                t, p, r, active=a, raw=True, budgets=budgets)[0][0],
            budgets=budgets))
        timed(f"R lane restart budgets={budgets}",
              lambda r: fr(tb, packed, r, act), bsort, n_act)

    # ---- V: treelet-major no-switch phase driver on the bounce set ----
    if "V" in passes:
        ph = int(os.environ.get("TPURT_LANE_PHASES", "10"))
        fv = jax.jit(functools.partial(
            lambda t, p, r, a, phases: lane_pallas.trace_rays_lane_phase(
                t, p, r, active=a, raw=True, phases=phases)[0][0],
            phases=ph))
        timed(f"V lane phase phases={ph}",
              lambda r: fv(tb, packed, r, act), bsort, n_act)

    # ---- W: suspend/resume wave driver on the bounce set ----
    if "W" in passes:
        wb = tuple(int(x) for x in os.environ.get(
            "TPURT_LANE_WAVE_BUDGETS", "48,48,48").split(",") if x)
        fw = jax.jit(functools.partial(
            lambda t, p, r, a, budgets: lane_pallas.trace_rays_lane_wave(
                t, p, r, active=a, raw=True, budgets=budgets)[0][0],
            budgets=wb))
        timed(f"W lane wave budgets={wb}",
              lambda r: fw(tb, packed, r, act), bsort, n_act)

    # ---- H: shadow sort-key ablation (round-4 VERDICT #4) ----
    # The REAL scattered-origin shadow workload: bounce closest hits ->
    # one occlusion ray each toward the light. Production today re-sorts
    # by origin Morton cell (bench.py shadow_tracer_b sort_mode=
    # 'origin'); the round-3 insight says origin-SUBTREE keys (the hit
    # pair's treelet id / pair index) should predict the traversal
    # working set better here too.
    if "H" in passes:
        spb_full = sp.make_split_pallas_tracer(
            None, None, RES, RES, k=256, c_slots=16, sort_mode="presorted")
        rec_j = jax.jit(lambda v, p, r, a: (lambda rec: (
            rec.t, jnp.where(rec.hit, rec.tri_id, -1)))(
            spb_full(v, p, r, active=a)[0]))
        bt, btri = jax.block_until_ready(rec_j(views, packed, bsort, act))
        bhit = btri >= 0
        n_sh = int(jnp.sum(bhit))
        log(f"shadow set: {n_sh}/{nrays} live (bounce hits)")
        hp2 = bsort.origin + bsort.direction * bt[:, None]
        light = jnp.asarray(
            [float(scene.aabb_min[0] + scene.aabb_max[0]) / 2,
             float(scene.aabb_max[1]) * 2.0,
             float(scene.aabb_min[2] + scene.aabb_max[2]) / 2], jnp.float32)
        sd = light[None, :] - hp2
        dist = jnp.linalg.norm(sd, axis=1)
        sdir = sd / jnp.maximum(dist, 1e-20)[:, None]
        srays = Rays(origin=hp2, direction=sdir,
                     tmin=jnp.full((nrays,), 1e-3, jnp.float32),
                     tmax=jnp.maximum(dist - 2e-3, 1e-3))
        cell2 = morton3d(
            (hp2 - jnp.min(hp2, axis=0))
            / jnp.maximum(jnp.max(hp2, axis=0) - jnp.min(hp2, axis=0),
                          1e-20)).astype(jnp.int32)
        pid2 = jnp.maximum(btri, 0) // 2
        tid2 = tb.pair_tid[pid2]
        dead2 = (~bhit).astype(jnp.int32)
        keys = {
            "none (bounce order)": None,
            "origin cell>>2 (production)": cell2 >> 2,
            "tid (hit treelet)": tid2,
            "pair (hit pair idx)": pid2,
            "pairq (pair>>7)": pid2 >> 7,
        }
        sh_tr = sp.make_split_pallas_tracer(
            None, None, RES, RES, k=256, any_hit=True, c_slots=8,
            sort_mode="presorted")
        sh_j = jax.jit(lambda v, p, r, a: sh_tr(v, p, r, active=a)[0].hit)
        for name, key in keys.items():
            if key is None:
                sr, sa = srays, bhit
            else:
                perm = jnp.argsort((dead2 << 30) | key, stable=True)
                sr = jax.tree.map(lambda a: take_rows(a, perm), srays)
                sa = bhit[perm]
            sr, sa = jax.block_until_ready((sr, sa))
            out, _ = timed(f"H shadow [{name}]",
                           lambda r: sh_j(views, packed, r, sa), sr, n_sh)
            log(f"  occluded: {int(jnp.sum(out & sa))}/{n_sh}")

    # ---- T: chunk sweep on the bounce set (scheduler-check period) ----
    if "T" in passes:
        chunks = [int(c) for c in os.environ.get(
            "TPURT_PROBE_CHUNKS", "1,2,4,8").split(",")]
        for ck in chunks:
            f = jax.jit(functools.partial(
                lambda t, p, r, a, chunk: lane_pallas.trace_rays_lane_pallas(
                    t, p, r, active=a, raw=True, chunk=chunk)[2],
                chunk=ck))
            out, _ = timed(f"T lane bounce chunk={ck}",
                           lambda r: f(tb, packed, r, act), bsort, n_act)
            lane_stats(f"T chunk={ck} dbg", np.asarray(out))


if __name__ == "__main__":
    main()
