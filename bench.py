"""Headline benchmark: Mrays/s/chip (primary + bounce) on a 1M-triangle
scene (tessellated terrain: a surface mesh, the realistic 1M-tri case),
plus per-frame LBVH rebuild time (targets in BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}; supporting
numbers go to stderr. Scale via TPURT_BENCH_TRIS / TPURT_BENCH_RES for smoke
runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

if os.environ.get("TPURT_PLATFORM") == "cpu":
    # Debug/CI escape hatch (the env-var form is too late on this image —
    # sitecustomize imports jax first; the config update still works).
    jax.config.update("jax_platforms", "cpu")
elif os.environ.get("TPURT_NO_PROBE") != "1":
    # Tunnel watchdog: a down TPU tunnel makes backend init HANG (not
    # fail), which would leave the bench with no output at all. Probe in
    # a SUBPROCESS (backend init state is per-process, so a hung probe
    # doesn't poison us) and fall back to CPU — a labeled slow number
    # beats a silent hang.
    import subprocess

    _ok = False
    try:
        _probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('PLAT', jax.devices()[0].platform)"],
            capture_output=True, text=True, check=False,
            timeout=int(os.environ.get("TPURT_PROBE_TIMEOUT", "300")))
        _ok = _probe.returncode == 0 and "PLAT" in (_probe.stdout or "")
    except subprocess.TimeoutExpired:
        pass
    if not _ok:
        print("WARNING: accelerator backend did not initialise within the "
              "probe timeout (tunnel down?) - falling back to CPU at smoke "
              "scale", file=sys.stderr, flush=True)
        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("TPURT_BENCH_TRIS", "20000")
        os.environ.setdefault("TPURT_BENCH_RES", "256")
        os.environ["TPURT_CPU_FALLBACK"] = "1"
# Persistent compilation cache: the 1M-scale traversal kernels cost
# minutes each to compile on the remote backend; cache them across bench
# / probe / app processes (same machine, keyed by program hash).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    t_process0 = time.perf_counter()  # time-to-first-frame clock
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    res = int(os.environ.get("TPURT_BENCH_RES", 1024))
    bounces = int(os.environ.get("TPURT_BENCH_BOUNCES", 1))
    iters = int(os.environ.get("TPURT_BENCH_ITERS", 2))

    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.scene import camera as cam
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.scene.types import scene_to_device
    from tpu_raytracing.trace import split_pallas as sp
    from tpu_raytracing.trace.pathtrace import path_trace

    log(f"bench: {num_tris} tris, {res}x{res}, {bounces} bounce(s), "
        f"device={jax.devices()[0]}")

    scene = procedural.terrain(num_tris)
    dev_scene = scene_to_device(scene)
    # Aerial view: the scene-framing default puts the camera at the AABB
    # centre (inside the hills), making every ray graze hundreds of cells;
    # look down at ~40 degrees instead, as a renderer benchmark would.
    host_cam = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    host_cam.position = (scene.aabb_max * 0.0).astype("float32")
    host_cam.position[1] = float(scene.aabb_max[1]) * 1.5 + 20.0
    host_cam.position[2] = float(scene.aabb_min[2]) * 0.7
    host_cam.yaw = 0.0
    host_cam.pitch = 0.7
    camera = cam.camera_to_device(cam.update_camera(host_cam))
    triangles = jnp.asarray(scene.triangles)

    # --- per-frame rebuild: Morton-bucket split BVH (bvh/bucket.py) —
    # dense sorted-order passes, no binary tree; Karras+collapse (the
    # reference-parity path, ~4.2 s at 1M) and the gather-free implicit
    # heap (~140 ms, but ~30x worse trees) remain available. ---
    # ONE jit for the whole rebuild (front + emit + kernel views):
    # measured 253 ms vs 532 ms for the round-2/3 two-jit staging at 1M
    # (benchmarks/profile_build.py r4) — materializing the front between
    # jits plus the extra dispatch/fetch cost ~280 ms/frame. The compile
    # is multi-minute COLD but rides the persistent compilation cache;
    # the staged _front remains for the one-time pair_tid/lane builds.
    _front = jax.jit(lambda tris: bucket.split_front(tris, enable_pairs=True))
    # Frame-0 build: fused view emit (bucket.emit_split_views — the entry
    # scatter writes the padded kernel layouts directly; round-5 rebuild
    # trim) + the SplitBVH for the capacity check.
    _build_one = jax.jit(lambda tris: bucket.emit_split_views(
        bucket.split_front(tris, enable_pairs=True), leaf_width=sp.LEAFW))
    # Per-frame rebuild: views + packed ONLY — the SplitBVH outputs
    # (inner slice, e_ranges) are dead per-frame and DCE out of the timed
    # program. This is a legitimate use of DCE (the per-frame consumer
    # really doesn't read them), unlike the round-4 stage-timing trap.
    _build_views = jax.jit(lambda tris: bucket.emit_split_views(
        bucket.split_front(tris, enable_pairs=True), leaf_width=sp.LEAFW)[:2])

    def build(tris):
        return _build_views(tris)

    views, packed, split_f0 = _build_one(triangles)
    # Frame-0 sync doubles as the overflow guard: a truncated tree would
    # silently drop geometry (inner-row bound + the capped chunk ladder's
    # slot guard, bvh/bucket.py:check_split_capacity).
    bucket.check_split_capacity(split_f0, num_tris)
    # build/trace window coupling: a kernel leafw wider than the build's
    # windows would DMA past live pairs (silent wrong hits)
    assert split_f0.leaf_width == sp.LEAFW, (split_f0.leaf_width, sp.LEAFW)
    float(jnp.sum(views[0][0]).astype(jnp.float32))  # force completion
    # Warm the per-frame (views-only) jit before the timed loop.
    views, packed = build(triangles)
    float(jnp.sum(views[0][0]).astype(jnp.float32))
    # Vary the input every frame (this backend memoizes identical executions)
    # and fetch at the end: throughput timing over pipelined frames.
    t0 = time.perf_counter()
    for i in range(iters):
        views, packed = build(triangles + (i + 1) * 1e-5)
    float(jnp.sum(views[0][0]).astype(jnp.float32))
    build_ms = (time.perf_counter() - t0) / iters * 1000.0
    log(f"split-BVH rebuild: {build_ms:.2f} ms/frame (target < 20 ms)")
    # Restore the UNPERTURBED tree: the timing loop left views/packed
    # built from triangles + iters*1e-5 (ADVICE r4 medium — the traced
    # scene was subtly shifted and the lane candidate's sampled-content
    # assert could never pass). Same input as frame 0 => execution
    # memoization makes this ~free.
    views, packed, split_f0 = _build_one(triangles)

    # Topology-preserving refit (bvh/bucket.py:refit_split): the per-frame
    # path for animated scenes with fixed topology — exact AABB refresh
    # from deformed pair rows, tree kept. Secondary metric (stderr only;
    # the JSON line stays the full rebuild-backed trace number).
    _, packed0, split0 = _build_one(triangles)

    def _deform_refit(s, rows, d):
        # in-jit affine vertex shift (defeats memoization) + refit
        v = jax.lax.bitcast_convert_type(rows[:, :12], jnp.float32) + d
        rows = jnp.concatenate(
            [jax.lax.bitcast_convert_type(v, jnp.int32), rows[:, 12:]],
            axis=1)
        return bucket.refit_split(s, type(packed0)(rows=rows))

    _refit = jax.jit(_deform_refit)
    sref = _refit(split0, packed0.rows, 0.0)
    float(jnp.sum(sref.inner[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for i in range(iters):
        sref = _refit(split0, packed0.rows, (i + 1) * 1e-4)
    float(jnp.sum(sref.inner[0].astype(jnp.float32)))
    refit_ms = (time.perf_counter() - t0) / iters * 1000.0
    log(f"split-BVH refit (fixed topology): {refit_ms:.2f} ms/frame")
    # HBM budget: the refit structures are dead from here on; holding
    # them through the treelet/grid candidate builds below is what blew
    # BENCH_r03 up (RESOURCE_EXHAUSTED mid-calibration).
    del split0, packed0, sref

    # --- frame-0 trace tree: binned-SAH (the reference's flagship
    # build, src/SharedTaskBuilder.cu) when it fits the budget. The
    # round-4 probe (benchmarks/probe_tree.py, 250k): SAH tree halves
    # traversal pops vs the Morton-bucket tree — bounce pass 218 ->
    # 116 ms, primary 44 -> 36 ms. The bucket build stays the per-frame
    # REBUILD story (rebuild/refit numbers above); the traced tree is
    # built once at frame 0 exactly like the reference. Falls back to
    # the bucket tree on deadline/any failure (TPURT_TRACE_TREE=bucket
    # forces the old behaviour; sah forces no-fallback).
    sah_tree = False
    tree_choice = os.environ.get("TPURT_TRACE_TREE", "auto")
    # Round-5: 'auto' attempts the SAH build unconditionally — the
    # round-4 warm-marker gate existed because the 1M level-step compile
    # never returned (>90 min); the compile-light level step
    # (bvh/sah.py round-5 rewrite: range-min table + searchsorted
    # replacing the segmented-scan doubling chains, measured 533 s ->
    # seconds at 262k in benchmarks/probe_sah_compile.py) brought a cold
    # 1M build inside the deadline. The deadline + bucket fallback
    # below still guard regressions.
    if (tree_choice in ("auto", "sah")
            and os.environ.get("TPURT_BOUNCE_TRACER", "auto")
            in ("auto", "split")):
        try:
            from tpu_raytracing.bvh.split_convert import build_sah_split

            t0 = time.perf_counter()
            ddl = time.monotonic() + float(
                os.environ.get("TPURT_SAH_BUDGET_S", "1500"))
            split_s, packed_s = build_sah_split(
                triangles, enable_pairs=True, leaf_width=sp.LEAFW,
                host_stepped=True, deadline=ddl)
            views_s = jax.jit(sp.prep_split_views)(split_s, packed_s)
            # Geometry-drop guard (ADVICE r4 low): a truncated SAH emit
            # (anchor rows past ICAP dropped) must never be traced
            # silently — mirror the bucket path's check_split_capacity.
            from tpu_raytracing.bvh.split_convert import (
                check_sah_split_capacity,
            )

            check_sah_split_capacity(split_s)
            ni = int(split_s.num_inner)  # host sync + sanity
            assert 0 < ni < split_s.inner.shape[0], ni
            assert split_s.leaf_width == sp.LEAFW
            views, packed = views_s, packed_s
            sah_tree = True
            log(f"trace tree: binned-SAH ({ni} inner rows, built in "
                f"{time.perf_counter() - t0:.0f} s at frame 0; rebuild/"
                f"refit metrics above remain the bucket path)")
            del split_s
        except Exception as e:
            log(f"SAH trace tree unavailable (bucket tree stands): "
                f"{type(e).__name__}: {e}")
            if tree_choice == "sah":
                raise

    # --- trace throughput (primary + NEE shadow + bounce rays) ---
    # Split-BVH Pallas kernel (trace/split_pallas.py): C packet slots with
    # pipelined row DMAs, sublane-mapped slab and Moller-Trumbore; work =
    # sum of per-packet trips (no lockstep waste).
    # Best-measured round-2 config (benchmarks/sweep_sort*.py): C=8 slots,
    # bounce-closest rays sorted by coarse origin cell + direction octant
    # (2044 -> 1319 ms on the 1M bounce pass). The sort now rides the
    # path tracer's bounce compaction (trace/pathtrace.py:_bounce_stage),
    # so the bounce tracers consume rays presorted — no per-pass argsort
    # or record un-permute.
    # Coherent tiled passes want C=4: benchmarks/probe_primary.py measured
    # 127 ms at C=4/C=16 but 267 ms at C=8 on the primary pass (slot-count
    # resonance in the round-robin DMA); incoherent bounce passes measured
    # best at C=8 (benchmarks/sweep_sort.py).
    # Coherent C=4 passes run the v4 (leaf-batched) kernel: measured
    # stable at ~97-118 ms across independent compiles on the 1M primary
    # pass, while the v3 kernel at C=4 compiled into a pathologically
    # slow binary twice in round 5 (1.5 s and 7.3 s for the SAME pops —
    # benchmarks/probe_v4.py; the r2-r4 ~100-127 ms numbers rode a good
    # cached binary). Incoherent bounce passes stay on v3 (v4's batched
    # flush measured 963 vs 789 ns/pop on the real tid-sorted bounce set).
    tracer = sp.make_split_pallas_tracer(None, None, res, res, c_slots=4,
                                         kernel_v=4)
    # TPURT_BOUNCE_C: bounce-pass slot count A/B knob (16 = the r2-r4
    # measured default on the bucket tree; the SAH tree's shallower
    # traversals may prefer a different point).
    bounce_c = int(os.environ.get("TPURT_BOUNCE_C", "16"))
    bounce_tracer = sp.make_split_pallas_tracer(
        None, None, res, res, k=256, c_slots=bounce_c,
        sort_mode="presorted")
    shadow_tracer = sp.make_split_pallas_tracer(None, None, res, res,
                                                any_hit=True, c_slots=4,
                                                kernel_v=4)
    # Shadow rays originate at the bounce HIT points — path_trace now
    # permutes them by the hit's PAIR INDEX before this tracer runs
    # (round-4 ablation: 43 ms vs 293 ms origin-Morton vs 363 unsorted
    # on the real 1M shadow set — probe_lane_kernel.py pass H), so the
    # tracer itself consumes them presorted.
    shadow_tracer_b = sp.make_split_pallas_tracer(None, None, res, res,
                                                  k=256, any_hit=True,
                                                  c_slots=8,
                                                  sort_mode="presorted")

    # Bounce-pass structure selection. The default ('auto') is the
    # measured winner: the packet split kernel with the 'tid'
    # (origin-treelet) bounce sort — round-4 hardware numbers on the
    # 1M tid-sorted bounce set: split 1393 ms vs lane-wave 1588 / lane
    # 1876 / lane-restart 1976 ms (benchmarks/probe_lane_kernel.py),
    # and the grid lost round-2's calibration by 18.7x. The losing
    # candidates stay available behind TPURT_BOUNCE_TRACER:
    # 'lane' / 'grid' force them; 'auto-lane' / 'auto-grid' calibrate
    # them against the split kernel on the frame's real bounce rays —
    # so a backend change can re-open the contest without paying the
    # 48 s + 376 MB treelet build (or the grid build) on every default
    # bench run.
    bounce_trav = None
    choice = os.environ.get("TPURT_BOUNCE_TRACER", "auto")
    # Calibration deadline: each candidate costs a 1M-scale compile
    # (~1-3 min cold); if the budget runs out, keep what's measured so
    # far rather than risk the whole bench window on compiles.
    _deadline = time.monotonic() + float(
        os.environ.get("TPURT_BENCH_CAL_BUDGET_S", "1500"))

    def _cal_time_left() -> bool:
        return time.monotonic() < _deadline
    if choice == "auto-lane" and jax.devices()[0].platform != "tpu":
        # the lane kernel only has an interpret-mode (python-loop) path
        # off-TPU — hopeless for a timed calibration; keep the split
        # kernel on CPU smoke runs
        log("bounce calibration: lane candidate skipped (not on TPU)")
        choice = "split"

    # ---- calibration helpers (shared by the candidate blocks) ----
    # Closures take the big arrays as jit ARGUMENTS — closure constants
    # overflow the remote-compile payload (docs/TPU_NOTES.md, HTTP 413).
    def _cal_rays(f, trav_, r_, a_):
        out = f(trav_, packed, r_, a_, 0.0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(2):
            out = f(trav_, packed, r_, a_, (i + 1) * 1e-5)
        float(jnp.sum(out[0].t))
        return (time.perf_counter() - t0) / 2 * 1000.0

    def _cal_subset(r_, a_, frac=4):
        # Calibrate on 1/frac of the rays: 4 contiguous chunks spread
        # across the (compaction-sorted) array, so packet-level locality
        # is preserved while sampling different scene regions. Ranking
        # is what matters; both tracers scale ~linearly in ray count.
        num = a_.shape[0]
        chunk = max(num // frac // 4 // 256, 1) * 256
        starts = [min((num // 4) * j, num - chunk) for j in range(4)]
        take = lambda x: jnp.concatenate(  # noqa: E731
            [jax.lax.dynamic_slice_in_dim(x, s, chunk) for s in starts])
        return jax.tree.map(take, r_), take(a_)

    # ---- lane candidate's structure (the round-3 design for incoherent
    # rays — trace/lane_pallas.py over bvh/treelet.py). Built BEFORE the
    # ray-set derivation so the calibration rays carry the production
    # 'tid' bounce sort (TreeletBVH.pair_tid -> path_trace pair_loc).
    # Demoted out of default 'auto' in round 4 on evidence (see the
    # selection comment above): only 'lane' / 'auto-lane' pay its
    # build. ----
    lane_tb = pair_loc = None
    if choice in ("auto-lane", "lane"):
        # A calibration CANDIDATE must never kill the bench: the r03
        # artifact was zeroed by an unguarded build_treelet_auto hitting
        # a backend OOM here. Any failure -> log, fall back to split.
        try:
            from tpu_raytracing.bvh.treelet import build_treelet_auto
            from tpu_raytracing.trace import lane_pallas as lp

            t0 = time.perf_counter()
            lane_tb, lane_packed = build_treelet_auto(_front(triangles))
            jax.block_until_ready(lane_tb.tables)
            # same front => same pair ORDER as the split build's packed
            # (pair_loc indexes by the split tracer's tri_id) — check
            # sampled row CONTENT, not just shapes
            assert lane_packed.rows.shape == packed.rows.shape
            assert bool(jnp.all(lane_packed.rows[::1009]
                                == packed.rows[::1009])), (
                "treelet build's pair order diverged from the split build")
            log(f"treelet build: {time.perf_counter() - t0:.1f} s, "
                f"tables {lane_tb.tables.shape}")
            pair_loc = lane_tb.pair_tid
        except Exception as e:
            log(f"lane candidate skipped (treelet build failed): "
                f"{type(e).__name__}: {e}")
            lane_tb = pair_loc = None
            if choice == "lane":
                choice = "split"
    if pair_loc is None and not sah_tree:
        # The 'tid' bounce sort for the BUCKET tree: derive
        # pair->treelet ids via the classification-only path (no 0.5 GB
        # table build). In-frame: tid 1252 ms vs leaf 1370 on the 1M
        # bounce pass. NOT valid for the SAH tree (different pair
        # order) — there the 'leaf' key (pair index blocks, order-
        # agnostic subtree locality) is the default.
        try:
            from tpu_raytracing.bvh.treelet import build_pair_tid

            t0 = time.perf_counter()
            pair_loc = jax.jit(build_pair_tid)(_front(triangles))
            jax.block_until_ready(pair_loc)
            log(f"pair-tid classification: {time.perf_counter() - t0:.1f} s")
        except Exception as e:
            log(f"tid bounce sort unavailable (falling back to 'leaf'): "
                f"{type(e).__name__}: {e}")
            pair_loc = None

    # The frame's real first-bounce ray set (primary trace + one bounce
    # stage, same sort key as the frame loop), shared by every
    # calibration below.
    rays0 = alive0 = rays_c = alive_c = None
    if choice in ("auto-lane", "auto-grid"):
        from tpu_raytracing.trace import pathtrace as pt
        from tpu_raytracing.trace.ray import generate_primary_rays

        num = res * res
        rays0 = jax.jit(generate_primary_rays,
                        static_argnames=("width", "height"))(
            camera, res, res)
        alive0 = jnp.ones((num,), bool)
        rec0, _ = jax.jit(
            lambda v, p, r, a: tracer(v, p, r, active=a))(
            views, packed, rays0, alive0)
        u0 = jax.random.uniform(jax.random.PRNGKey(0), (num, 2))
        skind = os.environ.get("TPURT_BOUNCE_SORT") or (
            "tid" if pair_loc is not None else "leaf")
        _, _, alive_b, _, rays_b = pt._jit_bounce_stage(
            True, True, True, skind)(
            dev_scene, packed, rays0, rec0, jnp.zeros((num,), bool),
            jnp.ones((num, 3), jnp.float32),
            jnp.zeros((num, 3), jnp.float32), alive0,
            jnp.arange(num, dtype=jnp.int32), u0,
            camera["max_depth"], pair_loc)
        rays_c, alive_c = _cal_subset(rays_b, alive_b)

    if lane_tb is not None:
        try:
            lane_bounce = lp.make_lane_tracer()
            if choice == "auto-lane":
                fsp = jax.jit(lambda v, p, r, a, j: bounce_tracer(
                    v, p, r.replace(origin=r.origin + j), active=a))
                fln = jax.jit(lambda t_, p, r, a, j: lane_bounce(
                    t_, p, r.replace(origin=r.origin + j), active=a))
                ms_split = _cal_rays(fsp, views, rays_c, alive_c)
                ms_lane = _cal_rays(fln, lane_tb, rays_c, alive_c)
                log(f"bounce calibration: split {ms_split:.0f} ms, "
                    f"lane {ms_lane:.0f} ms (1/4 subset)")
                choice = "lane" if ms_lane < ms_split else "split"
            if choice == "lane":
                bounce_trav = lane_tb
                bounce_tracer = lane_bounce
                log("bounce passes: per-lane treelet kernel "
                    f"({int(lane_tb.num_treelets)} treelets)")
        except Exception as e:  # a candidate may not kill the run
            log(f"lane candidate skipped (calibration failed): "
                f"{type(e).__name__}: {e}")
            choice = "split" if choice in ("auto-lane", "lane") else choice
        if choice != "lane":
            # drop the ~0.5 GB treelet tables before the timed frames
            # (pair_tid stays for the bounce sort)
            lane_tb = None
    if choice in ("auto-grid", "grid"):
        from tpu_raytracing.bvh.grid import (
            auto_res3,
            build_grid,
            check_grid_capacity,
        )
        from tpu_raytracing.trace.grid_trace import (
            make_grid_tracer,
            trace_rays_grid,
        )

        from tpu_raytracing.bvh.grid import tier_params

        gscale = float(os.environ.get("TPURT_GRID_SCALE", "1.0"))

        def make_grid(s):
            r3 = auto_res3(scene.aabb_max - scene.aabb_min, num_tris,
                           scale=s)
            tp = tier_params(s)
            # compacted key sort first; fall back to the uncompacted
            # build if this scene's live refs exceed the 6/row default
            # cap (bvh/grid.py) — the bench must never die on a guard.
            for cc in (None, 0):
                g = jax.jit(build_grid,
                            static_argnames=("res", "k", "k2",
                                             "med_frac", "compact_cap"))(
                    packed.rows, split_f0.num_leaves, res=r3,
                    compact_cap=cc, **tp)
                try:
                    check_grid_capacity(g)
                    return g, r3, tp
                except RuntimeError as e:
                    if cc == 0:
                        raise
                    log(f"grid compaction cap exceeded, retrying "
                        f"uncompacted: {e}")
            return g, r3, tp

        grid, res3, gtp = make_grid(gscale)
        segs = int(os.environ.get("TPURT_GRID_SEGMENTS", "1"))
        blk = int(os.environ.get("TPURT_GRID_BLOCK", "4"))
        # Residue compaction (trace/grid_trace.py): -1 = auto-calibrate
        # on/off, 0 = off, >0 = forced phase-1 iteration budget.
        resid = int(os.environ.get("TPURT_GRID_RESIDUE", "-1"))
        residw = int(os.environ.get("TPURT_GRID_RESIDUE_W", "0"))
        RESID_DEFAULT = 32  # covers the ~20-23 mean DDA steps at 1M

        if choice == "auto-grid":
            fsp = jax.jit(lambda v, p, r, a, j: bounce_tracer(
                v, p, r.replace(origin=r.origin + j), active=a))

            def _fgr(res_after):
                return jax.jit(lambda v, p, r, a, j: trace_rays_grid(
                    v, p, r.replace(origin=r.origin + j), active=a,
                    segments=segs, block=blk,
                    residue_after=res_after, residue_width=residw))

            ms_split = _cal_rays(fsp, views, rays_c, alive_c)
            ms_grid = _cal_rays(_fgr(0), grid, rays_c, alive_c)
            if resid == -1 and ms_grid < 15 * ms_split:
                # third candidate: grid + residue compaction (the
                # lockstep-tail cure; ~10x fewer full-width iterations at
                # 1M per benchmarks/probe_grid_cpu.py — so when the base
                # grid is > 15x behind the split kernel, residue cannot
                # close the gap and its 1M-scale compile is skipped).
                ms_grid_r = _cal_rays(_fgr(RESID_DEFAULT), grid,
                                      rays_c, alive_c)
                log(f"bounce calibration: split {ms_split:.0f} ms, "
                    f"grid {ms_grid:.0f} ms, "
                    f"grid+residue {ms_grid_r:.0f} ms (1/4 subset)")
                if ms_grid_r < ms_grid:
                    resid, ms_grid = RESID_DEFAULT, ms_grid_r
                else:
                    resid = 0
            elif resid == -1:
                resid = 0
                log(f"bounce calibration: split {ms_split:.0f} ms, "
                    f"grid {ms_grid:.0f} ms (1/4 subset; residue/alt "
                    f"candidates skipped — grid is out of contention)")
            else:
                log(f"bounce calibration: split {ms_split:.0f} ms, "
                    f"grid {ms_grid:.0f} ms (residue={resid} forced)")
            # fourth candidate: finer cells. Structurally dominant at 1M
            # (fewer DDA steps AND fewer tri tests per ray at both test
            # block sizes — benchmarks/sweep_grid_cpu.sh), but the build
            # is bigger; measured head-to-head, never assumed. Skipped
            # when the grid lost by > 2x (cell scale moves it ~1.3x).
            alt = float(os.environ.get("TPURT_GRID_ALT_SCALE", "0.75"))
            if (alt > 0 and abs(alt - gscale) > 1e-6 and _cal_time_left()
                    and ms_grid < 2 * ms_split):
                try:
                    grid_a, res3_a, gtp_a = make_grid(alt)
                    ms_alt = _cal_rays(_fgr(resid), grid_a,
                                       rays_c, alive_c)
                    log(f"bounce calibration: grid(scale={alt}) "
                        f"{ms_alt:.0f} ms")
                    if ms_alt < ms_grid:
                        ms_grid, grid, res3, gtp = (ms_alt, grid_a,
                                                    res3_a, gtp_a)
                        gscale = alt
                except Exception as e:  # a candidate may not kill the run
                    log(f"grid(scale={alt}) candidate skipped: {e}")
            choice = "grid" if ms_grid < ms_split else "split"
        if resid == -1:
            resid = 0  # forced grid choice without calibration: off

        if choice == "grid":
            bounce_trav = grid
            # residue applies to the closest-hit bounce pass it was
            # calibrated on; any-hit shadows retire at first hit (short
            # tail) so they stay single-phase.
            bounce_tracer = make_grid_tracer(
                segments=segs, block=blk,
                residue_after=resid, residue_width=residw)
            shadow_tracer_b = make_grid_tracer(
                any_hit=True, segments=segs, block=blk)
            log(f"bounce passes: uniform grid res={grid.res} "
                f"(scale={gscale}), big={int(grid.num_big)}, "
                f"segments={segs}, residue={resid}")
            # grid FULL rebuild (footprints + one sort + tables): the
            # per-frame path when the grid carries the frame — measured
            # here so the animated-scene rebuild story rides the bench
            # log next to the split-BVH rebuild/refit numbers above.
            _gbuild = jax.jit(build_grid,
                              static_argnames=("res", "k", "k2",
                                               "med_frac"))
            g2 = _gbuild(packed.rows, split_f0.num_leaves,
                         res=res3, **gtp)  # untimed compile+warmup
            float(jnp.sum(g2.cell_count.astype(jnp.float32)))
            t0 = time.perf_counter()
            for i in range(iters):
                g2 = _gbuild(packed.rows.at[:, 0].add(i + 1),
                             split_f0.num_leaves, res=res3, **gtp)
            float(jnp.sum(g2.cell_count.astype(jnp.float32)))
            log(f"grid rebuild: "
                f"{(time.perf_counter() - t0) / iters * 1000:.2f} ms/frame")
        pchoice = os.environ.get("TPURT_PRIMARY_TRACER", "auto")
        if pchoice == "auto" and not (choice == "grid" and rays0 is not None
                                      and _cal_time_left()):
            pchoice = "split"  # no calibration context; keep the default
        if pchoice == "auto":
            # the grid won the incoherent pass — also calibrate the
            # coherent primaries (the packet kernel's best regime)
            fsp_p = jax.jit(lambda v, p, r, a, j: tracer(
                v, p, r.replace(origin=r.origin + j), active=a))
            fgr_p = jax.jit(lambda v, p, r, a, j: trace_rays_grid(
                v, p, r.replace(origin=r.origin + j), active=a,
                block=blk))
            rays0_c, alive0_c = _cal_subset(rays0, alive0)
            ms_sp_p = _cal_rays(fsp_p, views, rays0_c, alive0_c)
            ms_gr_p = _cal_rays(fgr_p, grid, rays0_c, alive0_c)
            log(f"primary calibration: split {ms_sp_p:.0f} ms, "
                f"grid {ms_gr_p:.0f} ms")
            pchoice = "grid" if ms_gr_p < ms_sp_p else "split"
        if pchoice == "grid":
            # whole frame on the grid: primaries + primary shadows too
            views = grid
            tracer = make_grid_tracer(block=blk)
            shadow_tracer = make_grid_tracer(any_hit=True, block=blk)
            log("primary passes: uniform grid")

    def frame(key, jitter):
        cam_j = dict(camera)
        cam_j["position"] = camera["position"] + jitter  # defeat exec memoization
        return path_trace(
            views, packed, dev_scene, cam_j, res, res, num_bounces=bounces,
            key=key, tracer=tracer, shadow_tracer=shadow_tracer,
            shadow_tracer_bounce=shadow_tracer_b, bounce_tracer=bounce_tracer,
            bounce_trav=bounce_trav, pair_loc=pair_loc,
        )

    img, rays_traced = jax.block_until_ready(frame(jax.random.PRNGKey(0), 0.0))
    # Time-to-first-frame (VERDICT r4 #6): everything since process
    # start — scene gen, builds, tree upgrade, calibration, compiles and
    # the first full frame — vs the steady-state frame time below. The
    # reference's frame-0 build+verify is tens of ms
    # (src/main.cu:225-259); ours pays XLA compiles here instead.
    ttff_s = time.perf_counter() - t_process0
    t0 = time.perf_counter()
    total_rays = 0
    for i in range(iters):
        img, rays_traced = frame(jax.random.PRNGKey(i), (i + 1) * 1e-4)
        total_rays += int(jax.block_until_ready(rays_traced))
    elapsed = time.perf_counter() - t0
    mrays = total_rays / elapsed / 1e6
    log(f"trace: {total_rays} rays in {elapsed:.3f}s -> {mrays:.1f} Mrays/s "
        f"(target >= 300)")
    log(f"time-to-first-frame: {ttff_s:.1f} s (process start -> first "
        f"frame, incl. builds/compiles/calibration); steady-state frame: "
        f"{elapsed / iters * 1000:.0f} ms")
    log("note: since round 4, shadow rays for path vertices whose "
        "closest trace MISSED are neither traced nor counted (they "
        "carry no NEE term); rounds <= 3 traced and counted them, "
        "inflating their ray totals ~6% on this scene.")

    metric = f"Mrays/s/chip (primary+bounce) at {num_tris} tris"
    if os.environ.get("TPURT_CPU_FALLBACK") == "1":
        metric = (f"Mrays/s CPU-FALLBACK smoke ({num_tris} tris; "
                  f"TPU tunnel was down at bench time)")
    print(json.dumps({
        "metric": metric,
        "value": round(mrays, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / 300.0, 4),
    }))


if __name__ == "__main__":
    main()
