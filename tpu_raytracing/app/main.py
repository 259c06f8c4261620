"""App shell: scene load -> build -> frame loop -> PNG output
(reference: src/main.cu — GLUT window, CUDA-GL interop and keyboard state
replaced by an offline frame loop with PNG readback, orbit/animate flags in
place of mouse-look, and --cycle-modes in place of the 'm' key).

Frame 0 mirrors the reference exactly: the build runs with per-stage timing
(the run() macro report), the hierarchy is pulled to host and validated
(CountNodes + VerifyHierarchy, src/main.cu:248-259), and the total box-test
count of the first frame is printed (src/main.cu:180-183).
"""

from __future__ import annotations

import math
import os
import sys

import jax

# Reliable platform override for subprocess runs: the session's
# sitecustomize registers the TPU plugin at interpreter start and the
# plain JAX_PLATFORMS env var is latched before user code runs, so
# selecting CPU needs a config update before the backend initializes.
if os.environ.get("TPURT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TPURT_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from tpu_raytracing.app.args import parse_cmd
from tpu_raytracing.bvh import hybrid, lbvh, sah
from tpu_raytracing.bvh.verify import count_nodes, verify_hierarchy
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.scene.objio import load_obj
from tpu_raytracing.scene.types import scene_to_device
from tpu_raytracing.trace.modes import BuildType, RenderType
from tpu_raytracing.trace.pathtrace import path_trace
from tpu_raytracing.trace.render import render_frame
from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs
from tpu_raytracing.utils.png import write_png
from tpu_raytracing.utils.timing import FPSCounter, StageTimer


def load_scene(args):
    if args.filename:
        return load_obj(args.filename)
    spec = args.scene or "cornell"
    if spec == "cornell":
        return procedural.cornell_box()
    if spec.startswith("sphere"):
        sub = int(spec.split(":")[1]) if ":" in spec else 4
        return procedural.sphere_scene(sub)
    if spec.startswith("soup"):
        n = int(spec.split(":")[1]) if ":" in spec else 100000
        return procedural.random_triangle_soup(n)
    if spec.startswith("terrain"):
        n = int(spec.split(":")[1]) if ":" in spec else 1_000_000
        return procedural.terrain(n)
    raise SystemExit(f"unknown scene '{spec}'")


def build_accel(triangles, args, timer: StageTimer):
    """Dispatch + stage-timed build (the reference's run()-wrapped kernel
    sequence, src/BuildWrapper.cu:193-361)."""
    if args.build_type == BuildType.SAH:
        if args.profile_build:
            if args.splits:
                from tpu_raytracing.bvh.splits import setup_split_leaves

                leaves, pairs = timer.run(
                    "setup+splits        ",
                    jax.jit(setup_split_leaves, static_argnums=1),
                    triangles, args.pairs,
                )
            else:
                leaves, pairs = timer.run(
                    "triangle pairing    ",
                    jax.jit(sah.setup_leaves, static_argnums=1),
                    triangles, args.pairs,
                )
            _ = timer.run("grid partition      ",
                          jax.jit(sah.grid_partition), leaves)
        # Auto-selects host-stepped frontiers above the size threshold:
        # a jitted 1M-tri SAH build hits the loop-carried-scatter
        # pathology and takes minutes (docs/TPU_NOTES.md).
        bvh, pairs = timer.run(
            "SharedTaskBuild     ",
            sah.build_sah_auto,
            triangles, args.pairs, args.splits,
        )
    elif args.build_type == BuildType.BOTTOM_UP:
        if args.profile_build:
            aabb = timer.run("SceneAabb           ",
                             jax.jit(lbvh.scene_aabb), triangles)
            codes = timer.run(
                "GenerateMortonCodes ",
                jax.jit(lbvh.generate_morton_codes), triangles, *aabb,
            )
            _ = timer.run("RadixSort           ",
                          jax.jit(lbvh.sort_codes), *codes)
        bvh, pairs = timer.run(
            "BottomUpBuild       ",
            jax.jit(lbvh.build_lbvh, static_argnames="enable_pairs"),
            triangles, args.pairs,
        )
    else:
        bvh, pairs = timer.run(
            "HybridBuild         ",
            jax.jit(hybrid.build_hybrid, static_argnames="enable_pairs"),
            triangles, args.pairs,
        )
    return bvh, pairs


def _profile_split_stages(triangles, enable_pairs: bool, leaf_width: int,
                          iters: int = 2):
    """Per-stage timing of the PRODUCTION bucket/split rebuild — the
    reference's run()-wrapped kernel sequence for its flagship build
    (src/BuildWrapper.cu:196-250 prints ~10 stages) mirrored for ours.

    Stages are cumulative jits of the real pipeline functions (XLA fuses
    across any finer cut); the printed per-stage ms is the delta between
    consecutive cumulative times. Timing is fetch-based (this backend's
    block_until_ready returns on dispatch) with vary-inputs, per
    docs/TPU_NOTES.md "Measurement protocol".
    """
    import time as _time

    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.trace import split_pallas as sp_mod

    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(jnp.ravel(leaf)[:4].astype(jnp.float32)))

    def cum(fn):
        f = jax.jit(fn)
        fetch(f(triangles))  # compile + warm
        t0 = _time.perf_counter()
        for i in range(iters):
            out = f(triangles + (i + 1) * 1e-5)
        fetch(out)
        return (_time.perf_counter() - t0) / iters * 1000.0

    lw = leaf_width

    def front(t):
        return bucket.split_front(t, enable_pairs)

    def tables(t):
        fr = front(t)
        n = fr[0].shape[0]
        return fr, bucket.leaf_major_tables(fr[0], fr[5], n, 8)

    def classify(t):
        fr, (heads, starts, nxts, counts) = tables(t)
        n = fr[0].shape[0]
        live = jnp.arange(n, dtype=jnp.int32) < fr[5]
        return fr, bucket.classify_split(
            heads, starts, counts, live, fr[5], n, lw)

    def aabb_table(t):
        fr, cls = classify(t)
        return fr, cls, bucket._range_min_table(fr[2], fr[3])

    def emit(t):
        return bucket.emit_split(front(t), leaf_width=lw)

    def views(t):
        return sp_mod.prep_split_views(*emit(t))

    stages = [
        ("MortonSortFront     ", front),     # codes + payload sorts + pairs
        ("BucketTables        ", tables),    # head masks + 2 batched scans
        ("Classification      ", classify),  # alive/branch/rows/eff tags
        ("RangeMinAabbTable   ", aabb_table),
        ("EmitScatter         ", emit),      # entry compaction + scatter
        ("KernelViewPrep      ", views),     # pad/transpose to DMA views
    ]
    print("Split-build stage profile (cumulative-delta, "
          f"{iters} warm iters)")
    prev = 0.0
    for name, fn in stages:
        ms = cum(fn)
        print(f"{name} time elapsed: {max(ms - prev, 0.0):f}ms")
        prev = ms
    print(f"SplitBuildTotal      time elapsed: {prev:f}ms")


def orbit_camera(camera, scene, frame, num_frames):
    angle = math.pi / 2 + 2 * math.pi * frame / max(num_frames, 1)
    camera.yaw = angle
    return cam.update_camera(camera)


def main(argv=None):
    args = parse_cmd(argv)
    scene = load_scene(args)
    print("Geometry")
    print(f"  faces:        {scene.num_triangles}")

    dev_scene = scene_to_device(scene)
    camera = cam.initialise_camera(scene.aabb_min, scene.aabb_max)
    os.makedirs(args.output, exist_ok=True)

    triangles = jnp.asarray(scene.triangles)
    timer = StageTimer(should_print=True)
    fps = FPSCounter()

    if args.debug_checks:
        # Frame-0 build with in-build invariants compiled in (the
        # reference's CheckTask family, src/SharedTaskBuilder.cu:169-347);
        # raises with the failing invariant's message on violation.
        from tpu_raytracing.bvh import invariants
        from tpu_raytracing.bvh.build import build as _dispatch

        invariants.run_checked(
            _dispatch, triangles,
            build_type=args.build_type, enable_pairs=args.pairs,
            enable_splits=args.splits)
        print("debug checks: build invariants OK")

    bvh, pairs = build_accel(triangles, args, timer)

    # Frame-0 hierarchy validation (src/main.cu:248-259).
    stats = count_nodes(bvh)
    print("Hierarchy stats")
    print(f"  num nodes:      {stats.num_nodes}")
    print(f"  num tree nodes: {stats.num_tree_nodes}")
    print(f"  num leaf nodes: {stats.num_leaf_nodes}")
    errors = verify_hierarchy(bvh)
    for e in errors:
        print(f"Error: Invalid hierarchy; aabb inclusion check failed on index {e}",
              file=sys.stderr)

    trav = pack_bvh(bvh)
    packed = pack_pairs(pairs)

    # The flagship split kernel edge-pads any resolution to its packet
    # tile grid internally (trace/split_pallas.py), so it never
    # downgrades; the grid tracer is shape-agnostic too. Only the wide/
    # packet/scalar XLA tracers still need 8-divisible frames.
    if (args.width % 8 or args.height % 8) and args.tracer not in (
            "grid", "split", "lane"):
        if args.tracer != "scalar":
            print(f"WARNING: {args.width}x{args.height} is not 8-divisible; "
                  f"downgrading --tracer {args.tracer} -> scalar (slow path). "
                  f"Use 8-divisible dimensions for the fast tracers.",
                  file=sys.stderr)
        args.tracer = "scalar"  # packet tiling needs 8-divisible frames

    if args.refit and args.tracer != "split":
        print("WARNING: --refit needs --tracer split; animated frames "
              "will run the full rebuild path.", file=sys.stderr)

    # make_trav(bvh, packed, triangles) -> (tracer's traversal structure,
    # pair table in that structure's order).
    if args.tracer == "split":
        # Pallas split-BVH kernel: its own Morton-bucket build (the binary
        # --type build above still provides frame-0 hierarchy validation).
        from tpu_raytracing.bvh.bucket import check_split_capacity
        from tpu_raytracing.trace import split_pallas as sp_mod

        tracer = sp_mod.make_split_pallas_tracer(
            None, None, args.width, args.height
        )

        if args.build_type == BuildType.SAH:
            # SAH-quality tree for the flagship kernel
            # (bvh/split_convert.py), spatial splits included (--splits
            # wires SetupSplits' clipped references straight into the
            # leaf windows). Auto host-steps the frontier at scale.
            from tpu_raytracing.bvh.split_convert import build_sah_split_auto

            _prep_split = jax.jit(
                lambda s, p: (sp_mod.prep_split_views(s, p), p, s))

            def _split_build(tris):
                split, packed2 = build_sah_split_auto(
                    tris, enable_pairs=args.pairs,
                    leaf_width=sp_mod.LEAFW,
                    enable_splits=args.splits)
                return _prep_split(split, packed2)
        else:
            # Staged jits: the payload-sort front composed with the
            # emitter in one jit costs a multi-minute compile
            # (docs/TPU_NOTES.md).
            from tpu_raytracing.bvh.bucket import emit_split_views, split_front

            _front = jax.jit(
                lambda tris: split_front(tris, enable_pairs=args.pairs))
            # Fused view emit (round-5 rebuild trim): the entry scatter
            # writes the padded kernel layouts directly instead of a
            # separate prep_split_views pad pass.
            _emit = jax.jit(lambda front: emit_split_views(
                front, leaf_width=sp_mod.LEAFW))

            def _split_build(tris):
                return _emit(_front(tris))

            if args.profile_build:
                _profile_split_stages(triangles, args.pairs,
                                      sp_mod.LEAFW)

        _checked = []
        _frame0_split = []  # (split, rows0) stashed for --refit frames
        _seed_sched = []    # (split, packed) frame-0 seed for GuardedRefit

        def make_trav(bvh, packed, tris):
            views, packed2, split = _split_build(tris)
            if not _checked:  # frame 0 only: the fetch is a host sync
                check_split_capacity(split, tris.shape[0])
                # build/trace window coupling (silent wrong hits if the
                # kernel's window outruns the build's)
                assert split.leaf_width == sp_mod.LEAFW, (
                    split.leaf_width, sp_mod.LEAFW)
                _checked.append(True)
                _frame0_split.append((split, packed2.rows))
                if args.refit:
                    # Frame 0 seeds the quality-guarded refit schedule
                    # (defined below) so the first animated frame refits
                    # instead of rebuilding twice.
                    _seed_sched.append((split, packed2))
            return views, packed2

        # --refit: animated frames run the quality-guarded refit schedule
        # (bvh/refit_schedule.py — the official TPU-native per-frame
        # path for fixed-topology animation): refit each frame, full
        # rebuild when the entry-SA quality monitor trips or the
        # periodic cap is hit. The wobble
        # (scene/procedural.py:animate_triangles) is a pure per-vertex
        # positional function, so it applies directly to the last
        # rebuild's pair rows in sorted order; degenerate sentinel rows
        # displace all four identical vertices identically and stay
        # degenerate.
        from tpu_raytracing.bvh import refit_schedule

        _sched = refit_schedule.GuardedRefit(
            rebuild=lambda tris: (lambda v, p, s: (s, p))(*_split_build(tris)),
            quality_bound=args.refit_bound,
            max_interval=args.refit_interval,
        )

        @jax.jit
        def _deform_rows(rows0, t):
            f2i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)  # noqa: E731
            v = jax.lax.bitcast_convert_type(
                rows0[:, :12], jnp.float32).reshape(-1, 4, 3)
            phase = v[..., 0] * 1.7 + v[..., 2] * 1.3  # [P, 4]
            wobble = jnp.stack([
                jnp.sin(phase * 2.0 + t),
                jnp.cos(phase * 3.0 + t * 1.3),
                jnp.sin(phase * 2.5 + t * 0.7),
            ], axis=-1)
            v = v + jnp.float32(0.05) * wobble
            return jnp.concatenate(
                [f2i(v.reshape(-1, 12)), rows0[:, 12:]], axis=1)

        _prep_views = jax.jit(
            lambda s, p: (sp_mod.prep_split_views(s, p), p))

        def _refit_frame(tris_t, t):
            rows_t = (None if _sched.rows0 is None
                      else _deform_rows(_sched.rows0, t))
            split_t, packed_t, rebuilt = _sched.step(tris_t, rows_t)
            if rebuilt:
                print(f"refit schedule: full rebuild at t={t:.2f} "
                      f"(#{_sched.rebuild_count})")
            return _prep_views(split_t, packed_t)
    elif args.tracer == "grid":
        # Uniform-grid DDA (bvh/grid.py): stackless dense-XLA traversal.
        # The grid is built over whatever pair order the --type build
        # produced (ref order is immaterial to a grid).
        from tpu_raytracing.bvh.grid import (
            auto_res3,
            build_grid,
            check_grid_capacity,
        )
        from tpu_raytracing.bvh.grid import tier_params
        from tpu_raytracing.trace.grid_trace import make_grid_tracer

        tracer = make_grid_tracer()
        _gchecked = []
        _res3 = auto_res3(scene.aabb_max - scene.aabb_min,
                          triangles.shape[0], scale=args.grid_scale)
        _gtp = tier_params(args.grid_scale)
        _grid_build = jax.jit(
            lambda rows: build_grid(rows, jnp.int32(rows.shape[0]),
                                    res=_res3, **_gtp))

        def make_trav(bvh, packed, tris):
            grid = _grid_build(packed.rows)
            if not _gchecked:
                check_grid_capacity(grid)
                _gchecked.append(True)
            return grid, packed

        # Animated frames: the grid needs only fresh pair rows — no
        # binary BVH build at all (grid rebuild = pairing + one sort).
        from tpu_raytracing.bvh.grid import build_grid_from_triangles

        _grid_rebuild = jax.jit(lambda tris: build_grid_from_triangles(
            tris, enable_pairs=args.pairs, res=_res3, **_gtp))
    elif args.tracer == "lane":
        # Per-lane treelet kernel (trace/lane_pallas.py): every ray owns
        # a VPU lane and walks its OWN traversal through <=128-element
        # treelet tables (bvh/treelet.py) — the incoherent-ray design.
        from tpu_raytracing.bvh.bucket import split_front
        from tpu_raytracing.bvh.treelet import build_treelet_auto
        from tpu_raytracing.trace.lane_pallas import make_lane_tracer

        tracer = make_lane_tracer()
        _front_l = jax.jit(
            lambda tris: split_front(tris, enable_pairs=args.pairs))

        def make_trav(bvh, packed, tris):
            # capacity-validated on every build (build_treelet_auto)
            return build_treelet_auto(_front_l(tris))
    elif args.tracer == "wide":
        from tpu_raytracing.bvh.wide import build_wide_fat
        from tpu_raytracing.trace.wide_fat import make_tiled_fat_tracer

        # wide=None: the fat structure rides in the trav argument, so one
        # compiled tracer serves every animated-rebuild frame.
        tracer = make_tiled_fat_tracer(None, args.width, args.height, 8, 8)
        _fat_build = jax.jit(build_wide_fat)

        def make_trav(bvh, packed, tris):
            return _fat_build(bvh, packed.rows), packed
    elif args.tracer == "packet":
        from tpu_raytracing.trace.packet import make_tiled_packet_tracer

        tracer = make_tiled_packet_tracer(args.width, args.height, 8, 8)
        make_trav = lambda bvh, packed, tris: (pack_bvh(bvh), packed)  # noqa: E731
    else:
        from tpu_raytracing.trace.traverse import trace_rays

        tracer = trace_rays
        make_trav = lambda bvh, packed, tris: (pack_bvh(bvh), packed)  # noqa: E731
    trav, packed = make_trav(bvh, packed, triangles)

    if args.interactive:
        from tpu_raytracing.app.interactive import interactive_loop

        def render_one(host_cam, mode):
            cd = cam.camera_to_device(host_cam)
            if args.bounces > 0:
                img, _ = path_trace(
                    trav, packed, dev_scene, cd, args.width, args.height,
                    num_bounces=args.bounces, key=jax.random.PRNGKey(0),
                    tracer=tracer,
                )
                return np.asarray(
                    jnp.clip(img * 255.0, 0, 255).astype(jnp.uint8))
            img_dev, _ = render_frame(
                trav, packed, dev_scene, cd, args.width, args.height,
                mode, tracer=tracer,
            )
            return np.asarray(img_dev)

        interactive_loop(args, camera, render_one, scene)
        return

    modes = list(RenderType)[:-1] if args.cycle_modes else [args.render_type]
    key = jax.random.PRNGKey(0)

    for frame in range(args.frames):
        if args.orbit:
            camera = orbit_camera(camera, scene, frame, args.frames)
        if args.animate and frame > 0:
            triangles = jnp.asarray(
                procedural.animate_triangles(np.asarray(scene.triangles), frame * 0.1)
            )
            if args.tracer == "split" and args.refit:
                # Quality-guarded refit schedule: topology-preserving
                # refit of the last rebuild's tree each frame; the
                # entry-SA monitor (or --refit-interval) triggers full
                # rebuilds when deformation degrades the frozen topology.
                if _seed_sched and _sched.split0 is None:
                    _sched.seed(*_seed_sched[0])
                trav, packed = _refit_frame(triangles, frame * 0.1)
            elif args.tracer == "split":
                # The split tracer runs its own bucket build inside
                # make_trav; the binary --type build only serves frame-0
                # validation — skip it on animated frames.
                trav, packed = make_trav(None, None, triangles)
            elif args.tracer == "grid":
                trav, packed = _grid_rebuild(triangles)
            else:
                quiet = StageTimer(should_print=False)
                bvh, pairs = build_accel(triangles, args, quiet)
                packed = pack_pairs(pairs)
                trav, packed = make_trav(bvh, packed, triangles)
        cam_dev = cam.camera_to_device(camera)

        for mode in modes:
            if args.bounces > 0:
                key, sub = jax.random.split(key)
                img, rays_traced = path_trace(
                    trav, packed, dev_scene, cam_dev, args.width, args.height,
                    num_bounces=args.bounces, key=sub, tracer=tracer,
                )
                img = np.asarray(
                    jnp.clip(img * 255.0, 0, 255).astype(jnp.uint8)
                )
                tests = int(rays_traced)
                name = f"frame{frame:04d}_pt.png"
            else:
                img_dev, tests_dev = render_frame(
                    trav, packed, dev_scene, cam_dev, args.width, args.height,
                    mode, tracer=tracer,
                )
                img = np.asarray(img_dev)
                tests = int(tests_dev)
                name = f"frame{frame:04d}_mode{int(mode)}.png"
            write_png(os.path.join(args.output, name), img)
            if frame == 0:
                # src/main.cu:180-183.
                print(f"Total number of box tests: {tests}")
        rate = fps.tick()
        if rate is not None:
            print(f"fps: {rate:.1f}")

    print(f"Wrote {args.frames * len(modes)} frame(s) to {args.output}/")


if __name__ == "__main__":
    main()
