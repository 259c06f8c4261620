"""CLI argument parsing (reference: src/Arguments.cpp:42-63, src/Arguments.h).

Same flags and semantics — positional OBJ path, --type {sah,bottom-up,
hybrid}, --pairs, --splits — plus the offline-rendering extensions the TPU
app needs in place of a GL window (resolution, frame count, output dir,
render mode, procedural scene fallback).
"""

from __future__ import annotations

import argparse

from tpu_raytracing.trace.modes import BuildType, RenderType


def parse_cmd(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="tpu_raytracing",
        description="TPU-native interactive ray tracer",
    )
    p.add_argument("filename", nargs="?", default=None,
                   help="OBJ scene file (or use --scene)")
    p.add_argument("--type", dest="build_type", default="sah",
                   choices=[b.value for b in BuildType],
                   help="acceleration-structure build pipeline")
    p.add_argument("--pairs", action="store_true", help="enable triangle pairing")
    p.add_argument("--splits", action="store_true",
                   help="enable bounded spatial splits (SAH builds)")
    # Extensions (the reference's window/keyboard state becomes flags):
    p.add_argument("--scene", default=None,
                   help="procedural scene: cornell | sphere[:subdiv] | soup:N | terrain:N")
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--render-mode", type=int, default=int(RenderType.DEPTH),
                   help="0..8 (reference 'm'-key cycle order)")
    p.add_argument("--cycle-modes", action="store_true",
                   help="render every mode once (the 'm' key loop)")
    p.add_argument("--frames", type=int, default=1)
    p.add_argument("--orbit", action="store_true",
                   help="orbit the camera around the scene across frames")
    p.add_argument("--animate", action="store_true",
                   help="animate geometry + rebuild the BVH per frame")
    p.add_argument("--refit", action="store_true",
                   help="with --animate --tracer split: quality-guarded "
                        "refit schedule — refresh the tree's AABBs in "
                        "place per frame (topology-preserving refit), "
                        "full rebuild only when the entry-SA monitor or "
                        "--refit-interval trips (bvh/refit_schedule.py)")
    p.add_argument("--refit-bound", type=float, default=1.3,
                   help="with --refit: rebuild when total entry surface "
                        "area exceeds this ratio of its value at the "
                        "last rebuild (0 disables the monitor)")
    p.add_argument("--refit-interval", type=int, default=0,
                   help="with --refit: rebuild at least every N frames "
                        "(0 = no periodic cap)")
    p.add_argument("--bounces", type=int, default=0,
                   help="path-trace with N bounces instead of the megakernel modes")
    p.add_argument("--output", default="out", help="PNG output directory")
    p.add_argument("--tracer", default="wide",
               choices=["scalar", "packet", "wide", "split", "grid", "lane"],
                   help="traversal kernel: scalar (reference-exact order), "
                        "packet, wide, split (packet Pallas kernel), "
                        "grid (uniform-grid DDA), or lane (per-lane "
                        "treelet Pallas kernel — each ray owns a VPU "
                        "lane; best for incoherent rays)")
    p.add_argument("--grid-scale", type=float, default=1.0,
                   help="with --tracer grid: cell-size scale (<1 = finer "
                        "cells; footprint tiers widen automatically — "
                        "bvh/grid.py:tier_params)")
    p.add_argument("--profile-build", action="store_true",
                   help="time each build stage separately (the run() report)")
    p.add_argument("--debug-checks", action="store_true",
                   help="compile in-build invariant checks (the reference's "
                        "CheckTask/bin-range/plane-valid diagnostics) and "
                        "raise on violation")
    p.add_argument("--interactive", action="store_true",
                   help="live terminal session: WASD/QE+arrows camera, "
                        "'m' mode cycle, ANSI framebuffer (the reference's "
                        "GLUT window, src/main.cu:303-395)")
    args = p.parse_args(argv)
    args.build_type = BuildType(args.build_type)
    args.render_type = RenderType(args.render_mode)

    # Same confirmation printout as the reference (src/Arguments.cpp:33-40).
    print("Build options")
    print(f"  type:    {args.build_type.value}")
    print(f"  pairs:   {'true' if args.pairs else 'false'}")
    print(f"  splits:  {'true' if args.splits else 'false'}")
    return args
