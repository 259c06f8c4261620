"""Build dispatcher (reference: src/BuildWrapper.cu, src/BuildWrapper.cuh:6-20).

The reference hand-computes a byte-exact scratch arena and launches kernel
sequences per build type; under XLA all intermediates are compiler-managed,
so the dispatcher is just the three build pipelines behind one API. The
memory-requirement entry points are kept for API parity — they report the
persistent HBM footprint of the build outputs (the XLA analogue of the
scratch-arena quote).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from tpu_raytracing.bvh import hybrid, lbvh, sah
from tpu_raytracing.bvh.types import BVH, TrianglePairs
from tpu_raytracing.trace.modes import BuildType


def build(
    triangles: jnp.ndarray,
    build_type: BuildType = BuildType.SAH,
    enable_pairs: bool = False,
    enable_splits: bool = False,
) -> Tuple[BVH, TrianglePairs]:
    """RunSahBuild / RunBottomUpBuild equivalent (src/BuildWrapper.cu:140-362).

    ``enable_splits`` applies to the SAH pipeline only, as in the reference
    (the bottom-up driver never consumes it, src/BuildWrapper.cu:253-362).
    """
    if build_type == BuildType.SAH:
        return sah.build_sah(triangles, enable_pairs=enable_pairs,
                             enable_splits=enable_splits)
    if build_type == BuildType.BOTTOM_UP:
        return lbvh.build_lbvh(triangles, enable_pairs=enable_pairs)
    if build_type == BuildType.HYBRID:
        return hybrid.build_hybrid(triangles, enable_pairs=enable_pairs)
    raise ValueError(f"unknown build type {build_type}")


def sah_memory_requirements(num_triangles: int) -> int:
    """Persistent bytes for a SAH build's outputs (cf. SahMemoryRequirements,
    src/BuildWrapper.cu:126-130): node arena + pair buffer, with the same
    20% spatial-split headroom."""
    cap = num_triangles + max(num_triangles // 5, 1)
    node_bytes = (2 * cap + 2 * sah.NUM_BLOCKS + 2) * 32
    pair_bytes = cap * 64
    return node_bytes + pair_bytes


def bu_memory_requirements(num_triangles: int) -> int:
    """Persistent bytes for an LBVH build's outputs (cf. BuMemoryRequirements,
    src/BuildWrapper.cu:132-136)."""
    node_bytes = max(2 * (num_triangles - 1), 2) * 32
    pair_bytes = num_triangles * 64
    return node_bytes + pair_bytes
