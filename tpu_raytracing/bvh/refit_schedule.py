"""Quality-guarded refit schedule — the official animated-frame build path.

The reference rebuilds its BVH every frame because a GPU build is
ms-cheap (src/main.cu:225-247 re-runs the build whenever geometry
changes). On this backend a full SAH-quality rebuild at 1M triangles is
~400-550 ms while a topology-preserving refit (bvh/bucket.py:refit_split)
is ~100 ms — but a refitted tree degrades as geometry deforms away from
the topology it was built for: entry AABBs inflate and overlap, and
per-ray box tests climb. The production schedule is therefore:

    refit every frame; full rebuild when a cheap quality monitor trips
    (or a periodic frame cap, whichever first).

Monitor: total surface area of the live inner entries. The SAH cost of a
tree is sum(SA(node) * P_visit); deformation that makes the frozen
topology a bad fit inflates refitted boxes, so SA_now / SA_at_rebuild is
a direct, O(rows) proxy for traversal-cost growth. The guard value is
ONE device scalar, and it is checked with one frame of lag (frame i's
ratio gates frame i+1's decision) so the fetch overlaps the frame's own
compute instead of serializing the pipeline.

Typical use (app --animate --refit, bench.py guarded-schedule metric):

    sched = GuardedRefit(rebuild=lambda tris: build(tris))
    for t in frames:
        rows_t = deform(sched.rows0, t)      # fixed topology: deform the
        split, packed, rebuilt = sched.step(  # last rebuild's pair rows
            triangles_t=animate(tris0, t), rows_t=rows_t)
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_raytracing.bvh.bucket import SplitBVH, refit_split
from tpu_raytracing.trace.traverse import PackedPairs


@jax.jit
def entry_surface_area(inner: jnp.ndarray) -> jnp.ndarray:
    """Total surface area of live entries of a SplitBVH inner table.

    Empty slots are inverted boxes (+max..-max, bvh/bucket.py) and are
    masked out before any arithmetic (their extents would overflow f32).
    """
    e = inner.reshape(-1, 8)
    lo = jax.lax.bitcast_convert_type(e[:, 0:3], jnp.float32)
    hi = jax.lax.bitcast_convert_type(e[:, 3:6], jnp.float32)
    d = hi - lo
    live = jnp.all(d >= 0.0, axis=1) & (e[:, 6] != 0)
    d = jnp.where(live[:, None], d, 0.0)
    sa = 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0])
    return jnp.sum(sa)


_refit_jit = jax.jit(refit_split)


class GuardedRefit:
    """Refit-per-frame with quality-guarded (and optionally periodic)
    full rebuilds. See the module docstring for the schedule.

    ``rebuild(triangles) -> (SplitBVH, PackedPairs)`` — the full build
    (its output's ``e_ranges`` must be present, i.e. an emit_split /
    build_sah_split product). ``refit(split0, packed_t) -> SplitBVH``
    defaults to bvh/bucket.py:refit_split.

    ``quality_bound``: rebuild when SA_now / SA_at_rebuild exceeds it
    (1.3 ≈ tens of percent more box tests — cheap insurance). 0 disables
    the monitor. ``max_interval``: rebuild at least every N frames;
    0 disables the cap.
    """

    def __init__(
        self,
        rebuild: Callable[[jnp.ndarray], Tuple[SplitBVH, PackedPairs]],
        refit: Optional[Callable] = None,
        quality_bound: float = 1.3,
        max_interval: int = 0,
    ):
        self._rebuild = rebuild
        self._refit = refit if refit is not None else (
            lambda s, p: _refit_jit(s, p))
        self.quality_bound = float(quality_bound)
        self.max_interval = int(max_interval)
        self.split0: Optional[SplitBVH] = None
        self.rows0 = None          # pair rows at last rebuild (sorted order)
        self._sa0 = None           # host float at last rebuild
        self._pending_sa = None    # device scalar from the previous frame
        self.frames_since_rebuild = 0
        self.rebuild_count = 0

    def seed(self, split: SplitBVH, packed: PackedPairs) -> None:
        """Adopt an existing build (e.g. frame 0, built outside the
        scheduler) as the schedule's rebuild point."""
        self.split0 = split
        self.rows0 = packed.rows
        self._sa0 = float(entry_surface_area(split.inner))
        self._pending_sa = None
        self.frames_since_rebuild = 0

    def _do_rebuild(self, triangles_t):
        split, packed = self._rebuild(triangles_t)
        self.split0 = split
        self.rows0 = packed.rows
        self._sa0 = float(entry_surface_area(split.inner))
        self._pending_sa = None
        self.frames_since_rebuild = 0
        self.rebuild_count += 1
        return split, packed

    def _guard_trips(self) -> bool:
        if self.split0 is None:
            return True
        if self.max_interval and self.frames_since_rebuild >= self.max_interval:
            return True
        if self.quality_bound and self._pending_sa is not None:
            # One-frame-lagged fetch: by now the previous frame's scalar
            # has long materialized, so this float() does not block.
            ratio = float(self._pending_sa) / max(self._sa0, 1e-30)
            if ratio > self.quality_bound:
                return True
        return False

    def step(self, triangles_t, rows_t=None):
        """Advance one animated frame.

        ``triangles_t``: this frame's geometry in input (triangle) order
        — consumed only when a rebuild triggers. ``rows_t``: this frame's
        pair rows in the *current tree's* sorted order (deform
        ``self.rows0``); None forces a rebuild (first frame, or topology
        changed). Returns (split, packed, rebuilt: bool).
        """
        if rows_t is None or self._guard_trips():
            split, packed = self._do_rebuild(triangles_t)
            return split, packed, True
        packed_t = PackedPairs(rows=rows_t)
        split_t = self._refit(self.split0, packed_t)
        self._pending_sa = entry_surface_area(split_t.inner)
        self.frames_since_rebuild += 1
        return split_t, packed_t, False
