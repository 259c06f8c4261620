"""Treelet-binned tracing for incoherent rays (bounce/shadow passes).

Measured (docs/TPU_NOTES.md, benchmarks/probe_mt.py): a 256-ray packet of
cell+octant-sorted bounce rays still pays ~23x the pops of a perfectly
coherent packet — the per-packet stack walks the UNION of all lanes'
paths, and per-pop cost (~795 ns) is insensitive to everything else. The
one remaining lever is the pop COUNT, i.e. packet coherence.

This driver restores coherence at the top of the tree, where divergence
is born (the reference has no analogue — its per-thread traversal has no
union waste to fight; this is the TPU-native answer to the same
src/Tracer.cu:308-374 capability):

1. slab-test every ray against the ROOT row's w child boxes (pure XLA,
   dense [n, w] — a tiny fraction of total work);
2. expand to (ray, child) ITEMS — one item per hit child — and group
   items by child, padding each child's item list to the packet size (a
   dense rank/offset computation plus one scatter; no sort needed — the
   incoming rays are already cell+octant sorted, and the expansion is
   stable per child);
3. trace the item packets with the split-Pallas kernel, each packet
   starting at its child's row/window (per-packet start tags,
   trace_rays_split_pallas(packet_tags=...)): every lane of a packet now
   traverses the SAME subtree, so the union path collapses toward the
   per-ray path;
4. combine items per ray with a scatter-min on t plus a winner pass
   (distance ties pick the larger encoded tri id, the global-granularity
   version of the kernel's later-slot-wins rule).

Correctness does not depend on the binning: a ray's items cover exactly
the root children its stack would have visited (minus those culled by
t-updates it would have learned in-flight — binned items cannot share t
across treelets, so they do strictly MORE box work per ray, repaid many
times over by the union collapse).

Capacity: items live in a static buffer of ``cap_factor * n`` slots
(padded per child to the packet size). The needed slot count is returned
for a host-side frame-0 check (``return_needed=True``) — an overflow
would silently drop the highest-numbered children's items, so callers
at new scales must check once, like bvh/bucket.py's capacity guard.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_raytracing.bvh.types import CHILD_TRI
from tpu_raytracing.ops.gather import take_rows
from tpu_raytracing.trace.brute import HitRecord
from tpu_raytracing.trace.ray import Rays
from tpu_raytracing.trace.traverse import PackedPairs, TraceStats
from tpu_raytracing.trace.wide_fat import _reconstruct
from tpu_raytracing.trace import split_pallas as sp

_F32_MAX = float(jnp.finfo(jnp.float32).max)


def _root_entries(inner_i, w):
    """Decode the root row: per-entry (min, max, start tag, valid)."""
    root = inner_i[0]  # [128] int32
    base = jnp.arange(w, dtype=jnp.int32) * 8
    words = root[base[:, None] + jnp.arange(8)[None, :]]  # [w, 8]
    f = jax.lax.bitcast_convert_type(words[:, 0:6], jnp.float32)
    mn, mx = f[:, 0:3], f[:, 3:6]
    meta = words[:, 6]
    ntype = meta & 3
    tag = ((meta >> 5) << 1) | (ntype == CHILD_TRI).astype(jnp.int32)
    return mn, mx, tag, ntype != 0


def trace_rays_binned(
    views, packed: PackedPairs, rays: Rays, active=None,
    any_hit: bool = False, k: int = None, c_slots: int = None,
    leafw: int = None, cap_factor: float = 2.0, return_needed: bool = False,
) -> Tuple[HitRecord, TraceStats]:
    inner_i, inner_v, pairs_f = views
    w = inner_v.shape[1]
    n = rays.origin.shape[0]
    if k is None:
        k = sp.K

    mn, mx, tag_e, valid_e = _root_entries(inner_i, w)

    # --- per-ray root-children slab ([n, w]) ---
    _d = rays.direction
    inv = 1.0 / jnp.where(jnp.abs(_d) < 1e-30,
                          jnp.where(_d < 0, -1e-30, 1e-30), _d)  # [n, 3]
    t0 = (mn[None, :, :] - rays.origin[:, None, :]) * inv[:, None, :]
    t1 = (mx[None, :, :] - rays.origin[:, None, :]) * inv[:, None, :]
    front = jnp.max(jnp.minimum(t0, t1), axis=2)  # [n, w]
    back = jnp.min(jnp.maximum(t0, t1), axis=2)
    live = rays.tmax > rays.tmin
    if active is not None:
        live = live & active
    hit = (
        (back >= front) & (front <= rays.tmax[:, None])
        & (back >= rays.tmin[:, None]) & valid_e[None, :] & live[:, None]
    )  # [n, w]

    # --- expansion: child-major item slots, each child padded to k ---
    v = hit.T  # [w, n] — child-major keeps incoming ray order per child
    counts = jnp.sum(v.astype(jnp.int32), axis=1)  # [w]
    padded = ((counts + k - 1) // k) * k
    ends = jnp.cumsum(padded)  # [w]
    offs = ends - padded
    needed = ends[-1]
    cap = int(max(((int(cap_factor * n) + k - 1) // k) * k, 8 * k))
    rank = jnp.cumsum(v.astype(jnp.int32), axis=1) - v.astype(jnp.int32)
    slot = offs[:, None] + rank  # [w, n]
    slot = jnp.where(v, jnp.minimum(slot, cap), cap)
    ray_ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (w, n))
    srcmap = jnp.full((cap,), -1, jnp.int32).at[slot.reshape(-1)].set(
        ray_ids.reshape(-1), mode="drop")

    # --- gather item rays (dead slots get an empty interval) ---
    ridx = jnp.maximum(srcmap, 0)
    valid_item = srcmap >= 0
    item_rays = Rays(
        origin=take_rows(rays.origin, ridx),
        direction=take_rows(rays.direction, ridx),
        tmin=jnp.where(valid_item, rays.tmin[ridx], _F32_MAX),
        tmax=jnp.where(valid_item, rays.tmax[ridx], -_F32_MAX),
    )

    # --- per-packet start tags ---
    npk = cap // k
    pkt_child = jnp.searchsorted(
        ends // k, jnp.arange(npk, dtype=jnp.int32), side="right")
    ptags = tag_e[jnp.minimum(pkt_child, w - 1)]

    (t_items, tri_items), istats = sp.trace_rays_split_pallas(
        views, packed, item_rays, leafw=leafw, any_hit=any_hit, k=k,
        c_slots=c_slots, packet_tags=ptags, raw=True)

    # --- combine per ray: scatter-min t, then the winning tri ---
    sidx = jnp.where(valid_item, srcmap, n)
    tb = rays.tmax.at[sidx].min(
        jnp.where(valid_item, t_items, _F32_MAX), mode="drop")
    win = jnp.where(
        valid_item & (t_items <= tb[ridx]) & (tri_items >= 0), tri_items, -1)
    tri_r = jnp.full((n,), -1, jnp.int32).at[sidx].max(win, mode="drop")
    box_tests = jnp.zeros((n,), jnp.int32).at[sidx].add(
        jnp.where(valid_item, istats.box_tests, 0), mode="drop")
    tri_tests = jnp.zeros((n,), jnp.int32).at[sidx].add(
        jnp.where(valid_item, istats.tri_tests, 0), mode="drop")

    t_r = rays.tmax if any_hit else tb
    rec = _reconstruct(packed, rays, t_r, tri_r)
    stats = TraceStats(box_tests=box_tests, tri_tests=tri_tests)
    if return_needed:
        return rec, stats, needed
    return rec, stats
