"""Uniform-grid accelerator — the stackless, scalar-control-free
structure for incoherent rays.

Motivation (measured, docs/TPU_NOTES.md): the flagship split-BVH Pallas
kernel is bounded by ~480 ns of serialized scalar control per pop, and
incoherent bounce packets pay ~23x the per-ray ideal pop count (union
divergence). A uniform grid removes both terms: 3D-DDA traversal is a
fixed per-step vector recurrence (no stack, no per-node decisions), so
the whole bounce pass runs as dense [R]-wide XLA ops whose only
data-dependent accesses are gathers from LOOP-INVARIANT tables — the
fast case on this backend (~0.03 ms per 1M rows).

The reference has no grid (its GPU BVH traversal maps well onto warps);
this is a TPU-first addition in the spirit of SURVEY.md §5's "pick the
structure the hardware likes". The build is two dense passes + one sort
(the TPU's cheapest primitives), which also makes it the fastest
full-rebuild path for animated scenes.

Layout:
* refs: pair-row ids (trace/traverse.py:PackedPairs rows) sorted by
  cell id — a cell's references are the contiguous run
  [cell_start[c], cell_start[c] + cell_count[c]).
* rows whose AABB footprint covers more than K_FOOTPRINT cells go to a
  small global "big list" tested once per ray (walls/floors in cornell-
  style scenes); overflow past its static bound is host-guarded via
  check_grid_capacity, like bvh/bucket.py:check_split_capacity.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

_F32_MAX = float(jnp.finfo(jnp.float32).max)

# cell_word packing: low bits = ref count, high bits = capped L-inf
# distance to the nearest nonempty cell. A count can never reach
# 1 << DIST_SHIFT (it is bounded by the ref table size, host-asserted in
# build_grid), so the fields never collide.
DIST_SHIFT = 27
DCAP = 15  # skip radius cap; 4 doubling rounds (1+2+4+8) reach it


def _dist_transform(occ3: jnp.ndarray) -> jnp.ndarray:
    """Capped L-inf distance transform of a [gz, gy, gx] occupancy mask:
    out[c] = min(DCAP, distance to the nearest True cell). DCAP chamfer
    rounds, each a radius-1 separable min-filter (three axes x two
    shifted mins — pure dense XLA pad + slice, no gathers): after round
    k the field is exact wherever the true distance is <= k. A 3-tap
    filter at radius r > 1 would only see offsets {-r, 0, +r} per axis,
    overestimating diagonal distances (UNSAFE for the skip), so doubling
    does not apply; 15 dense rounds over the cell table are negligible
    next to the build's footprint sort."""
    d = jnp.where(occ3, jnp.int32(0), jnp.int32(DCAP))

    def shifted_min(a, axis):
        pad = [(0, 0)] * 3
        lead, trail = list(pad), list(pad)
        lead[axis] = (1, 0)
        trail[axis] = (0, 1)
        big = jnp.int32(DCAP)
        fwd = jnp.pad(a, lead, constant_values=big)
        bwd = jnp.pad(a, trail, constant_values=big)
        sl = [slice(None)] * 3
        sf, sb = list(sl), list(sl)
        sf[axis] = slice(0, a.shape[axis])
        sb[axis] = slice(1, 1 + a.shape[axis])
        return jnp.minimum(a, jnp.minimum(fwd[tuple(sf)], bwd[tuple(sb)]))

    for _ in range(DCAP):
        e = d
        for axis in range(3):
            e = shifted_min(e, axis)
        d = jnp.minimum(d, e + 1)
    return d

# Max cells a row may reference directly; rows up to K2_FOOTPRINT go
# through a second, COMPACTED enumeration tier (few rows are that large
# — steep terrain quads span up to ~24 cells at cell scale 1.0 — so the
# extra slots ride on ~P/med_frac gathered rows, not the full axis);
# anything larger joins the global big list (walls, floors). Finer cell
# scales grow every footprint ~1/scale^2: build_grid takes k/k2/med_frac
# overrides so sub-1.0 scales stay in the tiers instead of overflowing
# the big list (benchmarks/probe_grid_cpu.py sweeps them).
K_FOOTPRINT = 8
K2_FOOTPRINT = 32


def tier_params(scale: float) -> dict:
    """Footprint-tier sizing for a given cell scale: row footprints grow
    ~1/scale^2 as cells shrink, so sub-1.0 scales widen the medium tier
    (k2) and deepen its row budget (med_frac) to keep bulk geometry out
    of the per-ray big list. Shared by bench.py and the probes so the
    calibration candidates and the sweeps agree."""
    return dict(
        k=K_FOOTPRINT,
        k2=max(K2_FOOTPRINT, int(K2_FOOTPRINT / (scale * scale))),
        med_frac=16 if scale >= 1.0 else 4,
    )


@flax.struct.dataclass
class UniformGrid:
    cell_start: jnp.ndarray  # [G^3 + 1] int32 — first ref of cell c
    cell_count: jnp.ndarray  # [G^3 + 1] int32
    refs: jnp.ndarray        # [RCAP] int32 — pair-row ids sorted by cell
    big: jnp.ndarray         # [BCAP] int32 — row ids tested by every ray
    num_big: jnp.ndarray     # [] int32 — live prefix of big
    overflow: jnp.ndarray    # [] int32 — big rows past BCAP (host guard)
    grid_min: jnp.ndarray    # [3] f32
    grid_max: jnp.ndarray    # [3] f32
    cell_size: jnp.ndarray   # [3] f32
    # Empty-space skipping word, one per cell: count | (dist << DIST_SHIFT)
    # where dist = min(L-inf distance to the nearest NONEMPTY cell, DCAP)
    # — a capped distance transform ("proximity clouds", Cohen &
    # Sheffer '94), built as log2(DCAP+1) rounds of separable shifted-min
    # passes (dense XLA, no scatter). A ray in an empty cell with
    # dist = D >= 2 may advance to just before its (D-1)-th boundary
    # crossing on ANY axis in ONE DDA iteration: every cell it can touch
    # lies within the L-inf ball of radius D-1, which the transform
    # guarantees empty. Replaces a fixed 8^3 macrocell occupancy grid:
    # adaptive skip radius, fires from any empty cell (not only when the
    # whole containing block is empty), and the trace loop reads ONE
    # packed word instead of count + occupancy (one fewer gather per
    # iteration).
    cell_word: jnp.ndarray = None  # [G^3 + 1] int32 packed count|dist
    # Per-axis resolution (gx, gy, gz): anisotropic domains (heightfield
    # slabs) keep CUBIC cells but drop the empty-axis table waste.
    res: tuple = flax.struct.field(pytree_node=False, default=(64, 64, 64))


def _grid_res(num_rows: int, density: float = 4.0) -> int:
    """Cells ~= density * rows (classic lambda heuristic), clamped so the
    cell tables stay small."""
    g = int(round((density * max(num_rows, 1)) ** (1.0 / 3.0)))
    return max(8, min(g, 160))


def _big_cap(num_rows: int) -> int:
    return max(64, num_rows // 256)


def auto_res3(span, num_rows: int, scale: float = 1.0):
    """HOST-side per-axis resolution: cubic cells of size
    (max span / G0) * scale, each axis sized to its own span. Measured
    at 1M (benchmarks/probe_grid_cpu.py): the tight per-axis box cuts
    primary DDA steps ~1.8x vs the cubified default (rays stop crawling
    the padded empty axis) at identical footprints. ``span`` is the
    host-known scene extent (e.g. scene.aabb_max - scene.aabb_min);
    resolutions must be static, so this cannot run under jit."""
    import numpy as _np

    span = _np.maximum(_np.asarray(span, _np.float64), 1e-6)
    s = float(span.max()) / _grid_res(num_rows) * scale
    return tuple(int(_np.clip(_np.ceil(a / s), 1, 512)) for a in span)


def _tri_cell_overlap(v, clo_k, gmin, cs):
    """Separating-axis overlap of both triangles of each pair row with
    cell (clo_k) — Akenine-Moller reduced to the axes that matter after
    the AABB footprint prescreen (the 3 box axes already passed): the
    two face normals and the 9 edge cross-axes per triangle.

    v: [P, 4, 3] pair vertices; clo_k: [P, 3] int cell coords.
    Returns [P] bool: the pair touches the cell."""
    c = gmin[None, :] + (clo_k.astype(jnp.float32) + 0.5) * cs[None, :]
    h = 0.5 * cs[None, :]  # half extents

    def tri_hits(a, b, cvtx):
        # translate cell to origin
        p0 = a - c
        p1 = b - c
        p2 = cvtx - c
        e0 = p1 - p0
        e1 = p2 - p1
        e2 = p0 - p2
        ok = jnp.ones((v.shape[0],), bool)
        # 9 edge cross products axes: for edge e and unit axis u,
        # axis = cross(u, e)
        for e in (e0, e1, e2):
            ex, ey, ez = e[:, 0], e[:, 1], e[:, 2]
            for (ax, ay, az) in (
                (jnp.zeros_like(ex), -ez, ey),      # X x e
                (ez, jnp.zeros_like(ex), -ex),      # Y x e
                (-ey, ex, jnp.zeros_like(ex)),      # Z x e
            ):
                d0 = ax * p0[:, 0] + ay * p0[:, 1] + az * p0[:, 2]
                d1 = ax * p1[:, 0] + ay * p1[:, 1] + az * p1[:, 2]
                d2 = ax * p2[:, 0] + ay * p2[:, 1] + az * p2[:, 2]
                r = (h[:, 0] * jnp.abs(ax) + h[:, 1] * jnp.abs(ay)
                     + h[:, 2] * jnp.abs(az))
                lo = jnp.minimum(jnp.minimum(d0, d1), d2)
                hi = jnp.maximum(jnp.maximum(d0, d1), d2)
                ok &= (lo <= r) & (hi >= -r)
        # face normal axis (plane-box overlap)
        nx = e0[:, 1] * e1[:, 2] - e0[:, 2] * e1[:, 1]
        ny = e0[:, 2] * e1[:, 0] - e0[:, 0] * e1[:, 2]
        nz = e0[:, 0] * e1[:, 1] - e0[:, 1] * e1[:, 0]
        d = nx * p0[:, 0] + ny * p0[:, 1] + nz * p0[:, 2]
        r = (h[:, 0] * jnp.abs(nx) + h[:, 1] * jnp.abs(ny)
             + h[:, 2] * jnp.abs(nz))
        ok &= jnp.abs(d) <= r
        return ok

    hit_a = tri_hits(v[:, 0], v[:, 1], v[:, 2])
    hit_b = tri_hits(v[:, 2], v[:, 1], v[:, 3])
    return hit_a | hit_b


def build_grid(rows: jnp.ndarray, num_live,
               res: Optional[int] = None,
               k: int = K_FOOTPRINT, k2: int = K2_FOOTPRINT,
               med_frac: int = 16,
               compact_cap: Optional[int] = None) -> UniformGrid:
    """Build the grid over live pair rows ([P, 16] int32, vertex words
    0-11; ``num_live`` is the live prefix — sentinel tail rows are
    ignored). ``k``/``k2``/``med_frac`` size the direct/medium footprint
    tiers (see K_FOOTPRINT above); raise them for cell scales < 1.
    ``compact_cap`` bounds the live-key compaction before the cell-key
    sort (None = 6 rows/ref default, 0 = disabled)."""
    p = rows.shape[0]
    if res is None:
        g0 = _grid_res(p)
        res3 = (g0, g0, g0)
    elif isinstance(res, int):
        res3 = (res, res, res)
    else:
        res3 = tuple(int(r) for r in res)
    gx, gy, gz = res3
    g3 = gx * gy * gz
    gvec = jnp.asarray(res3, jnp.int32)
    bcap = _big_cap(p)
    iota = jnp.arange(p, dtype=jnp.int32)
    live = iota < num_live

    v = jax.lax.bitcast_convert_type(rows[:, :12], jnp.float32).reshape(
        -1, 4, 3)
    lo = jnp.min(v, axis=1)
    hi = jnp.max(v, axis=1)

    gmin = jnp.min(jnp.where(live[:, None], lo, _F32_MAX), axis=0)
    gmax = jnp.max(jnp.where(live[:, None], hi, -_F32_MAX), axis=0)
    span = jnp.maximum(gmax - gmin, 1e-6)
    # Equal per-axis counts get a CUBIFIED box (cubic cells, padded axes
    # are empty table rows); explicit per-axis counts size each axis to
    # its own span — pass counts proportional to the spans for cubic
    # cells without the padding.
    if res3[0] == res3[1] == res3[2]:
        cube = jnp.max(span)
        gmax = gmin + cube
        pad_eps = cube
    else:
        pad_eps = jnp.max(span)
    # Grow the box slightly so boundary vertices bin strictly inside.
    gmin = gmin - pad_eps * 1e-4
    gmax = gmax + pad_eps * 1e-4
    cs = (gmax - gmin) / gvec.astype(jnp.float32)
    inv_cs = 1.0 / cs

    clo = jnp.clip(jnp.floor((lo - gmin) * inv_cs).astype(jnp.int32),
                   0, gvec - 1)
    chi = jnp.clip(jnp.floor((hi - gmin) * inv_cs).astype(jnp.int32),
                   0, gvec - 1)
    dx = chi[:, 0] - clo[:, 0] + 1
    dy = chi[:, 1] - clo[:, 1] + 1
    dz = chi[:, 2] - clo[:, 2] + 1
    total = dx * dy * dz
    is_med = live & (total > k) & (total <= k2)
    is_big = live & (total > k2)
    direct = live & (total <= k)

    # --- direct refs: K static slots per row, sentinel-keyed when unused.
    # Rows with a multi-cell footprint get an exact triangle-box overlap
    # test per candidate (SAT): a diagonal triangle's AABB covers cells
    # its plane never touches — dropping those refs shrinks per-cell
    # counts with zero effect on hits (a removed cell cannot contain any
    # point of the triangle). Single-cell footprints skip the test. ---
    keys = []
    for ki in range(k):
        kk = jnp.int32(ki)
        kx = kk % dx
        ky = (kk // dx) % dy
        kz = kk // (dx * dy)
        clo_k = clo + jnp.stack([kx, ky, kz], axis=1)
        cell = (clo_k[:, 2] * gy + clo_k[:, 1]) * gx + clo_k[:, 0]
        ok = direct & (kk < total)
        ok &= (total == 1) | _tri_cell_overlap(v, clo_k, gmin, cs)
        keys.append(jnp.where(ok, cell, g3))
    # --- medium tier: compacted rows, K2 candidate slots each ---
    med_cap = max(p // med_frac, 256)
    (midx,) = jnp.nonzero(is_med, size=med_cap, fill_value=p)
    num_med = jnp.sum(is_med.astype(jnp.int32))
    mvalid = midx < p
    midx = jnp.minimum(midx, p - 1).astype(jnp.int32)
    mclo = clo[midx]
    mdx, mdy = dx[midx], dy[midx]
    mtotal = total[midx]
    mv = v[midx]
    mkeys = []
    for ki in range(k2):
        kk = jnp.int32(ki)
        kx = kk % mdx
        ky = (kk // mdx) % mdy
        kz = kk // (mdx * mdy)
        mclo_k = mclo + jnp.stack([kx, ky, kz], axis=1)
        cell = (mclo_k[:, 2] * gy + mclo_k[:, 1]) * gx + mclo_k[:, 0]
        ok = mvalid & (kk < mtotal)
        ok &= _tri_cell_overlap(mv, mclo_k, gmin, cs)
        mkeys.append(jnp.where(ok, cell, g3))

    # k-major flat layout: pure 1-D concatenations (a [P, K] stack would
    # tile-pad K -> 128 lanes, ~16x the bytes at 1M). Ref order within a
    # cell is immaterial — duplicated refs produce identical winners.
    key_flat = jnp.concatenate(keys + mkeys)  # [K*P + K2*M]
    row_flat = jnp.concatenate([iota] * k + [midx] * k2)

    # --- live-key compaction before the sort: the direct tier emits k
    # static slots per row but terrain rows average ~3 live cells
    # (benchmarks/probe_grid_cpu.py), so most of key_flat is sentinel.
    # One cumsum+scatter compaction (linear passes) shrinks the
    # O(n log n) sort input ~2.5x. Exactly parity-preserving: sentinel
    # keys (g3) are never consumed downstream — heads/pos_of drop them —
    # so removing them pre-sort changes nothing live. Static cap with
    # the same host-sync overflow guard as the tiers. ---
    m0 = key_flat.shape[0]
    if compact_cap is None:
        compact_cap = max(6 * p, 4096)
    key_overflow = jnp.zeros((), jnp.int32)
    if 0 < compact_cap < m0:
        livemask = key_flat < g3
        n_live = jnp.sum(livemask.astype(jnp.int32))
        (cidx,) = jnp.nonzero(livemask, size=compact_cap, fill_value=m0)
        safe_idx = jnp.minimum(cidx, m0 - 1)
        key_flat = jnp.where(cidx < m0, key_flat[safe_idx], g3)
        row_flat = row_flat[safe_idx]
        key_overflow = jnp.maximum(n_live - compact_cap, 0)
    key_sorted, refs = jax.lax.sort_key_val(key_flat, row_flat)

    m = key_flat.shape[0]
    ridx = jnp.arange(m, dtype=jnp.int32)
    heads = jnp.concatenate(
        [jnp.ones((1,), bool),
         key_sorted[1:] != key_sorted[:-1]])
    # first position of each present cell id; absent cells stay at count 0
    pos_of = jnp.zeros((g3 + 2,), jnp.int32).at[
        jnp.where(heads, key_sorted, g3 + 1)].set(ridx, mode="drop")
    nxt = jnp.concatenate([jnp.where(heads[1:], ridx[1:], m),
                           jnp.full((1,), m, jnp.int32)])
    run_end = jax.lax.cummin(nxt, reverse=True)
    end_of = jnp.zeros((g3 + 2,), jnp.int32).at[
        jnp.where(heads, key_sorted, g3 + 1)].set(run_end, mode="drop")
    cell_start = pos_of[: g3 + 1]
    cell_count = jnp.maximum(end_of[: g3 + 1] - cell_start, 0)
    # sentinel cell g3 (out-of-range queries) has count 0:
    cell_count = cell_count.at[g3].set(0)

    # --- capped distance transform for empty-space skipping (see
    # UniformGrid.cell_word) --- linear cell id is x-fastest: [z, y, x]
    assert refs.shape[0] < (1 << DIST_SHIFT), refs.shape
    occ3 = (cell_count[:g3] > 0).reshape(gz, gy, gx)
    dist = _dist_transform(occ3).reshape(-1)
    cell_word = jnp.concatenate(
        [cell_count[:g3] | (dist << DIST_SHIFT),
         jnp.zeros((1,), jnp.int32)])  # sentinel: count 0, no skip

    # --- big list: rows tested once by every ray ---
    (bidx,) = jnp.nonzero(is_big, size=bcap, fill_value=p)
    num_big = jnp.sum(is_big.astype(jnp.int32))
    overflow = (jnp.maximum(num_big - bcap, 0)
                + jnp.maximum(num_med - med_cap, 0) + key_overflow)
    big = jnp.minimum(bidx, p - 1).astype(jnp.int32)

    return UniformGrid(
        cell_start=cell_start, cell_count=cell_count, refs=refs,
        big=big, num_big=jnp.minimum(num_big, bcap), overflow=overflow,
        grid_min=gmin, grid_max=gmax, cell_size=cs,
        cell_word=cell_word, res=res3)


def check_grid_capacity(grid: UniformGrid) -> None:
    """Host-fetch guard: raises if the big list overflowed its static
    bound (dropped geometry). Call wherever a build result is synced."""
    ov = int(grid.overflow)
    if ov > 0:
        raise RuntimeError(
            f"UniformGrid capacity overflow: {ov} rows/refs past the "
            f"medium/big/compaction static bounds — raise _big_cap, the "
            f"medium cap, compact_cap, or the grid resolution "
            f"(bvh/grid.py)")


def build_grid_from_triangles(
    triangles: jnp.ndarray, enable_pairs: bool = False,
    res: Optional[int] = None,
    k: int = K_FOOTPRINT, k2: int = K2_FOOTPRINT, med_frac: int = 16,
    compact_cap: Optional[int] = None,
) -> Tuple[UniformGrid, "PackedPairs"]:
    """Standalone build: pairing setup (no Morton sort needed — the
    cell-key sort organizes everything) + grid over the pair rows."""
    from tpu_raytracing.bvh.sah import setup_leaves
    from tpu_raytracing.trace.traverse import pack_pairs

    leaves, pairs = setup_leaves(triangles, enable_pairs)
    packed = pack_pairs(pairs)
    rows = packed.rows
    # zero the sentinel tail so stray window/ref tests never hit
    iota = jnp.arange(rows.shape[0], dtype=jnp.int32)
    rows = jnp.where((iota < leaves.num_leaves)[:, None], rows, 0)
    grid = build_grid(rows, leaves.num_leaves, res=res,
                      k=k, k2=k2, med_frac=med_frac,
                      compact_cap=compact_cap)
    from tpu_raytracing.trace.traverse import PackedPairs

    return grid, PackedPairs(rows=rows)
