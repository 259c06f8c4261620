"""Uniform-grid DDA tracer vs the brute-force oracle: identical hit sets
on every scene family (soup, terrain, cornell's grid-spanning walls via
the big list), both hit kinds, with and without pairing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh.grid import (
    build_grid_from_triangles,
    check_grid_capacity,
)
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace.brute import make_brute_tracer
from tpu_raytracing.trace.grid_trace import trace_rays_grid
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.traverse import pack_pairs
from tpu_raytracing.bvh.pairing import identity_pairs


def _scene_rays(scene, n=24):
    camera = cam.camera_to_device(
        cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    rays = jax.jit(generate_primary_rays,
                   static_argnames=("width", "height"))(camera, n, n)
    return rays


def _check(scene, enable_pairs, res=None, bounce=False):
    tris = jnp.asarray(scene.triangles)
    grid, packed = jax.jit(
        lambda t: build_grid_from_triangles(t, enable_pairs, res=res))(tris)
    check_grid_capacity(grid)
    rays = _scene_rays(scene)
    if bounce:
        # scatter ray origins/directions around the scene interior
        rng = np.random.default_rng(3)
        num = rays.origin.shape[0]
        span = np.asarray(scene.aabb_max - scene.aabb_min)
        orig = (np.asarray(scene.aabb_min) + rng.uniform(0.1, 0.9, (num, 3))
                * span).astype(np.float32)
        dirs = rng.normal(size=(num, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        rays = rays.replace(origin=jnp.asarray(orig),
                            direction=jnp.asarray(dirs))

    rec, stats = jax.jit(lambda g, p, r: trace_rays_grid(g, p, r))(
        grid, packed, rays)

    brute = make_brute_tracer(tris)
    brec, _ = brute(None, pack_pairs(identity_pairs(tris)), rays)

    rec_t = np.asarray(rec.t)
    brec_t = np.asarray(brec.t)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(brec.hit))
    np.testing.assert_allclose(rec_t, brec_t, rtol=1e-4, atol=1e-5)
    hits = np.asarray(rec.hit)
    np.testing.assert_array_equal(
        np.asarray(rec.prim_id)[hits], np.asarray(brec.prim_id)[hits])
    assert int(np.asarray(stats.tri_tests).sum()) > 0

    # any-hit: occluded iff the closest-hit oracle hit
    arec, _ = jax.jit(
        lambda g, p, r: trace_rays_grid(g, p, r, any_hit=True))(
        grid, packed, rays)
    np.testing.assert_array_equal(np.asarray(arec.hit),
                                  np.asarray(brec.hit))


@pytest.mark.quick
@pytest.mark.parametrize("enable_pairs", [False, True])
def test_grid_soup(enable_pairs):
    _check(procedural.random_triangle_soup(600, seed=5), enable_pairs)


@pytest.mark.parametrize("enable_pairs", [False, True])
def test_grid_terrain(enable_pairs):
    _check(procedural.terrain(2000), enable_pairs)


def test_grid_cornell_big_list():
    scene = procedural.cornell_box()
    tris = jnp.asarray(scene.triangles)
    grid, _ = build_grid_from_triangles(tris, False)
    # cornell's walls span the whole grid -> must ride the big list
    assert int(grid.num_big) > 0
    _check(scene, False)


def test_grid_interior_scattered_rays():
    _check(procedural.terrain(2000), True, bounce=True)


def test_grid_tiny_and_coarse():
    _check(procedural.random_triangle_soup(5, seed=1), False, res=8)


@pytest.mark.quick
def test_grid_residue_compaction_parity():
    """Residue compaction (bounded phase 1 + compacted chunked finish)
    must be bit-identical to the single-phase loop: every ray walks its
    exact original path, so hits, t, prim ids AND per-ray stats match."""
    scene = procedural.terrain(2000)
    tris = jnp.asarray(scene.triangles)
    grid, packed = jax.jit(
        lambda t: build_grid_from_triangles(t, True))(tris)
    check_grid_capacity(grid)

    # 2304 scattered interior rays -> multiple 1024-wide residue chunks
    rng = np.random.default_rng(7)
    num = 2304
    span = np.asarray(scene.aabb_max - scene.aabb_min)
    orig = (np.asarray(scene.aabb_min)
            + rng.uniform(0.05, 0.95, (num, 3)) * span).astype(np.float32)
    dirs = rng.normal(size=(num, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    from tpu_raytracing.trace.ray import Rays

    rays = Rays(origin=jnp.asarray(orig), direction=jnp.asarray(dirs),
                tmin=jnp.zeros((num,), jnp.float32),
                tmax=jnp.full((num,), 1e9, jnp.float32))

    rec0, st0 = jax.jit(lambda g, p, r: trace_rays_grid(g, p, r))(
        grid, packed, rays)
    rec1, st1 = jax.jit(lambda g, p, r: trace_rays_grid(
        g, p, r, residue_after=4, residue_width=1024))(grid, packed, rays)

    np.testing.assert_array_equal(np.asarray(rec1.hit), np.asarray(rec0.hit))
    np.testing.assert_array_equal(np.asarray(rec1.t), np.asarray(rec0.t))
    np.testing.assert_array_equal(np.asarray(rec1.prim_id),
                                  np.asarray(rec0.prim_id))
    np.testing.assert_array_equal(np.asarray(st1.tri_tests),
                                  np.asarray(st0.tri_tests))
    np.testing.assert_array_equal(np.asarray(st1.box_tests),
                                  np.asarray(st0.box_tests))

    # any-hit variant through the residue path as well
    arec0, _ = jax.jit(lambda g, p, r: trace_rays_grid(
        g, p, r, any_hit=True))(grid, packed, rays)
    arec1, _ = jax.jit(lambda g, p, r: trace_rays_grid(
        g, p, r, any_hit=True, residue_after=4,
        residue_width=1024))(grid, packed, rays)
    np.testing.assert_array_equal(np.asarray(arec1.hit),
                                  np.asarray(arec0.hit))


def test_grid_distance_skip_bounds_steps():
    """Two tiny clusters at opposite corners of a big empty box: without
    empty-space skipping a corner-to-corner ray crawls ~3G fine cells;
    distance-field jumps (bvh/grid.py:cell_word, radius cap 15) must keep
    the step count near 3G/14 plus the entry/exit cluster cells."""
    rng = np.random.default_rng(0)
    tri_a = rng.normal(scale=0.5, size=(50, 3, 3)).astype(np.float32)
    tri_b = tri_a + 200.0
    from tpu_raytracing.scene.types import Scene

    tris = np.concatenate([tri_a, tri_b])
    scene_min = tris.reshape(-1, 3).min(axis=0)
    scene_max = tris.reshape(-1, 3).max(axis=0)
    tris_j = jnp.asarray(tris)
    grid, packed = build_grid_from_triangles(tris_j, False, res=96)
    check_grid_capacity(grid)

    num = 64
    origin = np.tile(scene_min - 1.0, (num, 1)).astype(np.float32)
    dirs = ((scene_max - 1.0)[None, :] - origin
            + rng.normal(scale=0.5, size=(num, 3))).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    from tpu_raytracing.trace.ray import Rays

    rays = Rays(origin=jnp.asarray(origin), direction=jnp.asarray(dirs),
                tmin=jnp.zeros((num,), jnp.float32),
                tmax=jnp.full((num,), 1e9, jnp.float32))

    rec, stats = trace_rays_grid(grid, packed, rays)
    max_steps = int(np.asarray(stats.box_tests).max())
    # 3G corner path = 288 fine steps; distance jumps cover the empty
    # middle in ~3G/14 = 21 iterations, plus entry/exit cluster cells.
    assert max_steps < 100, max_steps

    # and the hits still match brute force
    brute = make_brute_tracer(tris_j)
    brec, _ = brute(None, pack_pairs(identity_pairs(tris_j)), rays)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(brec.hit))
    np.testing.assert_allclose(np.asarray(rec.t), np.asarray(brec.t),
                               rtol=1e-4, atol=1e-5)


def test_distance_transform_exact():
    """_dist_transform's logarithmic doubling must equal the brute-force
    capped L-inf distance on random occupancy fields (the skip's safety
    argument is d <= true distance; exactness also proves no skip range
    is left on the table)."""
    from tpu_raytracing.bvh.grid import DCAP, _dist_transform

    rng = np.random.default_rng(7)
    for shape, p in (((9, 13, 11), 0.02), ((6, 6, 6), 0.2),
                     ((40, 3, 17), 0.004), ((5, 1, 64), 0.02)):
        occ = rng.random(shape) < p
        got = np.asarray(_dist_transform(jnp.asarray(occ)))
        # brute force: for every cell, min L-inf distance to a True cell
        idx = np.argwhere(occ)
        gz, gy, gx = shape
        zz, yy, xx = np.meshgrid(np.arange(gz), np.arange(gy),
                                 np.arange(gx), indexing="ij")
        if idx.size == 0:
            want = np.full(shape, DCAP)
        else:
            d = np.full(shape, np.inf)
            for (z, y, x) in idx:
                cand = np.maximum(np.maximum(np.abs(zz - z), np.abs(yy - y)),
                                  np.abs(xx - x))
                d = np.minimum(d, cand)
            want = np.minimum(d, DCAP).astype(np.int32)
        np.testing.assert_array_equal(got, want)


def test_grid_fuzz_adversarial():
    """Seeded fuzz: geometry and rays built to stress the DDA's edge
    cases — axis-plane-aligned quads (footprints that sit exactly on
    cell boundaries), zero-area/collinear degenerate triangles (the MT
    det-epsilon path), rays with exactly axis-aligned directions (DDA
    step sentinels on two axes) and origins on the cell lattice. The
    grid must agree with the brute-force oracle on the hit set and
    distances (prim ids are skipped: duplicate degenerate geometry can
    tie at identical t with either winner valid)."""
    rng = np.random.default_rng(7)
    n_r = 300
    centers = rng.uniform(-2.0, 2.0, (n_r, 1, 3))
    tris_rand = (centers + rng.uniform(-0.3, 0.3, (n_r, 3, 3)))
    # axis-aligned quads on exact integer planes (two tris each)
    quads = []
    for plane_axis, coord in ((0, 0.0), (1, 1.0), (2, -1.0)):
        a, b = [ax for ax in range(3) if ax != plane_axis]
        for lo in (-1.5, 0.25):
            p = np.zeros((4, 3), np.float32)
            p[:, plane_axis] = coord
            p[0, a], p[0, b] = lo, lo
            p[1, a], p[1, b] = lo + 1, lo
            p[2, a], p[2, b] = lo + 1, lo + 1
            p[3, a], p[3, b] = lo, lo + 1
            quads.append(p[[0, 1, 2]])
            quads.append(p[[0, 2, 3]])
    # degenerate: zero-area (repeated vertex) and collinear
    degen = np.array([
        [[0.1, 0.1, 0.1], [0.1, 0.1, 0.1], [0.5, 0.5, 0.5]],
        [[-1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]],
    ], np.float32)
    tris = np.concatenate(
        [tris_rand, np.stack(quads), degen]).astype(np.float32)

    grid, packed = jax.jit(lambda t: build_grid_from_triangles(
        t, True))(jnp.asarray(tris))
    check_grid_capacity(grid)

    num = 256
    orig = np.concatenate([
        rng.uniform(-2.5, 2.5, (num - 64, 3)),          # random interior
        np.round(rng.uniform(-2, 2, (32, 3))),          # on the lattice
        rng.uniform(-8.0, -4.0, (32, 3)),               # outside the box
    ]).astype(np.float32)
    dirs = rng.normal(size=(num, 3)).astype(np.float32)
    axes = np.zeros((48, 3), np.float32)
    axes[np.arange(48), np.arange(48) % 3] = np.where(
        np.arange(48) % 2 == 0, 1.0, -1.0)              # exactly axis-aligned
    dirs[:48] = axes
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    from tpu_raytracing.trace.ray import Rays

    rays = Rays(origin=jnp.asarray(orig), direction=jnp.asarray(dirs),
                tmin=jnp.zeros((num,), jnp.float32),
                tmax=jnp.full((num,), 1e9, jnp.float32))

    rec, _ = jax.jit(lambda g, p, r: trace_rays_grid(g, p, r))(
        grid, packed, rays)
    brute = make_brute_tracer(jnp.asarray(tris))
    brec, _ = brute(None, pack_pairs(identity_pairs(jnp.asarray(tris))),
                    rays)
    np.testing.assert_array_equal(np.asarray(rec.hit),
                                  np.asarray(brec.hit))
    np.testing.assert_allclose(np.asarray(rec.t), np.asarray(brec.t),
                               rtol=1e-4, atol=1e-5)
    arec, _ = jax.jit(lambda g, p, r: trace_rays_grid(
        g, p, r, any_hit=True))(grid, packed, rays)
    np.testing.assert_array_equal(np.asarray(arec.hit),
                                  np.asarray(brec.hit))


def test_grid_compaction_parity():
    """Live-key compaction before the cell-key sort only drops sentinel
    slots (never consumed downstream): the cell tables and the traced
    hit set must match the uncompacted build exactly."""
    scene = procedural.terrain(2000)
    tris = jnp.asarray(scene.triangles)
    rays = _scene_rays(scene)
    outs = []
    for cc in (None, 0):
        grid, packed = jax.jit(lambda t, cc=cc: build_grid_from_triangles(
            t, True, res=(16, 8, 16), compact_cap=cc))(tris)
        check_grid_capacity(grid)
        rec, _ = jax.jit(lambda g, p, r: trace_rays_grid(g, p, r))(
            grid, packed, rays)
        outs.append((grid, rec))
    gc, rc = outs[0]
    gu, ru = outs[1]
    np.testing.assert_array_equal(np.asarray(gc.cell_count),
                                  np.asarray(gu.cell_count))
    np.testing.assert_array_equal(np.asarray(gc.num_big),
                                  np.asarray(gu.num_big))
    np.testing.assert_array_equal(np.asarray(rc.hit), np.asarray(ru.hit))
    np.testing.assert_allclose(np.asarray(rc.t), np.asarray(ru.t),
                               rtol=1e-6, atol=1e-7)


def test_grid_tier_overrides_parity():
    """k/k2/med_frac only redistribute rows between the direct and the
    compacted medium footprint tiers — the traced hit set must be
    invariant. Tiny k forces nearly every row through the medium tier
    (the big-list tier is covered by the cornell-wall tests; its cap is
    deliberately too small to absorb bulk geometry)."""
    scene = procedural.terrain(2000)
    tris = jnp.asarray(scene.triangles)
    rays = _scene_rays(scene)
    recs = []
    for kw in ({}, dict(k=2, k2=64, med_frac=1), dict(k=3, k2=48,
                                                      med_frac=1)):
        grid, packed = jax.jit(lambda t, kw=kw: build_grid_from_triangles(
            t, True, res=(16, 8, 16), **kw))(tris)
        check_grid_capacity(grid)
        rec, _ = jax.jit(lambda g, p, r: trace_rays_grid(g, p, r))(
            grid, packed, rays)
        recs.append(rec)
    for rec in recs[1:]:
        np.testing.assert_array_equal(np.asarray(rec.hit),
                                      np.asarray(recs[0].hit))
        np.testing.assert_allclose(np.asarray(rec.t),
                                   np.asarray(recs[0].t),
                                   rtol=1e-5, atol=1e-6)
