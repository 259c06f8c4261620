"""SAH -> SplitBVH converter (bvh/split_convert.py): the flagship split
format built from the binned-SAH tree, validated against brute force
through BOTH split-format consumers (BFS tracer + Pallas kernel)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh.bucket import check_split_capacity
from tpu_raytracing.bvh.split_convert import build_sah_split
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.wavefront_bfs import prep_bfs_views, trace_rays_bfs


def _build(scene, enable_pairs, lw):
    tris = jnp.asarray(scene.triangles)
    split, packed = jax.jit(
        functools.partial(build_sah_split, enable_pairs=enable_pairs,
                          leaf_width=lw))(tris)
    check_split_capacity(split, tris.shape[0])
    camera = cam.camera_to_device(
        cam.update_camera(cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
    rays = generate_primary_rays(camera, 16, 8)
    return tris, split, packed, rays


def _assert_matches(rec, ref, prim=True):
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    both = np.asarray(rec.hit) & np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.where(both, np.asarray(rec.t), 0.0),
        np.where(both, np.asarray(ref.t), 0.0), rtol=1e-5)
    if prim:
        np.testing.assert_array_equal(
            np.where(both, np.asarray(rec.prim_id), 0),
            np.where(both, np.asarray(ref.prim_id), 0))


@pytest.mark.parametrize("pairs,lw", [(False, 16), (True, 16), (False, 64)])
def test_sah_split_sphere_bfs_matches_brute(sphere, pairs, lw):
    tris, split, packed, rays = _build(sphere, pairs, lw)
    rec, _, overflow = trace_rays_bfs(
        prep_bfs_views(split, packed), packed, rays)
    assert not bool(overflow)
    _assert_matches(rec, brute_force_trace(tris, rays))


def test_sah_split_cornell_bfs(cornell):
    tris, split, packed, rays = _build(cornell, False, 16)
    rec, _, overflow = trace_rays_bfs(
        prep_bfs_views(split, packed), packed, rays)
    assert not bool(overflow)
    _assert_matches(rec, brute_force_trace(tris, rays))


def test_sah_split_pallas_kernel_matches_brute(sphere):
    from jax.experimental import pallas as pl

    from tpu_raytracing.trace import split_pallas as sp

    tris, split, packed, rays = _build(sphere, False, 16)
    views = sp.prep_split_views(split, packed)
    rec, _ = sp.trace_rays_split_pallas(views, packed, rays, leafw=16)
    _assert_matches(rec, brute_force_trace(tris, rays))


# --- spatial splits through the flagship split format (--type sah
# --splits --tracer split end-to-end; reference quality win:
# src/Multiblock.cu:200-288) ---


def _beam_scene():
    """Floor of small quads + long thin diagonal beams whose unsplit
    AABBs are huge cubes; spatial splits clip them per grid cell."""
    rng = np.random.default_rng(7)
    tris = []
    for i in range(10):
        for j in range(10):
            x, z = i * 0.1, j * 0.1
            y = 0.0
            tris.append([[x, y, z], [x + 0.09, y, z], [x, y, z + 0.09]])
            tris.append([[x + 0.09, y, z], [x + 0.09, y, z + 0.09],
                         [x, y, z + 0.09]])
    for b in range(8):
        # diagonal beam across the whole scene, slightly above the floor
        y = 0.3 + 0.02 * b
        w = 0.004
        tris.append([[0.0, y, 0.0], [1.0, y + w, 1.0], [0.0, y + w, 0.0]])
    arr = np.asarray(tris, np.float32)

    class S:
        triangles = arr
        aabb_min = arr.reshape(-1, 3).min(0)
        aabb_max = arr.reshape(-1, 3).max(0)

    return S()


@pytest.mark.parametrize("pairs", [False, True])
def test_sah_splits_flagship_matches_brute(pairs):
    """Splits build traced by the Pallas split kernel == brute force
    (duplicate window rows are legal closest-hit candidates)."""
    from tpu_raytracing.bvh.split_convert import build_sah_split_auto
    from tpu_raytracing.trace import split_pallas as sp_mod

    scene = _beam_scene()
    tris = jnp.asarray(scene.triangles)
    split, packed = build_sah_split_auto(
        tris, enable_pairs=pairs, leaf_width=16, enable_splits=True)
    check_split_capacity(split, tris.shape[0])
    camera = cam.camera_to_device(
        cam.update_camera(
            cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
    rays = generate_primary_rays(camera, 16, 8)
    views = sp_mod.prep_split_views(split, packed)
    if jax.devices()[0].platform != "tpu":
        from jax.experimental import pallas as pl

        orig = pl.pallas_call
        pl.pallas_call = functools.partial(orig, interpret=True)
        try:
            rec, _ = sp_mod.trace_rays_split_pallas(
                views, packed, rays, leafw=16)
        finally:
            pl.pallas_call = orig
    else:
        rec, _ = sp_mod.trace_rays_split_pallas(views, packed, rays, leafw=16)
    ref = brute_force_trace(tris, rays)
    # prim ids: a duplicated reference reconstructs the same primitive
    _assert_matches(rec, ref, prim=True)


def test_sah_splits_tighten_references():
    """The quality property splits provide: a spanning primitive's
    per-cell references bound LESS total surface area than its single
    unsplit AABB (reference intent: src/Multiblock.cu:200-288; we ship
    the tight triangle-box clipper its comment defers, so the win is
    decisive). End-to-end box-test reduction is scene-dependent (a
    camera that crosses the beam layer everywhere gains nothing), so
    the test pins the structural guarantee, not a traversal count."""
    from tpu_raytracing.bvh.splits import setup_split_leaves

    scene = _beam_scene()
    tris = jnp.asarray(scene.triangles)
    leaves, _pairs = jax.jit(setup_split_leaves, static_argnums=1)(
        tris, False)
    child = np.asarray(leaves.child)
    lo = np.asarray(leaves.aabb_min)
    hi = np.asarray(leaves.aabb_max)
    n_live = int(leaves.num_leaves)

    def sa(lo, hi):
        e = np.maximum(hi - lo, 0.0)
        return 2 * (e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2]
                    + e[:, 0] * e[:, 2])

    # the 8 beam prims (ids 200..207) are the split candidates; the
    # extra-ref budget (num/5 = 41, 15 extras per beam) covers two of
    # them — the PRIORITY grant must spend it on beams, never on the
    # barely-spanning floor quads (which outnumber the beams 25:1 and
    # used to exhaust the budget first in prim order)
    ref_sa = sa(lo[:n_live], hi[:n_live])
    child = child[:n_live]
    v = np.asarray(scene.triangles)
    split_beams = 0
    for pid in range(200, 208):
        sel = np.where(child == pid)[0]
        assert len(sel) >= 1
        if len(sel) == 1:
            continue
        split_beams += 1
        tlo = v[pid].min(0)
        thi = v[pid].max(0)
        full = sa(tlo[None], thi[None])[0]
        clipped = ref_sa[sel]
        # every piece strictly smaller than the unsplit box, and the
        # pieces' TOTAL below the unsplit SA (the tight clipper makes
        # the diagonal's off-axis cells near-degenerate)
        assert np.all(clipped < full), (pid, clipped.max(), full)
        assert clipped.sum() < full, (pid, clipped.sum(), full)
    assert split_beams >= 2, split_beams
    # floor quads never get the budget: exactly one exact-AABB ref each
    for pid in range(0, 200):
        sel = np.where(child == pid)[0]
        assert len(sel) == 1, (pid, len(sel))
    for pid in (0, 1, 99):
        sel = np.where(child == pid)[0]
        np.testing.assert_allclose(lo[sel[0]], v[pid].min(0), atol=1e-5)
        np.testing.assert_allclose(hi[sel[0]], v[pid].max(0), atol=1e-5)
