"""Per-lane treelet kernel (trace/lane_pallas.py) in interpret mode:
must match brute force (and the structure's NumPy reference walker is
validated separately in test_treelet.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import bucket, treelet
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace import lane_pallas
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.ray import Rays, generate_primary_rays


def _build(scene, enable_pairs, lw=16, tcap=None):
    tris = jnp.asarray(scene.triangles)
    front = jax.jit(
        lambda t: bucket.split_front(t, enable_pairs=enable_pairs))(tris)
    if tcap is None:
        tcap = treelet.treelet_capacity(front, lw) + 8
    tb, packed = jax.jit(
        lambda f: treelet.build_treelet(f, tcap, leaf_width=lw))(front)
    treelet.check_treelet_capacity(tb)
    return tris, tb, packed


def _rays(scene, w=16, h=8):
    camera = cam.camera_to_device(
        cam.update_camera(
            cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
    return generate_primary_rays(camera, w, h)


def _check(tris, tb, packed, rays, active=None, **kw):
    rec, stats = lane_pallas.trace_rays_lane_pallas(
        tb, packed, rays, active=active, **kw)
    ref = brute_force_trace(tris, rays)
    hit = np.asarray(rec.hit)
    rhit = np.asarray(ref.hit)
    if active is not None:
        rhit = rhit & np.asarray(active)
    np.testing.assert_array_equal(hit, rhit)
    both = hit & rhit
    np.testing.assert_allclose(
        np.where(both, np.asarray(rec.t), 0.0),
        np.where(both, np.asarray(ref.t), 0.0), rtol=1e-5)
    np.testing.assert_array_equal(
        np.where(both, np.asarray(rec.prim_id), 0),
        np.where(both, np.asarray(ref.prim_id), 0))
    return rec, stats


@pytest.mark.quick
def test_lane_cornell(cornell):
    tris, tb, packed = _build(cornell, False)
    _check(tris, tb, packed, _rays(cornell))


def test_lane_sphere_pairs(sphere):
    tris, tb, packed = _build(sphere, True)
    rec, stats = _check(tris, tb, packed, _rays(sphere))
    assert int(np.asarray(stats.box_tests).max()) > 8  # real traversal


def test_lane_portals(soup):
    # small capacity -> many treelets -> portal crossings + table swaps
    tris, tb, packed = _build(soup, True)
    assert int(tb.num_treelets) > 1
    _check(tris, tb, packed, _rays(soup))


def test_lane_multi_packet(sphere):
    # 4 packets through C=2 slots exercises the drain/refill path
    tris, tb, packed = _build(sphere, False)
    _check(tris, tb, packed, _rays(sphere, 32, 16))


def test_lane_dead_lanes(sphere):
    tris, tb, packed = _build(sphere, False)
    rays = _rays(sphere)
    active = (jnp.arange(rays.origin.shape[0]) % 3) != 0
    rec, _ = _check(tris, tb, packed, rays, active=active)
    assert not np.asarray(rec.hit)[::3].any()


def test_lane_any_hit(sphere):
    tris, tb, packed = _build(sphere, True)
    rays = _rays(sphere)
    rec, _ = lane_pallas.trace_rays_lane_pallas(
        tb, packed, rays, any_hit=True)
    ref = brute_force_trace(tris, rays)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))


def test_lane_small_window(sphere):
    tris, tb, packed = _build(sphere, True, lw=8)
    _check(tris, tb, packed, _rays(sphere))


def test_lane_budget_restart(soup):
    # Tiny budgets force EVERY packet through the force-drain + host
    # restart path (trace_rays_lane_restart); hits must still match
    # brute force exactly, and the final round must leave nothing
    # unfinished.
    tris, tb, packed = _build(soup, True)
    assert int(tb.num_treelets) > 1
    rays = _rays(soup)
    (t, tri), stats, want = lane_pallas.trace_rays_lane_restart(
        tb, packed, rays, budgets=(4, 8), raw=True)
    assert int(jnp.sum(want)) == 0
    ref = brute_force_trace(tris, rays)
    hit = np.asarray(tri) >= 0
    np.testing.assert_array_equal(hit, np.asarray(ref.hit))
    np.testing.assert_allclose(
        np.where(hit, np.asarray(t), 0.0),
        np.where(hit, np.asarray(ref.t), 0.0), rtol=1e-5)


def test_lane_budget_restart_dead_lanes(sphere):
    tris, tb, packed = _build(sphere, False)
    rays = _rays(sphere)
    active = (jnp.arange(rays.origin.shape[0]) % 3) != 0
    rec, _ = lane_pallas.trace_rays_lane_restart(
        tb, packed, rays, active=active, budgets=(4,))
    ref = brute_force_trace(tris, rays)
    rhit = np.asarray(ref.hit) & np.asarray(active)
    np.testing.assert_array_equal(np.asarray(rec.hit), rhit)


def test_lane_matches_walker_bounce(soup):
    # incoherent rays (random directions from scene interior) against the
    # NumPy walker: portals + deep stacks under divergence
    tris, tb, packed = _build(soup, True)
    rng = np.random.default_rng(11)
    n = 128
    ctr = (np.asarray(soup.aabb_min) + np.asarray(soup.aabb_max)) / 2
    ext = (np.asarray(soup.aabb_max) - np.asarray(soup.aabb_min))
    o = ctr + (rng.random((n, 3)) - 0.5) * ext * 0.5
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(origin=jnp.asarray(o, jnp.float32),
                direction=jnp.asarray(d, jnp.float32),
                tmin=jnp.zeros((n,), jnp.float32),
                tmax=jnp.full((n,), 1e30, jnp.float32))
    rec, _ = lane_pallas.trace_rays_lane_pallas(tb, packed, rays)
    wt, wtri = treelet.reference_walk(
        tb, o, d, np.zeros((n,)), np.full((n,), 1e30))
    np.testing.assert_array_equal(np.asarray(rec.hit), wtri >= 0)
    both = np.asarray(rec.hit) & (wtri >= 0)
    np.testing.assert_allclose(
        np.where(both, np.asarray(rec.t), 0.0),
        np.where(both, wt, 0.0), rtol=1e-4)


def test_lane_wave(soup):
    # Tiny budgets force several suspend/regroup/resume rounds through
    # trace_rays_lane_wave; the resumed traversal must match brute force
    # exactly (zero re-traversal => the same hits as a single launch).
    tris, tb, packed = _build(soup, True)
    assert int(tb.num_treelets) > 1
    rays = _rays(soup)
    rec, stats = lane_pallas.trace_rays_lane_wave(
        tb, packed, rays, budgets=(3, 5, 7))
    ref = brute_force_trace(tris, rays)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    both = np.asarray(rec.hit)
    np.testing.assert_allclose(
        np.where(both, np.asarray(rec.t), 0.0),
        np.where(both, np.asarray(ref.t), 0.0), rtol=1e-5)
    np.testing.assert_array_equal(
        np.where(both, np.asarray(rec.prim_id), 0),
        np.where(both, np.asarray(ref.prim_id), 0))
    # box-test totals across rounds stay in the single-launch ballpark
    # (resume does not re-pay the descent; allow scheduler slack)
    rec1, st1 = lane_pallas.trace_rays_lane_pallas(tb, packed, rays)
    assert int(np.sum(np.asarray(stats.box_tests))) <= int(
        1.2 * np.sum(np.asarray(st1.box_tests)) + 64)


def test_lane_wave_dead_lanes_anyhit(sphere):
    tris, tb, packed = _build(sphere, True)
    rays = _rays(sphere)
    active = (jnp.arange(rays.origin.shape[0]) % 3) != 0
    rec, _ = lane_pallas.trace_rays_lane_wave(
        tb, packed, rays, active=active, budgets=(4,))
    ref = brute_force_trace(tris, rays)
    rhit = np.asarray(ref.hit) & np.asarray(active)
    np.testing.assert_array_equal(np.asarray(rec.hit), rhit)
    rec2, _ = lane_pallas.trace_rays_lane_wave(
        tb, packed, rays, active=active, budgets=(4,), any_hit=True)
    np.testing.assert_array_equal(np.asarray(rec2.hit), rhit)


def test_lane_phase(soup):
    # Treelet-major no-switch rounds (trace_rays_lane_phase): with more
    # than one treelet the drains + regroups + final switching round
    # must compose to exactly the brute-force hit set.
    tris, tb, packed = _build(soup, True)
    assert int(tb.num_treelets) > 1
    rays = _rays(soup)
    rec, stats = lane_pallas.trace_rays_lane_phase(
        tb, packed, rays, phases=3)
    ref = brute_force_trace(tris, rays)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    both = np.asarray(rec.hit)
    np.testing.assert_allclose(
        np.where(both, np.asarray(rec.t), 0.0),
        np.where(both, np.asarray(ref.t), 0.0), rtol=1e-5)
    np.testing.assert_array_equal(
        np.where(both, np.asarray(rec.prim_id), 0),
        np.where(both, np.asarray(ref.prim_id), 0))
    # resume never re-pays the descent: box tests stay in the
    # single-launch ballpark (scheduler slack allowed)
    rec1, st1 = lane_pallas.trace_rays_lane_pallas(tb, packed, rays)
    assert int(np.sum(np.asarray(stats.box_tests))) <= int(
        1.2 * np.sum(np.asarray(st1.box_tests)) + 64)


def test_lane_phase_dead_lanes_anyhit(sphere):
    # phase driver with dead lanes + any-hit mode (the shadow regime)
    tris, tb, packed = _build(sphere, True)
    rays = _rays(sphere)
    num = rays.origin.shape[0]
    active = (jnp.arange(num) % 3) != 0
    rec, _ = lane_pallas.trace_rays_lane_phase(
        tb, packed, rays, active=active, any_hit=True, phases=2)
    ref = brute_force_trace(tris, rays)
    np.testing.assert_array_equal(
        np.asarray(rec.hit), np.asarray(ref.hit) & np.asarray(active))
