"""Treelet-binned tracer (trace/binned.py): brute-force equivalence for
coherent and scattered rays, any-hit mode, and the capacity contract.

Off-TPU the split kernel runs in the Pallas interpreter, so scenes and
ray counts stay small.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import bucket
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.ray import Rays, generate_primary_rays


@pytest.fixture(scope="module")
def binned():
    from tpu_raytracing.trace import binned as mod

    if jax.devices()[0].platform != "tpu":
        import functools

        from jax.experimental import pallas as pl

        orig = pl.pallas_call
        pl.pallas_call = functools.partial(orig, interpret=True)
        yield mod
        pl.pallas_call = orig
    else:
        yield mod


def _build(scene, enable_pairs=False):
    from tpu_raytracing.trace import split_pallas as sp

    tris = jnp.asarray(scene.triangles)
    split, packed = jax.jit(
        lambda t: bucket.build_bucket_split(t, enable_pairs)
    )(tris)
    return sp.prep_split_views(split, packed), packed, tris


def _scatter_rays(scene, num):
    """Random origins above the geometry, random directions — the
    incoherent case binning exists for."""
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    lo, hi = scene.aabb_min, scene.aabb_max
    span = hi - lo
    o = lo + jax.random.uniform(k1, (num, 3)) * span * jnp.asarray(
        [1.0, 1.6, 1.0])
    d = jax.random.normal(k2, (num, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    far = float(jnp.max(span)) * 4.0
    return Rays(
        origin=o.astype(jnp.float32),
        direction=d.astype(jnp.float32),
        tmin=jnp.zeros((num,), jnp.float32),
        tmax=jnp.full((num,), far, jnp.float32),
    )


def _assert_matches(rec, ref):
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    both = np.asarray(rec.hit) & np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.where(both, np.asarray(rec.t), 0.0),
        np.where(both, np.asarray(ref.t), 0.0),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.quick
def test_binned_primary_matches_brute(binned):
    scene = procedural.sphere_scene(3)
    views, packed, tris = _build(scene)
    camera = cam.camera_to_device(
        cam.update_camera(
            cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
    rays = generate_primary_rays(camera, 16, 8)
    rec, _ = binned.trace_rays_binned(views, packed, rays)
    ref = brute_force_trace(tris, rays)
    _assert_matches(rec, ref)


def test_binned_scattered_matches_brute(binned):
    scene = procedural.sphere_scene(3)
    views, packed, tris = _build(scene)
    rays = _scatter_rays(scene, 128)
    rec, stats, needed = binned.trace_rays_binned(
        views, packed, rays, return_needed=True)
    assert int(needed) <= 2 * 128 + 8 * 128  # inside the default cap
    ref = brute_force_trace(tris, rays)
    _assert_matches(rec, ref)
    # per-ray counters populated (packet-union granularity)
    assert int(jnp.sum(stats.box_tests)) > 0


def test_binned_pairs_and_active_mask(binned):
    scene = procedural.sphere_scene(3)
    views, packed, tris = _build(scene, enable_pairs=True)
    rays = _scatter_rays(scene, 128)
    act = (jnp.arange(128) % 3) != 0
    rec, _ = binned.trace_rays_binned(views, packed, rays, active=act)
    ref = brute_force_trace(tris, rays)
    hit = np.asarray(rec.hit)
    np.testing.assert_array_equal(hit, np.asarray(ref.hit) & np.asarray(act))
    both = hit & np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.where(both, np.asarray(rec.t), 0.0),
        np.where(both, np.asarray(ref.t), 0.0),
        rtol=1e-5, atol=1e-5,
    )


def test_binned_any_hit(binned):
    scene = procedural.sphere_scene(3)
    views, packed, tris = _build(scene)
    rays = _scatter_rays(scene, 128)
    rec, _ = binned.trace_rays_binned(views, packed, rays, any_hit=True)
    ref = brute_force_trace(tris, rays)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
