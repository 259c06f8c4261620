"""Axis-aligned rays (zero direction components) vs brute force.

Round-4 regression: every XLA-min/max slab test that divided by the raw
direction produced 0*inf = NaN for axis-aligned rays, and XLA's min/max
PROPAGATE NaN (CUDA's fminf/fmaxf, which the reference relies on,
ignore it — src/Tracer.cu:187-200) — so straight-down rays silently
pruned real subtrees in every tracer that had not adopted the
safe-inverse pattern. The fuzz suite never generates exact zeros, so
this pins the case explicitly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.scene import procedural
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.ray import Rays


def _down_rays(scene, n_side=16):  # 256 rays: divisible by packet sizes
    lo, hi = scene.aabb_min, scene.aabb_max
    gx = jnp.linspace(float(lo[0]) + 1e-3, float(hi[0]) - 1e-3, n_side)
    gz = jnp.linspace(float(lo[2]) + 1e-3, float(hi[2]) - 1e-3, n_side)
    xx, zz = jnp.meshgrid(gx, gz)
    n = n_side * n_side
    o = jnp.stack([xx.reshape(-1),
                   jnp.full((n,), float(hi[1]) + 1.0),
                   zz.reshape(-1)], axis=1)
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))
    return Rays(origin=o, direction=d,
                tmin=jnp.zeros((n,), jnp.float32),
                tmax=jnp.full((n,), 1e6, jnp.float32))


def _check(rec, ref):
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    both = np.asarray(rec.hit)
    np.testing.assert_allclose(
        np.where(both, np.asarray(rec.t), 0.0),
        np.where(both, np.asarray(ref.t), 0.0), rtol=1e-5)


@pytest.fixture(scope="module")
def setup():
    scene = procedural.sphere_scene(3)
    tris = jnp.asarray(scene.triangles)
    rays = _down_rays(scene)
    ref = brute_force_trace(tris, rays)
    assert int(jnp.sum(ref.hit)) > 8  # the case must be exercised
    return scene, tris, rays, ref


def test_axis_rays_bfs(setup):
    scene, tris, rays, ref = setup
    from tpu_raytracing.bvh.bucket import build_bucket_split
    from tpu_raytracing.trace.wavefront_bfs import (
        prep_bfs_views,
        trace_rays_bfs,
    )

    split, packed = jax.jit(functools.partial(
        build_bucket_split, enable_pairs=True, leaf_width=16))(tris)
    rec, _, overflow = trace_rays_bfs(
        prep_bfs_views(split, packed), packed, rays)
    assert not bool(overflow)
    _check(rec, ref)


def test_axis_rays_split_pallas(setup):
    scene, tris, rays, ref = setup
    from tpu_raytracing.bvh.bucket import build_bucket_split
    from tpu_raytracing.trace import split_pallas as sp

    split, packed = jax.jit(functools.partial(
        build_bucket_split, enable_pairs=True, leaf_width=sp.LEAFW))(tris)
    views = jax.jit(sp.prep_split_views)(split, packed)
    rec, _ = sp.trace_rays_split_pallas(views, packed, rays, k=128)
    _check(rec, ref)


def test_axis_rays_wide_fat(setup):
    scene, tris, rays, ref = setup
    from tpu_raytracing.bvh.bucket import build_bucket_fat
    from tpu_raytracing.trace.wide_fat import trace_rays_wide_fat

    wide, packed = jax.jit(functools.partial(
        build_bucket_fat, enable_pairs=True))(tris)
    rec, _ = trace_rays_wide_fat(wide, packed, rays)
    _check(rec, ref)


def test_axis_rays_scalar_slab():
    # the shared slab primitive itself: box face touching the ray origin
    from tpu_raytracing.ops.intersect import intersect_ray_aabb

    hit, front = intersect_ray_aabb(
        jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[1.0, 1.0, 1.0]]),
        jnp.asarray([[0.0, 2.0, 0.5]]),  # origin ON the x=0 face plane
        jnp.asarray([[0.0, -1.0, 0.0]]),
        jnp.asarray([0.0]), jnp.asarray([10.0]))
    assert bool(hit[0])
