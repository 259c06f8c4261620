"""Intersection and Morton op tests against straightforward oracles."""

import jax.numpy as jnp
import numpy as np

from tpu_raytracing.ops.intersect import (
    aabb_surface_area,
    intersect_ray_aabb,
    intersect_ray_triangle,
)
from tpu_raytracing.ops.morton import expand_bits, morton3d


def _expand_bits_ref(v: int) -> int:
    out = 0
    for i in range(10):
        out |= ((v >> i) & 1) << (3 * i)
    return out


def test_expand_bits_matches_bit_oracle():
    vals = np.array([0, 1, 2, 3, 5, 123, 512, 1023], np.uint32)
    got = np.asarray(expand_bits(jnp.asarray(vals)))
    want = np.array([_expand_bits_ref(int(v)) for v in vals], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_morton_orders_axes():
    # x is the most significant axis: xx*4 + yy*2 + zz.
    pts = jnp.array([[0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.1, 0.1, 0.9]])
    codes = np.asarray(morton3d(pts))
    assert codes[0] > codes[1] > codes[2]


def test_morton_clamps_to_unit_cube():
    codes = np.asarray(morton3d(jnp.array([[-1.0, 2.0, 0.5], [0.0, 1.0, 0.5]])))
    want = np.asarray(morton3d(jnp.array([[0.0, 1.0, 0.5], [0.0, 1.0, 0.5]])))
    np.testing.assert_array_equal(codes, want)


def test_slab_hit_and_miss():
    origin = jnp.array([[0.0, 0.0, -5.0]] * 3)
    direction = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, -1.0]])
    bmin = jnp.array([[-1.0, -1.0, -1.0]] * 3)
    bmax = jnp.array([[1.0, 1.0, 1.0]] * 3)
    tmin = jnp.zeros(3)
    tmax = jnp.full(3, 100.0)
    hit, front = intersect_ray_aabb(bmin, bmax, origin, direction, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(hit), [True, False, False])
    assert np.isclose(float(front[0]), 4.0)


def test_slab_ray_origin_inside():
    hit, front = intersect_ray_aabb(
        jnp.array([-1.0, -1.0, -1.0]),
        jnp.array([1.0, 1.0, 1.0]),
        jnp.zeros(3),
        jnp.array([0.0, 0.0, 1.0]),
        jnp.float32(0.0),
        jnp.float32(100.0),
    )
    assert bool(hit)
    assert float(front) < 0.0  # entry behind origin, matching reference distance


def test_slab_axis_aligned_zero_direction_component():
    # direction.y == 0 -> infs in the slab test must behave as in CUDA.
    hit, _ = intersect_ray_aabb(
        jnp.array([-1.0, 2.0, -1.0]),
        jnp.array([1.0, 3.0, 1.0]),
        jnp.zeros(3),
        jnp.array([0.0, 0.0, 1.0]),
        jnp.float32(0.0),
        jnp.float32(100.0),
    )
    assert not bool(hit)


def test_moller_trumbore_basic():
    v0 = jnp.array([-1.0, -1.0, 5.0])
    v1 = jnp.array([1.0, -1.0, 5.0])
    v2 = jnp.array([0.0, 1.0, 5.0])
    accept, t, u, v = intersect_ray_triangle(
        v0, v1, v2, jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]), 0.0, 100.0
    )
    assert bool(accept)
    assert np.isclose(float(t), 5.0)
    # Interpolated hit point matches the ray/plane intersection.
    p = np.asarray(v0) * (1 - float(u) - float(v)) + np.asarray(v1) * float(u) + np.asarray(
        v2
    ) * float(v)
    np.testing.assert_allclose(p, [0, 0, 5], atol=1e-6)


def test_moller_trumbore_rejects_degenerate_and_range():
    v0 = jnp.array([0.0, 0.0, 5.0])
    accept, *_ = intersect_ray_triangle(
        v0, v0, v0, jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]), 0.0, 100.0
    )
    assert not bool(accept)
    # Beyond tmax.
    accept, *_ = intersect_ray_triangle(
        jnp.array([-1.0, -1.0, 5.0]),
        jnp.array([1.0, -1.0, 5.0]),
        jnp.array([0.0, 1.0, 5.0]),
        jnp.zeros(3),
        jnp.array([0.0, 0.0, 1.0]),
        0.0,
        4.0,
    )
    assert not bool(accept)


def test_moller_trumbore_accepts_t_equal_tmax():
    accept, *_ = intersect_ray_triangle(
        jnp.array([-1.0, -1.0, 5.0]),
        jnp.array([1.0, -1.0, 5.0]),
        jnp.array([0.0, 1.0, 5.0]),
        jnp.zeros(3),
        jnp.array([0.0, 0.0, 1.0]),
        0.0,
        5.0,
    )
    assert bool(accept)  # reference accepts t == tmax (overwrite semantics)


def test_surface_area():
    sa = aabb_surface_area(jnp.zeros(3), jnp.array([1.0, 2.0, 3.0]))
    assert np.isclose(float(sa), 2 * (1 * 2 + 1 * 3 + 2 * 3))
