"""Seeded adversarial fuzz for the BVH tracers (the grid's twin lives
in test_grid.py): axis-plane quads on exact integer coordinates,
zero-area/collinear degenerate triangles, exactly axis-aligned ray
directions, lattice-point origins, and origins far outside the scene.
Every tracer must agree with the brute-force oracle on the hit set and
distances (prim ids are skipped: duplicate degenerate geometry can tie
at identical t with either winner valid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import bucket, lbvh
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.ray import Rays
from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs, trace_rays


def _adversarial_tris(n_rand, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-2.0, 2.0, (n_rand, 1, 3))
    tris_rand = centers + rng.uniform(-0.3, 0.3, (n_rand, 3, 3))
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
    degen = np.array([
        [[0.1, 0.1, 0.1], [0.1, 0.1, 0.1], [0.5, 0.5, 0.5]],
        [[-1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]],
    ], np.float32)
    return np.concatenate(
        [tris_rand, np.stack(quads), degen]).astype(np.float32)


def _adversarial_rays(num, seed=11):
    rng = np.random.default_rng(seed)
    n_axis = min(48, num // 4)
    n_lattice = min(32, num // 8)
    n_far = min(32, num // 8)
    orig = np.concatenate([
        rng.uniform(-2.5, 2.5, (num - n_lattice - n_far, 3)),
        np.round(rng.uniform(-2, 2, (n_lattice, 3))),
        rng.uniform(-8.0, -4.0, (n_far, 3)),
    ]).astype(np.float32)
    dirs = rng.normal(size=(num, 3)).astype(np.float32)
    axes = np.zeros((n_axis, 3), np.float32)
    axes[np.arange(n_axis), np.arange(n_axis) % 3] = np.where(
        np.arange(n_axis) % 2 == 0, 1.0, -1.0)
    dirs[:n_axis] = axes
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return Rays(origin=jnp.asarray(orig), direction=jnp.asarray(dirs),
                tmin=jnp.zeros((num,), jnp.float32),
                tmax=jnp.full((num,), 1e9, jnp.float32))


def _assert_hits_match(rec, ref):
    np.testing.assert_array_equal(np.asarray(rec.hit),
                                  np.asarray(ref.hit))
    hit = np.asarray(rec.hit)
    np.testing.assert_allclose(np.asarray(rec.t)[hit],
                               np.asarray(ref.t)[hit],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("enable_pairs", [False, True])
def test_fuzz_lbvh_traverse(enable_pairs):
    tris = jnp.asarray(_adversarial_tris(300))
    rays = _adversarial_rays(256)
    bvh, pairs = jax.jit(lbvh.build_lbvh, static_argnames="enable_pairs")(
        tris, enable_pairs=enable_pairs)
    rec, _ = jax.jit(trace_rays)(pack_bvh(bvh), pack_pairs(pairs), rays)
    ref = jax.jit(brute_force_trace)(tris, rays)
    _assert_hits_match(rec, ref)


def test_fuzz_split_pallas():
    # interpret mode off-TPU is slow: small geometry, one packet group
    from tpu_raytracing.trace import split_pallas as sp_mod

    if jax.devices()[0].platform != "tpu":
        import functools

        from jax.experimental import pallas as pl

        orig = pl.pallas_call
        pl.pallas_call = functools.partial(orig, interpret=True)
    else:
        orig = None
    try:
        tris = jnp.asarray(_adversarial_tris(60))
        rays = _adversarial_rays(128)
        split, packed = jax.jit(
            lambda t: bucket.build_bucket_split(t, True))(tris)
        views = sp_mod.prep_split_views(split, packed)
        rec, _ = sp_mod.trace_rays_split_pallas(views, packed, rays)
        ref = jax.jit(brute_force_trace)(tris, rays)
        _assert_hits_match(rec, ref)
    finally:
        if orig is not None:
            from jax.experimental import pallas as pl

            pl.pallas_call = orig
