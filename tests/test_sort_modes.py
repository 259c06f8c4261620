"""Tracer-factory sort modes (origin / cell_octant): the sort + restore
plumbing must be invisible to consumers — same hits as brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import bucket
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.ray import Rays


@pytest.fixture(scope="module")
def sp():
    from tpu_raytracing.trace import split_pallas as sp_mod

    if jax.devices()[0].platform != "tpu":
        import functools

        from jax.experimental import pallas as pl

        orig = pl.pallas_call
        pl.pallas_call = functools.partial(orig, interpret=True)
        yield sp_mod
        pl.pallas_call = orig
    else:
        yield sp_mod


def _scatter_rays(scene, num):
    key = jax.random.PRNGKey(11)
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


@pytest.mark.parametrize("any_hit", [True, False])
def test_origin_sort_mode_matches_brute(sp, any_hit):
    scene = procedural.sphere_scene(3)
    tris = jnp.asarray(scene.triangles)
    split, packed = jax.jit(
        lambda t: bucket.build_bucket_split(t, True))(tris)
    views = sp.prep_split_views(split, packed)
    rays = _scatter_rays(scene, 128)
    tracer = sp.make_split_pallas_tracer(views, packed, 16, 8,
                                         any_hit=any_hit,
                                         sort_mode="origin")
    act = (jnp.arange(128) % 4) != 0
    rec, _ = tracer(None, None, rays, active=act)
    ref = brute_force_trace(tris, rays)
    np.testing.assert_array_equal(
        np.asarray(rec.hit), np.asarray(ref.hit) & np.asarray(act))
    if not any_hit:
        both = np.asarray(rec.hit)
        np.testing.assert_allclose(
            np.where(both, np.asarray(rec.t), 0.0),
            np.where(both, np.asarray(ref.t), 0.0), rtol=1e-5, atol=1e-5)
