"""refit_split: deform the pair rows, refresh the AABBs in place, and
the flagship kernel must still match brute force on the deformed scene
(topology unchanged, boxes exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import bucket
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.traverse import PackedPairs


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


def _deform_points(p):
    # squash + translate: affine, keeps degenerate sentinel rows degenerate
    return p * jnp.asarray([1.0, 0.7, 1.0]) + jnp.asarray([3.0, 1.0, -2.0])


def _deform_rows(rows):
    v = jax.lax.bitcast_convert_type(rows[:, :12], jnp.float32).reshape(
        -1, 4, 3)
    v = _deform_points(v).reshape(-1, 12)
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(v, jnp.int32), rows[:, 12:]], axis=1)


@pytest.mark.quick
@pytest.mark.parametrize("enable_pairs", [False, True])
def test_refit_matches_brute_on_deformed_scene(sp, enable_pairs):
    scene = procedural.sphere_scene(3)
    tris = jnp.asarray(scene.triangles)
    split, packed = jax.jit(
        lambda t: bucket.build_bucket_split(t, enable_pairs))(tris)
    assert split.e_ranges is not None

    packed2 = PackedPairs(rows=_deform_rows(packed.rows))
    split2 = jax.jit(bucket.refit_split)(split, packed2)
    # tree unchanged, boxes refreshed
    np.testing.assert_array_equal(
        np.asarray(split2.inner.reshape(-1, 8)[:, 6]),
        np.asarray(split.inner.reshape(-1, 8)[:, 6]))

    tris2 = _deform_points(tris)
    host_cam = cam.initialise_camera(
        jnp.min(tris2.reshape(-1, 3), axis=0),
        jnp.max(tris2.reshape(-1, 3), axis=0))
    camera = cam.camera_to_device(cam.update_camera(host_cam))
    rays = generate_primary_rays(camera, 16, 8)
    views = sp.prep_split_views(split2, packed2)
    rec, _ = sp.trace_rays_split_pallas(views, packed2, rays)
    ref = brute_force_trace(tris2, rays)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    both = np.asarray(rec.hit) & np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.where(both, np.asarray(rec.t), 0.0),
        np.where(both, np.asarray(ref.t), 0.0), rtol=1e-4, atol=1e-4)


@pytest.mark.quick
def test_refit_sah_converter_tree(sp):
    """The SAH converter now emits e_ranges: refit an SAH split tree and
    the kernel must match brute force on the deformed scene."""
    from tpu_raytracing.bvh.split_convert import build_sah_split

    scene = procedural.sphere_scene(3)
    tris = jnp.asarray(scene.triangles)
    split, packed = jax.jit(
        lambda t: build_sah_split(t, enable_pairs=True, leaf_width=16))(tris)
    assert split.e_ranges is not None

    packed2 = PackedPairs(rows=_deform_rows(packed.rows))
    split2 = jax.jit(bucket.refit_split)(split, packed2)
    np.testing.assert_array_equal(
        np.asarray(split2.inner.reshape(-1, 8)[:, 6]),
        np.asarray(split.inner.reshape(-1, 8)[:, 6]))

    tris2 = _deform_points(tris)
    host_cam = cam.initialise_camera(
        jnp.min(tris2.reshape(-1, 3), axis=0),
        jnp.max(tris2.reshape(-1, 3), axis=0))
    camera = cam.camera_to_device(cam.update_camera(host_cam))
    rays = generate_primary_rays(camera, 16, 8)
    views = sp.prep_split_views(split2, packed2)
    rec, _ = sp.trace_rays_split_pallas(views, packed2, rays, leafw=16)
    ref = brute_force_trace(tris2, rays)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    both = np.asarray(rec.hit) & np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.where(both, np.asarray(rec.t), 0.0),
        np.where(both, np.asarray(ref.t), 0.0), rtol=1e-4, atol=1e-4)
