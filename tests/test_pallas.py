"""Pallas traversal kernel tests.

The kernel targets real TPU hardware; on the CPU test platform it runs in
the Pallas interpreter (slow but semantically faithful), so scenes here are
tiny.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import lbvh, wide
from tpu_raytracing.scene import camera as cam
from tpu_raytracing.scene import procedural
from tpu_raytracing.trace.ray import generate_primary_rays
from tpu_raytracing.trace.traverse import pack_bvh, pack_pairs, trace_rays


@pytest.fixture(scope="module")
def interp_pallas(monkeypatch=None):
    """Force interpreter mode off-TPU."""
    from tpu_raytracing.ops import pallas_traverse as pt

    if jax.devices()[0].platform != "tpu":
        import functools

        from jax.experimental import pallas as pl

        orig = pl.pallas_call
        pl.pallas_call = functools.partial(orig, interpret=True)
        yield pt
        pl.pallas_call = orig
    else:
        yield pt


def test_pallas_matches_scalar(cornell, interp_pallas):
    pt = interp_pallas
    tris = jnp.asarray(cornell.triangles)
    bvh, pairs = jax.jit(lbvh.build_lbvh)(tris)
    packed = pack_pairs(pairs)
    fat = jax.jit(wide.build_wide_fat)(bvh, packed.rows)
    rows256 = pt.pad_rows_256(fat.rows)
    camera = cam.camera_to_device(
        cam.initialise_camera(cornell.aabb_min, cornell.aabb_max)
    )
    rays = generate_primary_rays(camera, 16, 8)
    rec, _ = pt.trace_rays_pallas(rows256, rays)
    rec_s, _ = jax.jit(trace_rays)(pack_bvh(bvh), packed, rays)
    hit = np.asarray(rec.hit)
    np.testing.assert_array_equal(hit, np.asarray(rec_s.hit))
    np.testing.assert_allclose(
        np.asarray(rec.t)[hit], np.asarray(rec_s.t)[hit], rtol=1e-6
    )


def test_pallas_active_mask(cornell, interp_pallas):
    pt = interp_pallas
    tris = jnp.asarray(cornell.triangles)
    bvh, pairs = jax.jit(lbvh.build_lbvh)(tris)
    packed = pack_pairs(pairs)
    fat = jax.jit(wide.build_wide_fat)(bvh, packed.rows)
    rows256 = pt.pad_rows_256(fat.rows)
    camera = cam.camera_to_device(
        cam.initialise_camera(cornell.aabb_min, cornell.aabb_max)
    )
    rays = generate_primary_rays(camera, 16, 8)
    active = (jnp.arange(128) % 2) == 0
    rec, _ = pt.trace_rays_pallas(rows256, rays, active=active)
    hit = np.asarray(rec.hit)
    assert not hit[1::2].any()
    assert hit[0::2].any()
