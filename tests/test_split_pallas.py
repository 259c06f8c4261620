"""Split-BVH Pallas kernel (v2): brute-force equivalence + edge cases.

Off-TPU the kernel runs in the Pallas interpreter (slow, semantically
faithful), so scenes are small.
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


def _trace(sp_mod, scene, enable_pairs, res=(16, 8), active=None):
    camera = cam.camera_to_device(
        cam.update_camera(cam.initialise_camera(scene.aabb_min, scene.aabb_max))
    )
    tris = jnp.asarray(scene.triangles)
    split, packed = jax.jit(
        lambda t: bucket.build_bucket_split(t, enable_pairs)
    )(tris)
    views = sp_mod.prep_split_views(split, packed)
    rays = generate_primary_rays(camera, res[0], res[1])
    rec, _ = sp_mod.trace_rays_split_pallas(views, packed, rays, active=active)
    ref = brute_force_trace(tris, rays)
    return rec, ref


def _assert_matches(rec, ref):
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    both = np.asarray(rec.hit) & np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.where(both, np.asarray(rec.t), 0.0),
        np.where(both, np.asarray(ref.t), 0.0),
        rtol=1e-5,
    )
    np.testing.assert_array_equal(
        np.where(both, np.asarray(rec.prim_id), 0),
        np.where(both, np.asarray(ref.prim_id), 0),
    )


def test_split_pallas_sphere(sphere, sp):
    rec, ref = _trace(sp, sphere, False)
    _assert_matches(rec, ref)


def test_split_pallas_sphere_pairs(sphere, sp):
    rec, ref = _trace(sp, sphere, True)
    _assert_matches(rec, ref)


def test_split_pallas_cornell(cornell, sp):
    rec, ref = _trace(sp, cornell, True)
    _assert_matches(rec, ref)


def test_split_pallas_soup(soup, sp):
    rec, ref = _trace(sp, soup, False)
    _assert_matches(rec, ref)


def test_split_pallas_active_mask(cornell, sp):
    active = (jnp.arange(128) % 2) == 0
    rec, ref = _trace(sp, cornell, False, active=active)
    hit = np.asarray(rec.hit)
    assert not hit[1::2].any()
    assert hit[0::2].any()


def test_split_pallas_multi_packet(sphere, sp):
    """More packets than slots exercises the refill path (C=4 < 8 packets)."""
    rec, ref = _trace(sp, sphere, False, res=(32, 32))
    _assert_matches(rec, ref)


def test_split_pallas_duplicate_centroids(sp):
    """Identical Morton codes: chunk levels + window clamping."""
    rng = np.random.default_rng(0)
    num = 100
    offs = rng.normal(size=(num, 3, 3)).astype(np.float32) * 1e-7
    base = np.array(
        [[0.0, 0.0, 0.0], [1e-6, 0.0, 0.0], [0.0, 1e-6, 0.0]], np.float32
    )
    tris = jnp.asarray(base[None] + offs + np.array([5.0, 5.0, 5.0], np.float32))
    big = jnp.asarray([[[0, 0, 0], [10, 0, 0], [0, 10, 0]]], jnp.float32)
    tris = jnp.concatenate([tris, big], axis=0)
    split, packed = jax.jit(bucket.build_bucket_split)(tris)
    views = sp.prep_split_views(split, packed)
    rays = Rays(
        origin=jnp.asarray([[5.0, 5.0, 9.0]] * 128, jnp.float32),
        direction=jnp.asarray([[0.0, 0.0, -1.0]] * 128, jnp.float32),
        tmin=jnp.zeros((128,), jnp.float32),
        tmax=jnp.full((128,), 100.0, jnp.float32),
    )
    rec, _ = sp.trace_rays_split_pallas(views, packed, rays)
    ref = brute_force_trace(tris, rays)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(rec.t), np.asarray(ref.t), rtol=1e-4)


def test_split_pallas_tiny_scene(sp):
    """A scene small enough that the root itself is one terminal bucket."""
    tris = jnp.asarray(
        np.array(
            [
                [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                [[0, 0, 1], [1, 0, 1], [0, 1, 1]],
            ],
            np.float32,
        )
    )
    split, packed = jax.jit(bucket.build_bucket_split)(tris)
    views = sp.prep_split_views(split, packed)
    rays = Rays(
        origin=jnp.asarray([[0.2, 0.2, 5.0]] * 128, jnp.float32),
        direction=jnp.asarray([[0.0, 0.0, -1.0]] * 128, jnp.float32),
        tmin=jnp.zeros((128,), jnp.float32),
        tmax=jnp.full((128,), 100.0, jnp.float32),
    )
    rec, _ = sp.trace_rays_split_pallas(views, packed, rays)
    ref = brute_force_trace(tris, rays)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(
        np.asarray(rec.t)[np.asarray(ref.hit)],
        np.asarray(ref.t)[np.asarray(ref.hit)],
        rtol=1e-5,
    )


def test_split_pallas_width_variants(sphere, sp):
    """16-wide inner rows and 32-pair leaf windows vs brute force."""
    tris = jnp.asarray(sphere.triangles)
    camera = cam.camera_to_device(
        cam.update_camera(cam.initialise_camera(sphere.aabb_min, sphere.aabb_max))
    )
    rays = generate_primary_rays(camera, 16, 8)
    ref = brute_force_trace(tris, rays)
    for w, lw in [(16, 16), (16, 32), (8, 32)]:
        split, packed = jax.jit(
            lambda t: bucket.build_bucket_split(t, inner_width=w, leaf_width=lw)
        )(tris)
        views = sp.prep_split_views(split, packed)
        rec, _ = sp.trace_rays_split_pallas(views, packed, rays, leafw=lw)
        _assert_matches(rec, ref)


def test_split_pallas_any_hit(sphere, sp):
    """Occlusion mode: .hit matches closest-hit's .hit exactly."""
    camera = cam.camera_to_device(
        cam.update_camera(cam.initialise_camera(sphere.aabb_min, sphere.aabb_max))
    )
    tris = jnp.asarray(sphere.triangles)
    split, packed = jax.jit(bucket.build_bucket_split)(tris)
    views = sp.prep_split_views(split, packed)
    rays = generate_primary_rays(camera, 16, 8)
    active = (jnp.arange(128) % 3) != 0
    rec, _ = sp.trace_rays_split_pallas(
        views, packed, rays, active=active, any_hit=True
    )
    ref, _ = sp.trace_rays_split_pallas(views, packed, rays, active=active)
    np.testing.assert_array_equal(np.asarray(rec.hit), np.asarray(ref.hit))
    assert not np.asarray(rec.hit)[~np.asarray(active)].any()


def test_split_pallas_v4_matches_brute(sphere, cornell, soup, sp):
    """v4 (leaf-batched pops, the round-5 per-pop-control attack) must be
    hit-for-hit identical to brute force on every fixture scene — the
    batched LIFO leaf order may change WHICH pops run but not the closest
    hit (min over all tested windows)."""
    for scene, pairs in [(sphere, False), (cornell, True), (soup, False)]:
        camera = cam.camera_to_device(
            cam.update_camera(
                cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
        tris = jnp.asarray(scene.triangles)
        split, packed = jax.jit(
            lambda t, p=pairs: bucket.build_bucket_split(t, p))(tris)
        views = sp.prep_split_views(split, packed)
        rays = generate_primary_rays(camera, 16, 8)
        rec, _ = sp.trace_rays_split_pallas(views, packed, rays, kernel_v=4)
        _assert_matches(rec, brute_force_trace(tris, rays))


def test_split_pallas_v5_matches_brute(cornell, soup, sp):
    """v5 (B-batched pops over the scalar stack): batch members cannot
    prune each other, but the closest hit must still be exact."""
    for scene, pairs in [(cornell, True), (soup, False)]:
        camera = cam.camera_to_device(
            cam.update_camera(
                cam.initialise_camera(scene.aabb_min, scene.aabb_max)))
        tris = jnp.asarray(scene.triangles)
        split, packed = jax.jit(
            lambda t, p=pairs: bucket.build_bucket_split(t, p))(tris)
        views = sp.prep_split_views(split, packed)
        rays = generate_primary_rays(camera, 16, 8)
        rec, _ = sp.trace_rays_split_pallas(views, packed, rays, kernel_v=5)
        _assert_matches(rec, brute_force_trace(tris, rays))


def test_split_pallas_v4_refill_and_any_hit(sphere, sp):
    """v4 slot refill (more packets than slots) + occlusion early-finish:
    .hit must match the v3 kernel on the same rays."""
    camera = cam.camera_to_device(
        cam.update_camera(
            cam.initialise_camera(sphere.aabb_min, sphere.aabb_max)))
    tris = jnp.asarray(sphere.triangles)
    split, packed = jax.jit(bucket.build_bucket_split)(tris)
    views = sp.prep_split_views(split, packed)
    rays = generate_primary_rays(camera, 32, 32)  # 8 packets > C=4 slots
    rec4, _ = sp.trace_rays_split_pallas(views, packed, rays, kernel_v=4)
    _assert_matches(rec4, brute_force_trace(tris, rays))
    active = (jnp.arange(32 * 32) % 3) != 0
    occ4, _ = sp.trace_rays_split_pallas(
        views, packed, rays, active=active, any_hit=True, kernel_v=4)
    occ3, _ = sp.trace_rays_split_pallas(
        views, packed, rays, active=active, any_hit=True, kernel_v=3)
    np.testing.assert_array_equal(np.asarray(occ4.hit), np.asarray(occ3.hit))


def test_split_pallas_padded_resolution(cornell, sp):
    """Non-tiling resolutions run the flagship kernel via edge padding
    (VERDICT r2 weak #6: 1080p used to downgrade to the wide tracer).
    The padded tracer must match brute force on the live pixels and
    keep active-mask semantics through the pad/crop round trip."""
    tris = jnp.asarray(cornell.triangles)
    camera = cam.camera_to_device(
        cam.update_camera(
            cam.initialise_camera(cornell.aabb_min, cornell.aabb_max)))
    w, h = 24, 20  # 24 % 16 != 0 and 20 % 8 != 0: needs the pad path
    rays = generate_primary_rays(camera, w, h)
    split, packed = jax.jit(bucket.build_bucket_split)(tris)
    views = sp.prep_split_views(split, packed)
    tracer = sp.make_split_pallas_tracer(views, packed, w, h)
    rec, stats = tracer(None, None, rays)
    assert rec.hit.shape == (w * h,)
    assert stats.box_tests.shape == (w * h,)
    ref = brute_force_trace(tris, rays)
    _assert_matches(rec, ref)

    # active mask must also survive the pad/crop round trip
    act = (jnp.arange(w * h) % 2) == 0
    rec_a, _ = tracer(None, None, rays, active=act)
    assert not np.asarray(rec_a.hit)[~np.asarray(act)].any()
    np.testing.assert_array_equal(
        np.asarray(rec_a.hit)[np.asarray(act)],
        np.asarray(rec.hit)[np.asarray(act)])
