"""Host-stepped SAH frontier must produce the exact same tree as the
while_loop form (same per-level math, different loop driver)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh.split_convert import build_sah_split
from tpu_raytracing.scene import procedural


@pytest.mark.quick
@pytest.mark.parametrize("enable_pairs", [False, True])
def test_host_stepped_sah_matches_while_loop(enable_pairs):
    scene = procedural.sphere_scene(3)
    tris = jnp.asarray(scene.triangles)
    s1, p1 = jax.jit(lambda t: build_sah_split(
        t, enable_pairs=enable_pairs, leaf_width=16))(tris)
    s2, p2 = build_sah_split(
        tris, enable_pairs=enable_pairs, leaf_width=16, host_stepped=True)
    np.testing.assert_array_equal(np.asarray(s1.inner), np.asarray(s2.inner))
    np.testing.assert_array_equal(np.asarray(p1.rows), np.asarray(p2.rows))
    assert int(s1.num_inner) == int(s2.num_inner)
    assert int(s1.num_leaves) == int(s2.num_leaves)


@pytest.mark.parametrize("enable_splits", [False, True])
def test_build_sah_host_stepped_matches_while_loop(enable_splits):
    """Whole-pipeline build_sah (grid decomposition + top stitch) in
    host-stepped mode must match the jitted while_loop form exactly."""
    from tpu_raytracing.bvh import sah

    scene = procedural.sphere_scene(3)
    tris = jnp.asarray(scene.triangles)
    b1, p1 = jax.jit(sah.build_sah, static_argnums=(1, 2))(
        tris, True, enable_splits)
    b2, p2 = sah.build_sah(tris, True, enable_splits, host_stepped=True)
    for f in ("node_min", "node_max", "child", "count", "type"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b1, f)), np.asarray(getattr(b2, f)), f)


def test_build_sah_auto_selects_by_size(monkeypatch):
    """The auto selector must route large scenes to the host-stepped
    frontier (the jitted path is minutes-slow at 1M,
    docs/TPU_NOTES.md 'SAH frontier at scale') and small ones to the
    fused jit — same tree either way."""
    from tpu_raytracing.bvh import sah

    scene = procedural.sphere_scene(3)
    tris = jnp.asarray(scene.triangles)
    calls = []
    real = sah.build_sah

    def spy(t, ep=False, es=False, host_stepped=False):
        calls.append(host_stepped)
        return real(t, ep, es, host_stepped=host_stepped)

    monkeypatch.setattr(sah, "build_sah", spy)
    monkeypatch.setattr(sah, "SAH_HOST_STEP_THRESHOLD", tris.shape[0])
    b1, _ = sah.build_sah_auto(tris, True, False)  # at threshold: host
    assert calls == [True]
    monkeypatch.setattr(sah, "SAH_HOST_STEP_THRESHOLD",
                        tris.shape[0] + 1)
    b2, _ = sah.build_sah_auto(tris, True, False)  # below: fused jit
    assert calls == [True]  # jitted branch bypasses the spy
    np.testing.assert_array_equal(np.asarray(b1.child), np.asarray(b2.child))
