"""Quality-guarded refit schedule (bvh/refit_schedule.py): refit frames
stay refits, deformation that inflates entry SA triggers a rebuild (with
the documented one-frame monitor lag), and the periodic cap works."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh import bucket
from tpu_raytracing.bvh.refit_schedule import GuardedRefit, entry_surface_area
from tpu_raytracing.scene import procedural


def _rebuild(tris):
    return jax.jit(lambda t: bucket.build_bucket_split(t, leaf_width=16))(tris)


def _explode(rows0, scale):
    """Translate each pair by a large pair-dependent offset: topology-
    preserving refit then inflates every ancestor entry box."""
    v = jax.lax.bitcast_convert_type(rows0[:, :12], jnp.float32)
    off = jnp.arange(rows0.shape[0], dtype=jnp.float32)[:, None] % 7.0
    v = v + off * scale
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(v, jnp.int32), rows0[:, 12:]], axis=1)


@pytest.fixture(scope="module")
def tris(sphere):
    return jnp.asarray(sphere.triangles)


def test_guard_keeps_refitting_when_stable(tris):
    sched = GuardedRefit(_rebuild, quality_bound=1.3)
    _, _, r0 = sched.step(tris, None)
    assert r0  # first frame builds
    for _ in range(4):
        _, _, rebuilt = sched.step(tris, sched.rows0)  # identity deform
        assert not rebuilt
    assert sched.rebuild_count == 1


def test_guard_trips_on_inflation(tris):
    sched = GuardedRefit(_rebuild, quality_bound=1.3)
    sched.step(tris, None)
    sa0 = float(entry_surface_area(sched.split0.inner))
    # Frame 1: exploded geometry — refit succeeds (monitor lags a frame)
    split_t, _, rebuilt = sched.step(tris, _explode(sched.rows0, 10.0))
    assert not rebuilt
    assert float(entry_surface_area(split_t.inner)) > 1.3 * sa0
    # Frame 2: the lagged monitor now trips and a full rebuild runs
    _, _, rebuilt = sched.step(tris, sched.rows0)
    assert rebuilt
    assert sched.rebuild_count == 2
    # SA baseline reset: stable frames refit again
    _, _, rebuilt = sched.step(tris, sched.rows0)
    assert not rebuilt


def test_periodic_cap(tris):
    sched = GuardedRefit(_rebuild, quality_bound=0.0, max_interval=2)
    sched.step(tris, None)
    flags = [sched.step(tris, sched.rows0)[2] for _ in range(6)]
    # interval=2: two refits, then the cap forces a rebuild
    assert flags == [False, False, True, False, False, True]


def test_seed_adopts_external_build(tris):
    split, packed = _rebuild(tris)
    sched = GuardedRefit(_rebuild)
    sched.seed(split, packed)
    _, _, rebuilt = sched.step(tris, sched.rows0)
    assert not rebuilt  # seeded: first animated frame refits
    np.testing.assert_array_equal(
        np.asarray(sched.rows0), np.asarray(packed.rows))
