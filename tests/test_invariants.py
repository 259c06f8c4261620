"""Debug-mode in-build invariant checks (bvh/invariants.py) — the XLA
equivalent of the reference's CheckTask / bin-range / plane-valid
diagnostics (src/SharedTaskBuilder.cu:169-195, 224-235, 329-347)."""

import jax.numpy as jnp
import pytest
from jax.experimental import checkify

from tpu_raytracing.bvh import invariants
from tpu_raytracing.bvh.bucket import build_bucket_split
from tpu_raytracing.bvh.sah import build_sah
from tpu_raytracing.scene import procedural


def test_plumbing_catches_a_violation():
    def bad(x):
        invariants.check(jnp.all(x > 0), "x must be positive")
        return x * 2

    with pytest.raises(checkify.JaxRuntimeError, match="x must be positive"):
        invariants.run_checked(bad, jnp.array([1.0, -1.0]))
    # and passes clean inputs
    out = invariants.run_checked(bad, jnp.array([1.0, 2.0]))
    assert out.tolist() == [2.0, 4.0]


def test_check_is_noop_outside_run_checked():
    # Calling the builder normally must not require a checkify wrapper.
    tris = jnp.asarray(procedural.cornell_box().triangles)
    build_sah(tris, False)  # would raise if checks leaked


@pytest.mark.quick
def test_sah_build_passes_invariants(sphere):
    tris = jnp.asarray(sphere.triangles)
    bvh, pairs = invariants.run_checked(build_sah, tris, enable_pairs=False,
                                       enable_splits=False)
    assert int(bvh.node_min.shape[0]) > 0


def test_sah_build_paired_passes_invariants(soup):
    tris = jnp.asarray(soup.triangles)
    invariants.run_checked(build_sah, tris, enable_pairs=True)


def test_bucket_build_passes_invariants(sphere):
    tris = jnp.asarray(sphere.triangles)
    split, packed = invariants.run_checked(
        build_bucket_split, tris, enable_pairs=True, leaf_width=16)
    assert int(split.num_inner) >= 1
