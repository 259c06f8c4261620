"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding tests exercise the real
pjit/shard_map code paths over 8 virtual CPU devices instead.
"""

import os

# Test batches are 128 rays; pin the split kernel's packet size to match
# (the perf default is 256).
os.environ.setdefault("TPURT_SPLIT_K", "128")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# Force CPU with 8 virtual devices. The session's sitecustomize imports jax
# at interpreter start (latching JAX_PLATFORMS=<tpu tunnel> from the env), so
# env tweaks here are too late — override via jax.config before any backend
# initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("TPURT_TEST_PLATFORM", "cpu"))
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from tpu_raytracing.scene import procedural  # noqa: E402

# Fast tier: one representative test per subsystem, `pytest -m quick`
# (~2.5 min CPU, vs >10 min full) for iteration; the full suite remains
# the gate. The cost is almost entirely one-time jit compiles.
_QUICK = {
    "test_ops.py::test_morton_orders_axes",
    "test_ops.py::test_slab_hit_and_miss",
    "test_ops.py::test_moller_trumbore_basic",
    "test_lbvh.py::test_hierarchy_is_valid_tree[64]",
    "test_lbvh.py::test_pairing_shared_edge_detection",
    "test_bucket.py::test_bucket_cornell_matches_brute",
    "test_split_pallas.py::test_split_pallas_cornell",
    "test_sah.py::test_sah_valid_tree_and_coverage[33]",
    "test_hybrid_splits.py::test_splits_with_pairs",
    "test_implicit.py::test_implicit_valid_tree[33]",
    "test_scene.py::test_obj_fan_triangulation_and_negative_indices",
    "test_scene.py::test_camera_init_frames_scene",
    "test_shade.py::test_hsv_to_rgb_primaries",
    "test_traverse.py::test_cornell_matches_brute_force",
    "test_wide.py::test_wide_trace_tiny_scene",
    "test_packet.py::test_tile_permutation_roundtrip",
    "test_phased.py::test_phased_matches_single_phase",
    "test_tlas.py::test_instance_world_aabbs",
    "test_render.py::test_depth_mode_range",
    "test_pipeline.py::test_path_trace_produces_radiance",
    "test_native_loader.py::test_native_matches_python",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: fast one-per-subsystem subset (<60s CPU)")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules: with the whole
    suite in one process, XLA's CPU compiler segfaults after ~70 tests'
    worth of accumulated programs (reproduced twice at the same spot,
    test_sah_hoststep; each module passes standalone). The persistent
    compilation cache keeps re-runs cheap."""
    yield
    jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = f"{item.path.name}::{item.name}"
        if rel in _QUICK:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def cornell():
    return procedural.cornell_box()


@pytest.fixture(scope="session")
def sphere():
    return procedural.sphere_scene(subdivisions=3)


@pytest.fixture(scope="session")
def soup():
    return procedural.random_triangle_soup(2000, seed=1)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
