"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding tests exercise the real
pjit/shard_map code paths over 8 virtual CPU devices instead.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the real TPU
# tunnel, which is slow and single-device; tests want the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = os.environ.get("TPURT_TEST_PLATFORM", "cpu")
# Persistent compile cache: the suite is compile-bound, not run-bound.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from tpu_raytracing.scene import procedural  # noqa: E402


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
