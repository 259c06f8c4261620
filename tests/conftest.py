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
