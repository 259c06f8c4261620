"""Two-tier range-min table == brute-force range AABBs for every count
class (fine-only, edge+coarse, whole-array)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.bvh.bucket import _RANGE_K0, _range_lookup, _range_min_table


@pytest.mark.quick
@pytest.mark.parametrize("n", [37, 1 << (_RANGE_K0 - 1), 5000])
def test_range_lookup_matches_bruteforce(n):
    rng = np.random.default_rng(n)
    lo = rng.normal(size=(n, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.01, 1.0, size=(n, 3)).astype(np.float32)

    tbl = _range_min_table(jnp.asarray(lo), jnp.asarray(hi))
    # coarse tier exists exactly when n needs more than K0 fine levels
    assert (tbl[1] is not None) == (int(np.floor(np.log2(n))) + 1 > _RANGE_K0)

    starts, counts = [], []
    for _ in range(200):
        s = int(rng.integers(0, n))
        c = int(rng.integers(1, n - s + 1))
        starts.append(s)
        counts.append(c)
    # pin the extremes: full array, single element, exact block multiples
    starts += [0, n - 1, 0]
    counts += [n, 1, n]
    if tbl[2]:
        b = tbl[2]
        starts += [1, b, b - 1]
        counts += [min(4 * b, n - 1), min(2 * b, n - b), min(2 * b + 2, n - b + 1)]

    e_lo, e_hi = _range_lookup(
        tbl, jnp.asarray(starts, jnp.int32), jnp.asarray(counts, jnp.int32))
    e_lo, e_hi = np.asarray(e_lo), np.asarray(e_hi)
    for i, (s, c) in enumerate(zip(starts, counts)):
        np.testing.assert_array_equal(e_lo[i], lo[s:s + c].min(axis=0))
        np.testing.assert_array_equal(e_hi[i], hi[s:s + c].max(axis=0))
