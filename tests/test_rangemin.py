"""ops/rangemin.py: sparse range-min table vs brute force.

Covers both the fine-only path (n < 2^RANGE_K0) and the two-tier coarse
path (n > 2^RANGE_K0), including ranges that straddle block boundaries
and empty ranges.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracing.ops.rangemin import build_range_min, range_min_query

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("n", [7, 600, 1282, 5000])
def test_range_min_matches_bruteforce(n):
    rng = np.random.default_rng(n)
    vals = rng.standard_normal((n, 5)).astype(np.float32) * 100.0
    tbl = build_range_min(jnp.asarray(vals))

    starts = rng.integers(0, n, size=200).astype(np.int32)
    ends = np.minimum(starts + rng.integers(0, n, size=200), n).astype(
        np.int32)
    counts = (ends - starts).astype(np.int32)
    # include empty + full + single-element ranges explicitly
    starts = np.concatenate([starts, [0, 0, n - 1, 3 % n]]).astype(np.int32)
    counts = np.concatenate([counts, [n, 0, 1, 1]]).astype(np.int32)

    out = np.asarray(range_min_query(
        tbl, jnp.asarray(starts), jnp.asarray(counts)))
    for i, (s, c) in enumerate(zip(starts, counts)):
        if c <= 0:
            assert np.all(out[i] == np.float32(3.4028235e38)), (i, out[i])
        else:
            np.testing.assert_array_equal(out[i], vals[s:s + c].min(axis=0),
                                          err_msg=f"range [{s}, {s + c})")
