"""Stage-wise timing of build_bucket_split at bench scale."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, arg, iters=3):
    f = jax.jit(fn)
    out = f(arg)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(arg + (i + 1) * 1e-5)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    log(f"{name}: {(time.perf_counter()-t0)/iters*1000:.0f} ms")


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace import split_pallas as sp

    tris = jnp.asarray(procedural.terrain(num_tris).triangles)
    n = tris.shape[0]
    log(f"device={jax.devices()[0]}, {num_tris} tris")

    timed("A sorted_leaves (morton+sort+pairs)",
          lambda t: bucket._sorted_leaves(t, True)[1].rows, tris)

    def upto_tables(t):
        sc, packed, lo, hi, _c, nl = bucket._sorted_leaves(t, True)
        tabs = bucket._bucket_tables(sc, nl, n, bits=3)
        return tabs[3][-1]  # poss of last level

    timed("B + bucket tables (18 levels)", upto_tables, tris)

    def upto_aabbs(t):
        sc, packed, lo, hi, _c, nl = bucket._sorted_leaves(t, True)
        levels, caps, bids, poss, counts, cs, cc = bucket._bucket_tables(
            sc, nl, n, bits=3)
        alos, ahis = bucket._bucket_aabbs(
            levels, caps, poss, counts, cs, cc, lo, hi, n, width=8)
        return alos[0]

    timed("C + bucket AABB scans", upto_aabbs, tris)

    timed("D full build_bucket_split",
          lambda t: bucket.build_bucket_split(t, True, sp.LEAFW)[0].inner, tris)

    def full_with_views(t):
        s, p = bucket.build_bucket_split(t, True, sp.LEAFW)
        return sp.prep_split_views(s, p)[1]

    timed("E + prep_split_views", full_with_views, tris)


if __name__ == "__main__":
    main()
