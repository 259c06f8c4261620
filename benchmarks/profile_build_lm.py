"""A/B the bucket-major (v1) vs leaf-major split builders on real TPU."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    iters = int(os.environ.get("TPURT_BENCH_ITERS", 3))
    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace import split_pallas as sp

    scene = procedural.terrain(num_tris)
    triangles = jnp.asarray(scene.triangles)
    log(f"device={jax.devices()[0]}, {num_tris} tris, LEAFW={sp.LEAFW}")

    for name, fn in (("leaf-major", bucket.build_bucket_split),
                     ("v1 bucket-major", bucket.build_bucket_split_v1)):
        @jax.jit
        def build(tris, fn=fn):
            split, packed = fn(tris, enable_pairs=True, leaf_width=sp.LEAFW)
            return sp.prep_split_views(split, packed), packed, split.num_inner

        t0 = time.perf_counter()
        views, packed, ni = build(triangles)
        float(jnp.sum(views[0][0]).astype(jnp.float32))
        log(f"{name}: first call {time.perf_counter()-t0:.1f} s, "
            f"num_inner={int(ni)}")
        t0 = time.perf_counter()
        for i in range(iters):
            views, packed, ni = build(triangles + (i + 1) * 1e-5)
        float(jnp.sum(views[0][0]).astype(jnp.float32))
        log(f"{name}: {(time.perf_counter()-t0)/iters*1000:.0f} ms/build")


if __name__ == "__main__":
    main()
