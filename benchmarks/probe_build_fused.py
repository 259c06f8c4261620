"""End-to-end split-build timing (the bench's exact build closure)."""

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
    iters = int(os.environ.get("TPURT_BENCH_ITERS", 4))

    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace import split_pallas as sp

    scene = procedural.terrain(num_tris)
    triangles = jnp.asarray(scene.triangles)
    log(f"device={jax.devices()[0]}, {num_tris} tris")

    def full_build(tris):
        split, packed = bucket.build_bucket_split(
            tris, enable_pairs=True, leaf_width=sp.LEAFW)
        return sp.prep_split_views(split, packed), packed, split.num_inner

    f = jax.jit(full_build)
    views, packed, num_inner = f(triangles)
    bucket.check_inner_capacity(int(num_inner), num_tris, sp.LEAFW)
    float(jnp.sum(views[0][0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for i in range(iters):
        views, packed, _ = f(triangles + (i + 1) * 1e-5)
    float(jnp.sum(views[0][0]).astype(jnp.float32))
    ms = (time.perf_counter() - t0) / iters * 1000.0
    log(f"full split build: {ms:.1f} ms/frame")


if __name__ == "__main__":
    main()
