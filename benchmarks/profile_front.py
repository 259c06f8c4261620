"""DCE-proof stage timing INSIDE split_front at bench scale.

The round-4 honest rebuild number is ~545 ms one-jit at 1M; the old
stage attributions were DCE-contaminated (docs/TPU_NOTES.md round-4
measurement trap). Every stage here returns ALL arrays it claims to
build and fetches one value per output array group.

Stages (cumulative; per-stage cost = delta):
  1 pair assembly   — AABBs, pairing tests, codes/values/rows pre-sort
  2 + sort pass 1   — 9-payload stable sort
  3 + sort pass 2   — 8-payload stable sort + row concat
  4 full front      — split_front (adds leaf lo/hi + live zeroing)
  5 + emit          — emit_split (classification + scatter), full outs
  6 + views         — prep_split_views (pads/transposes), full outs
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch_all(out):
    for leaf in jax.tree.leaves(out):
        float(jnp.sum(jnp.ravel(leaf)[:2].astype(jnp.float32)))


def timed(name, fn, tris, iters=3):
    f = jax.jit(fn)
    fetch_all(f(tris))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = f(tris + (i + 1) * 1e-5)
    fetch_all(out)
    ms = (time.perf_counter() - t0) / iters * 1000.0
    log(f"{name}: {ms:.0f} ms (cumulative)")
    return ms


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    from tpu_raytracing.bvh import bucket, lbvh
    from tpu_raytracing.bvh.lbvh import scene_aabb
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace import split_pallas as sp

    scene = procedural.terrain(num_tris)
    tris = jnp.asarray(scene.triangles)
    log(f"device={jax.devices()[0]}, {num_tris} tris, lw={sp.LEAFW}")

    import numpy as np  # noqa: F401

    def assembly(t):
        amin, amax = scene_aabb(t)
        return lbvh._pair_assembly(t, amin, amax, True)

    def sort1(t):
        codes, values, rows = assembly(t)
        cols = [rows[:, i] for i in range(16)]
        s1 = jax.lax.sort([codes] + cols[:9], num_keys=1, is_stable=True)
        return s1, values, rows

    def sort2(t):
        codes, values, rows = assembly(t)
        cols = [rows[:, i] for i in range(16)]
        s1 = jax.lax.sort([codes] + cols[:9], num_keys=1, is_stable=True)
        s2 = jax.lax.sort([codes] + cols[9:] + [values], num_keys=1,
                          is_stable=True)
        srows = jnp.stack(list(s1[1:]) + list(s2[1:-1]), axis=1)
        return s1[0], srows, s2[-1]

    def front(t):
        return bucket.split_front(t, True)

    def emit(t):
        return bucket.emit_split(front(t), leaf_width=sp.LEAFW)

    def views(t):
        s, p = emit(t)
        return sp.prep_split_views(s, p), p

    prev = 0.0
    for name, fn in [("1 pair assembly", assembly),
                     ("2 + sort1", sort1),
                     ("3 + sort2+stack", sort2),
                     ("4 full front", front),
                     ("5 + emit", emit),
                     ("6 + views", views)]:
        ms = timed(name, fn, tris)
        log(f"   -> stage delta ~{max(ms - prev, 0):.0f} ms")
        prev = ms


if __name__ == "__main__":
    main()
