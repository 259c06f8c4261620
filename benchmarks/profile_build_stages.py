"""Stage-wise timing of the leaf-major split build at 1M (mirrors the
stages of bvh/bucket.py:build_bucket_split; keep in sync when the builder
changes). Each stage jits the pipeline UP TO that point and fetches, so a
stage's cost = its cumulative time minus the previous stage's."""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, f, triangles, iters=3):
    out = f(triangles)
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(jnp.ravel(leaf)[:4].astype(jnp.float32)))
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(triangles + (i + 1) * 1e-5)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(jnp.ravel(leaf)[:4].astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / iters * 1000.0
    log(f"{name}: {ms:.0f} ms (cumulative)")


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace import split_pallas as sp

    leaf_width = sp.LEAFW
    width = 8
    bits = 3
    scene = procedural.terrain(num_tris)
    triangles = jnp.asarray(scene.triangles)
    n = num_tris
    log(f"device={jax.devices()[0]}, {num_tris} tris, lw={leaf_width}")

    def front(tris):
        return bucket._sorted_leaves(tris, True)

    def heads_of(sorted_codes, num_leaves):
        n = sorted_codes.shape[0]  # paired builds shrink the leaf axis
        iota = jnp.arange(n, dtype=jnp.int32)
        pad_boundary = iota == num_leaves
        heads = [(iota == 0) | pad_boundary]
        max_ml = max(math.ceil(math.log(max(n, 2), width)) + 1, 1)
        sh = 30
        ml = 0
        while sh > 0 and ml < max_ml:
            sh = max(sh - bits, 0)
            ml += 1
            pref = (sorted_codes >> sh).astype(jnp.uint32)
            prev = jnp.concatenate([pref[:1] ^ jnp.uint32(1), pref[:-1]])
            heads.append((pref != prev) | (iota == 0) | pad_boundary)
        num_chunk = max(math.ceil(math.log(max(n, 2), width)), 1)
        seg_start_deep = jax.lax.cummax(jnp.where(heads[-1], iota, -1))
        idx_in_seg = iota - seg_start_deep
        prev_heads = heads[-1]
        for kk in range(num_chunk - 1, -1, -1):
            s = prev_heads | (idx_in_seg % (width ** (kk + 1)) == 0)
            heads.append(s)
            prev_heads = s
        return jnp.stack(heads, axis=0)

    def scans_of(heads):
        L, n = heads.shape
        iota = jnp.arange(n, dtype=jnp.int32)
        iota_l = jnp.broadcast_to(iota[None, :], (L, n))
        starts = jax.lax.cummax(jnp.where(heads, iota_l, -1), axis=1)
        nxt_src = jnp.concatenate(
            [jnp.where(heads[:, 1:], iota_l[:, 1:], n),
             jnp.full((L, 1), n, jnp.int32)], axis=1)
        nxts = jax.lax.cummin(nxt_src, axis=1, reverse=True)
        return starts, nxts

    def tbl_of(lo, hi):
        n = lo.shape[0]
        base = jnp.concatenate(
            [lo.T, -hi.T,
             jnp.full((2, n), bucket._F32_MAX, jnp.float32)], axis=0)
        K = max(int(math.floor(math.log2(max(n, 1)))) + 1, 1)
        tbl = [base]
        cur = base
        for kk in range(1, K):
            d = 1 << (kk - 1)
            if d < n:
                shifted = jnp.concatenate(
                    [cur[:, d:],
                     jnp.full((8, d), bucket._F32_MAX, jnp.float32)], axis=1)
                cur = jnp.minimum(cur, shifted)
            tbl.append(cur)
        return jnp.stack(tbl, axis=0)

    timed("1 front (morton+sort+pairs)",
          jax.jit(lambda t: front(t)[0]), triangles)
    timed("2 + heads",
          jax.jit(lambda t: (lambda s: heads_of(s[0], s[5]))(front(t))),
          triangles)
    timed("3 + 2 scans",
          jax.jit(lambda t: (lambda s: scans_of(
              heads_of(s[0], s[5])))(front(t))), triangles)
    timed("4 + aabb table",
          jax.jit(lambda t: (lambda s: (
              scans_of(heads_of(s[0], s[5])), tbl_of(s[2], s[3])))(front(t))),
          triangles)
    timed("5 full build", jax.jit(lambda t: bucket.build_bucket_split(
        t, enable_pairs=True, leaf_width=leaf_width)[0].inner), triangles)


if __name__ == "__main__":
    main()
