"""Stage-wise timing of the per-frame build paths at bench scale.

Stages (the production pipeline bench.py times as `build`):
  A  split_front      — Morton codes + payload sorts + pair rows
  B  emit_split       — leaf-major classification + scatter (from a
                        precomputed front, so B is emit alone)
  C  prep_split_views — kernel-view pad/transpose cost (from a
                        precomputed (split, packed))
  D  front+emit+views — the composed per-frame rebuild (two jits, as
                        bench.py stages them)
  E  refit_split      — fixed-topology AABB refresh
  F  build_grid       — uniform-grid full rebuild from pair rows
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


def timed(name, fn, arg, vary, iters=3):
    """Time jit(fn) over `arg`, re-deriving a fresh input with `vary(arg, i)`
    each iteration (this backend memoizes identical executions).

    DCE TRAP (docs/TPU_NOTES.md round 4): `fn` must return EVERY array
    the stage claims to build — returning one view lets XLA dead-code-
    eliminate the rest (the old D stage under-read 545 ms as 253)."""
    f = jax.jit(fn)
    out = f(arg)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(vary(arg, i))
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    log(f"{name}: {(time.perf_counter()-t0)/iters*1000:.0f} ms")


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.bvh.grid import auto_res3, build_grid
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace import split_pallas as sp

    scene = procedural.terrain(num_tris)
    tris = jnp.asarray(scene.triangles)
    log(f"device={jax.devices()[0]}, {num_tris} tris")

    vary_tris = lambda t, i: t + (i + 1) * 1e-5  # noqa: E731

    timed("A split_front (morton+payload sorts+pairs)",
          lambda t: bucket.split_front(t, True), tris, vary_tris)

    front = jax.jit(lambda t: bucket.split_front(t, True))(tris)
    front = jax.block_until_ready(front)

    def vary_front(fr, i):
        # perturb the packed vertex words (int +1 = ~1ulp float wiggle);
        # codes/order stay fixed, which is fine for timing the emitter.
        sc, packed, lo, hi, cc, nl = fr
        return (sc, type(packed)(rows=packed.rows.at[:, 0].add(i + 1)),
                lo + (i + 1) * 1e-6, hi, cc, nl)

    timed("B emit_split (from precomputed front)",
          lambda fr: bucket.emit_split(fr, leaf_width=sp.LEAFW),
          front, vary_front)

    split, packed = jax.jit(
        lambda fr: bucket.emit_split(fr, leaf_width=sp.LEAFW))(front)
    split, packed = jax.block_until_ready((split, packed))

    def vary_sp(spl_pk, i):
        s, p = spl_pk
        return (s.replace(inner=s.inner.at[:, 0].add(0)),
                type(p)(rows=p.rows.at[:, 0].add(i + 1)))

    timed("C prep_split_views (from precomputed split)",
          lambda spk: sp.prep_split_views(*spk), (split, packed), vary_sp)

    def full(t):
        s, p = bucket.emit_split(bucket.split_front(t, True),
                                 leaf_width=sp.LEAFW)
        return sp.prep_split_views(s, p), p.rows

    timed("D front+emit+views one jit", full, tris, vary_tris)

    timed("E refit_split",
          lambda spk: bucket.refit_split(spk[0], spk[1]),
          (split, packed), vary_sp)

    r3 = auto_res3(scene.aabb_max - scene.aabb_min, num_tris)

    timed("F build_grid full rebuild",
          lambda spk: build_grid(spk[1].rows, split.num_leaves,
                                 res=r3).cell_count,
          (split, packed), vary_sp)


if __name__ == "__main__":
    main()
