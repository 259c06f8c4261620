"""Microbenchmark: gather/scatter patterns used by the bucket builder.

Hypothesis: stage A/B's ~350 independent 1M-row gathers at ~15 ms each
explain the 10 s build. Verify per-pattern cost on the real backend.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, iters=4):
    jitted = jax.jit(fn)
    out = jitted(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for i in range(iters):
        out = jitted(*[a + (i + 1) * 1e-3 if a.dtype != jnp.int32 else a
                       for a in args])
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / iters * 1000.0
    log(f"{name}: {ms:.2f} ms")
    return ms


def main():
    n = 1_000_000
    rng = np.random.default_rng(0)
    rand_idx = jnp.asarray(rng.integers(0, n, n), jnp.int32)
    sorted_idx = jnp.sort(rand_idx)
    x1 = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    x3 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    x16 = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    log(f"device={jax.devices()[0]}")

    timeit("dense a*b+c [1M,16]", lambda x: x * 1.5 + 0.25, x16)
    timeit("gather [1M] f32, random idx", lambda x: x[rand_idx], x1)
    timeit("gather [1M] f32, sorted idx", lambda x: x[sorted_idx], x1)
    timeit("gather [1M,3] rows, random", lambda x: x[rand_idx], x3)
    timeit("gather [1M,16] rows, random", lambda x: x[rand_idx], x16)
    timeit("gather [1M,16] rows, sorted", lambda x: x[sorted_idx], x16)

    # 8 separate [1M] gathers (stage A per-entry-slot pattern) vs one shot
    def eight(x):
        return sum(x[jnp.clip(rand_idx + j, 0, n - 1)] for j in range(8))

    timeit("8x gather [1M] f32 (slot loop)", eight, x1)

    # scatter chain (stage A): 17 sequential .at[].set into [1M, 8]
    dest = jnp.asarray(rng.permutation(n), jnp.int32)

    def scatter_chain(x):
        buf = jnp.zeros((n, 8), jnp.float32)
        for j in range(17):
            buf = buf.at[dest].set(x[:, None] + j, mode="drop")
        return buf

    timeit("17x scatter [1M]->[1M,8] chain", scatter_chain, x1)

    # segmented-scan pattern at 1M (_segment_totals: 3 shifted passes x2)
    heads = jnp.asarray(rng.random(n) < 0.12)

    def seg(x):
        f = heads
        for d in (1, 2, 4):
            xs = jnp.concatenate([jnp.full((d, 3), 3.4e38, x.dtype), x[:-d]], 0)
            fs = jnp.concatenate([jnp.ones((d,), bool), f[:-d]])
            x = jnp.where(f[:, None], x, jnp.minimum(xs, x))
            f = f | fs
        return x

    timeit("segmented 3-pass min [1M,3]", seg, x3)

    # cumsum / sort baseline
    timeit("cumsum [1M] i32", lambda x: jnp.cumsum(x), rand_idx)
    timeit("sort_key_val [1M]", lambda k: jax.lax.sort_key_val(k, rand_idx)[0], x1)


if __name__ == "__main__":
    main()
