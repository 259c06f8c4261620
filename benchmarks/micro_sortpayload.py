"""How does jax.lax.sort scale with payload channel count on this TPU?

If an 18-channel payload sort of 1M entries costs ~a few ms, the pair
build's two 9-channel gathers by sorted index (~175 ms at 1M,
docs/TPU_NOTES.md) can ride the Morton sort itself, and the pre-sort
compaction scatter dies too (invalid keys sort to the end).
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


def main():
    n = int(os.environ.get("N", 1_000_000))
    key = jax.random.PRNGKey(0)
    keys = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
    log(f"device={jax.devices()[0]}, n={n}")

    def timeit(name, fn, *args, iters=4):
        f = jax.jit(fn)
        out = f(*args)
        float(jnp.sum(jax.tree.leaves(out)[0][:8].astype(jnp.float32)))
        t0 = time.perf_counter()
        for i in range(iters):
            a = [args[0] + i + 1] + list(args[1:])
            out = f(*a)
        float(jnp.sum(jax.tree.leaves(out)[0][:8].astype(jnp.float32)))
        log(f"{name}: {(time.perf_counter() - t0) / iters * 1000:.1f} ms")

    v = jax.random.normal(key, (n,))
    timeit("sort_key_val 1 payload", jax.lax.sort_key_val, keys, v)

    for ch in (4, 9, 18):
        pay = [jax.random.normal(jax.random.PRNGKey(i), (n,))
               for i in range(ch)]
        timeit(f"sort {ch} payloads",
               lambda kk, *ps: jax.lax.sort([kk] + list(ps), num_keys=1),
               keys, *pay)

    # the competition: ch gathers by the sort permutation
    perm = jnp.argsort(keys)
    for ch in (9, 18):
        mat = jax.random.normal(key, (n, ch))
        from tpu_raytracing.ops.gather import take_rows
        timeit(f"take_rows [{n},{ch}] by perm",
               lambda m, p: take_rows(m, p), mat, perm)


if __name__ == "__main__":
    main()
