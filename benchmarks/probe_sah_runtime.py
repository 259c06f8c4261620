"""Runtime breakdown of the round-5 _level_step at 1M on the TPU.

The compile-light rewrite (range-min table + searchsorted) unblocked the
1M compile (58 s vs >90 min) but the first cold build ran ~16 s/level —
this probe times each candidate sub-stage warm (vary-inputs + fetch) to
find where the 16 s lives and which alternative wins:

  sort      one sort_key_val (key, ids) at 1M
  taskof_ss task_of via searchsorted          (round-5 form)
  taskof_sc task_of via scatter + assoc scan  (round-4 form, 1-ch int)
  bounds_ss bin boundaries via searchsorted [8M queries]
  bounds_hist bin counts via scatter-add histogram
  rmbuild   range-min table build [1M, 12]
  rmquery   16 plane-field queries (channel-major gathers)
  arena     ~15 representative arena scatters
  gather12  one 12-channel row gather [1M] (unit cost reference)

Usage: python benchmarks/probe_sah_runtime.py [stages...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TPURT_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from tpu_raytracing.ops.rangemin import build_range_min, range_min_query

CAP = int(os.environ.get("TPURT_PROBE_TRIS", "1048576"))
NT = 4096  # live tasks (mid-build shape)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(label, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*[a + (i % 3) if a.dtype != jnp.bool_ else a
                   for a in args])
    float(jnp.sum(jax.tree.leaves(out)[0][:8].astype(jnp.float32)))
    log(f"{label}: {(time.perf_counter() - t0) / n * 1e3:.1f} ms")


def main():
    cap = CAP
    rng = np.random.default_rng(0)
    stages = sys.argv[1:] or ["sort", "taskof_ss", "taskof_sc", "bounds_ss",
                              "bounds_hist", "rmbuild", "rmquery", "arena",
                              "gather12"]
    log(f"device {jax.devices()[0]} cap={cap}")

    key = jnp.asarray(rng.integers(0, 1 << 24, cap).astype(np.int32))
    ids = jnp.arange(cap, dtype=jnp.int32)
    vals = jnp.asarray(rng.standard_normal((cap, 12)).astype(np.float32))
    # NT equal task ranges over [0, cap)
    tstart = jnp.asarray((np.arange(cap) // (cap // NT))
                         [:: cap // NT][:NT].astype(np.int32)) * 0 + \
        jnp.arange(NT, dtype=jnp.int32) * (cap // NT)
    tstart_full = jnp.concatenate(
        [tstart, jnp.full((cap - NT,), cap + 1, jnp.int32)])
    pos = jnp.arange(cap, dtype=jnp.int32)

    if "sort" in stages:
        timed("sort", jax.jit(
            lambda k, i: jax.lax.sort_key_val(k, i, is_stable=True)),
            key, ids)
    if "taskof_ss" in stages:
        timed("taskof_ss", jax.jit(
            lambda s, p: jnp.searchsorted(s, p, side="right")),
            tstart_full, pos)
    if "taskof_sc" in stages:
        def f(starts, tslotv):
            scat = jnp.full((cap,), -1, jnp.int32)
            scat = scat.at[starts].set(tslotv, mode="drop")
            return jax.lax.associative_scan(jnp.maximum, scat)
        timed("taskof_sc", jax.jit(f), tstart_full,
              jnp.arange(cap, dtype=jnp.int32))
    if "bounds_ss" in stages:
        qk = (jnp.arange(cap, dtype=jnp.int32)[:, None] + 1) * 16 \
            + jnp.arange(8, dtype=jnp.int32)[None, :]
        timed("bounds_ss", jax.jit(
            lambda k, q: jnp.searchsorted(k, q.reshape(-1), side="right")),
            jnp.sort(key), qk)
    if "bounds_hist" in stages:
        def f(keyv):
            seg = jnp.clip(keyv, 0, 16 * cap - 1)
            h = jnp.zeros((16 * cap,), jnp.int32).at[seg].add(
                1, mode="drop")
            return h
        timed("bounds_hist", jax.jit(f), key)
    if "rmbuild" in stages:
        timed("rmbuild", jax.jit(build_range_min), vals)
    if "rmquery" in stages:
        tbl = jax.jit(build_range_min)(vals)
        starts_q = jnp.asarray(
            rng.integers(0, cap - 300, cap).astype(np.int32))
        cnts = jnp.asarray(rng.integers(1, 300, cap).astype(np.int32))

        def fq(s, c):
            acc = 0.0
            for i in range(16):
                acc = acc + range_min_query(tbl, s + i, c)
            return acc
        timed("rmquery x16", jax.jit(fq), starts_q, cnts)
    if "arena" in stages:
        def fa(nmin, slots, valsv):
            for i in range(15):
                nmin = nmin.at[slots + i].set(valsv, mode="drop")
            return nmin
        timed("arena x15", jax.jit(fa),
              jnp.zeros((2 * cap, 3), jnp.float32),
              jnp.asarray(rng.integers(0, 2 * cap, cap).astype(np.int32)),
              vals[:, :3])
    if "gather12" in stages:
        idxg = jnp.asarray(rng.integers(0, cap, cap).astype(np.int32))
        timed("gather12", jax.jit(lambda i: vals[i]), idxg)


if __name__ == "__main__":
    main()


def extra_stages():
    """Round-2 probe: sort scaling + partition alternatives."""
    rng = np.random.default_rng(1)
    for cap in (262144, 1048576):
        key = jnp.asarray(rng.integers(0, 1 << 24, cap).astype(np.int32))
        ids = jnp.arange(cap, dtype=jnp.int32)
        timed(f"sort@{cap}", jax.jit(
            lambda k, i: jax.lax.sort_key_val(k, i, is_stable=True)),
            key, ids)
        timed(f"sort_u32@{cap}", jax.jit(
            lambda k, i: jax.lax.sort_key_val(k, i, is_stable=True)),
            key.astype(jnp.uint32), ids)
    cap = CAP
    key = jnp.asarray(rng.integers(0, 16 * cap, cap).astype(np.int32))
    onehot = jnp.asarray(
        rng.integers(0, 2, (cap, 8)).astype(np.int32))
    timed("cumsum8_rt", jax.jit(lambda o: jnp.cumsum(o, axis=0)), onehot)
    ids = jnp.arange(cap, dtype=jnp.int32)
    dest = jnp.asarray(rng.permutation(cap).astype(np.int32))
    timed("perm_scatter", jax.jit(
        lambda d, i: jnp.zeros((cap,), jnp.int32).at[d].set(i)), dest, ids)
    vals = jnp.asarray(rng.standard_normal((cap, 12)).astype(np.float32))
    idxg = jnp.asarray(rng.integers(0, cap, cap).astype(np.int32))
    timed("gather12", jax.jit(lambda i: vals[i]), idxg)

    def fa(nmin, slots, valsv):
        for i in range(15):
            nmin = nmin.at[slots + i].set(valsv, mode="drop")
        return nmin
    timed("arena x15", jax.jit(fa),
          jnp.zeros((2 * cap, 3), jnp.float32),
          jnp.asarray(rng.integers(0, 2 * cap, cap).astype(np.int32)),
          vals[:, :3])
    # row-major range query: gather rows of a flat [K0*n, 12] table
    tblr = jnp.asarray(
        rng.standard_normal((10 * cap, 12)).astype(np.float32))
    from tpu_raytracing.ops.gather import take_rows

    def fr(i):
        acc = 0.0
        for j in range(18):
            acc = acc + take_rows(tblr, jnp.clip(i + j, 0, 10 * cap - 1))
        return acc
    timed("rowquery x18", jax.jit(fr), idxg)
