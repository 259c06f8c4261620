"""Which stage of bvh/sah.py:_level_step owns the 1M compile blowup?

Round-4 state (docs/TPU_NOTES.md): the host-stepped SAH frontier's level
step compiles in ~13 min at 250k but never returned at 1M (two ~75 min
attempts killed). Suspects named in VERDICT r4: the [cap]-unrolled
segmented_scan doubling chain and the [cap, 8] cumsum.

This probe AOT-compiles (jit(f).lower(...).compile(), no execution) each
stage of the level step in a FRESH SUBPROCESS per (stage, cap) with a hard
timeout, so one pathological compile can't eat the round. Results print as
one line per case: ``stage cap seconds`` (or TIMEOUT).

Usage:  python benchmarks/probe_sah_compile.py [stage cap]
  - no args: driver mode, runs the matrix below sequentially
  - with args: worker mode (runs one case and prints its time)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = [262144, 1048576]
STAGES = [
    "sort1",        # one sort_key_val (key, ids)
    "sort3",        # the three identical-key sorts of _level_step
    "segscan12",    # fwd+bwd segmented_scan over [cap, 12]
    "assoc_taskof", # scatter + associative_scan(max) over [cap]
    "cumsum8",      # jnp.cumsum over [cap, 8]
    "cumsum1",      # jnp.cumsum over [cap] int32 (rank prefix sums)
    "arena_scatter",# the _write_nodes-style scatters into [2cap]
    "full",         # the real _level_step
]


def worker(stage: str, cap: int) -> None:
    # compile fresh every time: the persistent cache would hide the cost
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    import jax
    import jax.numpy as jnp

    from tpu_raytracing.ops.scan import segmented_scan

    f32 = jnp.float32
    i32 = jnp.int32
    S = jax.ShapeDtypeStruct

    if stage == "sort1":
        def f(key, ids):
            return jax.lax.sort_key_val(key, ids, is_stable=True)
        args = (S((cap,), i32), S((cap,), i32))
    elif stage == "sort3":
        def f(key, ids, b, t):
            _, a = jax.lax.sort_key_val(key, ids, is_stable=True)
            _, c = jax.lax.sort_key_val(key, b, is_stable=True)
            _, d = jax.lax.sort_key_val(key, t, is_stable=True)
            return a, c, d
        args = (S((cap,), i32),) * 4
    elif stage == "segscan12":
        def f(v, flags, eflags):
            fwd = segmented_scan(v, flags, jnp.minimum)
            bwd = segmented_scan(v, eflags, jnp.minimum, reverse=True)
            return fwd, bwd
        args = (S((cap, 12), f32), S((cap,), jnp.bool_), S((cap,), jnp.bool_))
    elif stage == "assoc_taskof":
        def f(starts, tslotv):
            scat = jnp.full((cap,), -1, i32)
            scat = scat.at[starts].set(tslotv, mode="drop")
            return jax.lax.associative_scan(jnp.maximum, scat)
        args = (S((cap,), i32), S((cap,), i32))
    elif stage == "cumsum8":
        def f(onehot):
            return jnp.cumsum(onehot, axis=0)
        args = (S((cap, 8), i32),)
    elif stage == "cumsum1":
        def f(x):
            return jnp.cumsum(x)
        args = (S((cap,), i32),)
    elif stage == "arena_scatter":
        def f(nmin, nmax, slots, vals):
            nmin = nmin.at[slots].set(vals, mode="drop")
            nmax = nmax.at[slots].set(vals, mode="drop")
            return nmin, nmax
        args = (S((2 * cap, 3), f32), S((2 * cap, 3), f32), S((cap,), i32),
                S((cap, 3), f32))
    elif stage == "full":
        from tpu_raytracing.bvh import sah

        leaves = sah.LeafInput(
            aabb_min=S((cap, 3), f32), aabb_max=S((cap, 3), f32),
            child=S((cap,), i32), count=S((cap,), i32), type=S((cap,), i32),
            num_leaves=S((), i32))
        arena = sah.Arena(
            node_min=S((2 * cap + 130, 3), f32),
            node_max=S((2 * cap + 130, 3), f32),
            child=S((2 * cap + 130,), i32), count=S((2 * cap + 130,), i32),
            type=S((2 * cap + 130,), i32), parent=S((2 * cap + 130,), i32),
            wptr=S((), i32))
        state = dict(
            ids=S((cap,), i32), tstart=S((cap,), i32), tend=S((cap,), i32),
            tparent=S((cap,), i32), tpmin=S((cap, 3), f32),
            tpmax=S((cap, 3), f32), tcmin=S((cap, 3), f32),
            tcmax=S((cap, 3), f32), ntasks=S((), i32), arena=arena,
            level=S((), i32))
        t0 = time.perf_counter()
        jax.jit(sah._level_step, static_argnums=(2,)).lower(
            leaves, state, 64).compile()
        print(f"RESULT {stage} {cap} {time.perf_counter() - t0:.1f}",
              flush=True)
        return
    else:
        raise SystemExit(f"unknown stage {stage}")

    t0 = time.perf_counter()
    jax.jit(f).lower(*args).compile()
    print(f"RESULT {stage} {cap} {time.perf_counter() - t0:.1f}", flush=True)


def main() -> None:
    if len(sys.argv) == 3:
        worker(sys.argv[1], int(sys.argv[2]))
        return
    timeout = float(os.environ.get("TPURT_PROBE_TIMEOUT", "1200"))
    for cap in CAPS:
        for stage in STAGES:
            if stage == "full" and cap > 300000:
                # the known >90 min case; only re-measure if asked
                if os.environ.get("TPURT_PROBE_FULL_1M") != "1":
                    print(f"SKIP full {cap} (known >90 min)", flush=True)
                    continue
            t0 = time.perf_counter()
            try:
                p = subprocess.run(
                    [sys.executable, __file__, stage, str(cap)],
                    capture_output=True, text=True, timeout=timeout)
                out = (p.stdout or "").strip().splitlines()
                line = next((ln for ln in out if ln.startswith("RESULT")),
                            None)
                if line:
                    print(line, flush=True)
                else:
                    print(f"FAIL {stage} {cap} rc={p.returncode} "
                          f"{(p.stderr or '')[-300:]}", flush=True)
            except subprocess.TimeoutExpired:
                print(f"TIMEOUT {stage} {cap} after "
                      f"{time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
