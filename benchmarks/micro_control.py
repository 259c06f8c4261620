"""Isolate the SCALAR CONTROL cost components of a traversal pop on TPU.

micro_pallas.py established: empty loop iter ~150 ns, pipelined row DMA
~free. The split kernel still pays ~550 ns/pop — this bench pins down the
rest: vector->scalar reductions, pl.when branch regions, the scalar push
loop (dynamic SMEM writes), and scalar SMEM reads. Each kernel is the
bare loop plus ONE component so ns/iter differences attribute cost.

  red1 / red2  — 1 / 2 (8,1) vector->scalar reductions per iter
  when4 / when12 — 4 / 12 pl.when regions (scalar-only bodies) per iter
  push8 — 8-entry scalar push loop: SMEM read + shift math + dynamic
          conditional SMEM write per entry (the interior_pop tail)
  read8 — just the 8 scalar SMEM reads
  combo — red2 + push8 + 2 pipelined DMAs + 4 whens: a predicated pop
  batch4 — like combo but 4 slots' reductions batched into one (32,1)
          packed reduction; measures whether batching reductions pays
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = int(os.environ.get("N", 200_000))
W = 65536


def run(name, kernel, scratch, rows):
    f = jax.jit(
        lambda r, s: pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                      pl.BlockSpec((1,), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(r, s)
    )
    out = f(rows, jnp.zeros((1,), jnp.int32))
    float(jnp.sum(out))
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(rows, jnp.full((1,), i + 1, jnp.int32))
    float(jnp.sum(out))
    ns = (time.perf_counter() - t0) / iters / N * 1e9
    log(f"{name}: {ns:.0f} ns/iter")


def idx_of(i, seed):
    return ((i * 7919 + seed) * 1103515245 & 0x7FFFFFFF) % W


def main():
    rows = jnp.arange(W * 128, dtype=jnp.int32).reshape(W, 128)
    log(f"device={jax.devices()[0]}, N={N}")

    # --- red1/red2: vector->scalar reductions ---
    def mk_red(nred):
        def k(rows, seed, out, vec, acc):
            def body(i, s):
                x = vec[:] * (i % 7 + 1)
                for r in range(nred):
                    s = s + jnp.min(x.astype(jnp.int32) + r)
                return s
            out[0] = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        return k

    for nred in (1, 2):
        run(f"red{nred} ", mk_red(nred),
            [pltpu.VMEM((8, 1), jnp.float32), pltpu.SMEM((8,), jnp.int32)],
            rows)

    # --- when4/when12: pl.when regions with scalar bodies ---
    def mk_when(nwhen):
        def k(rows, seed, out, scr):
            def body(i, s):
                for w_i in range(nwhen):
                    @pl.when((i + w_i) % 3 != 0)
                    def _():
                        scr[w_i] = scr[w_i] + i
                return s + scr[0]
            out[0] = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        return k

    for nwhen in (4, 12):
        run(f"when{nwhen:<2d}", mk_when(nwhen),
            [pltpu.SMEM((16,), jnp.int32)], rows)

    # --- push8: the interior_pop push tail ---
    def k_push(rows, seed, out, meta_s, stack, spp):
        def body(i, s):
            sp = spp[0]
            vmask = i & 0xFF
            emin = i % 8
            for e in range(8):
                meta = meta_s[e * 8 + 6]
                tag_e = ((meta >> 5) << 1) | (meta & 1)
                ok = (((vmask >> e) & 1) == 1) & (e != emin)
                stack[jnp.where(ok, sp, 300)] = tag_e
                sp = sp + ok.astype(jnp.int32)
            spp[0] = sp % 200
            return s + sp
        out[0] = jax.lax.fori_loop(0, N, body, jnp.int32(0))

    run("push8", k_push,
        [pltpu.SMEM((128,), jnp.int32), pltpu.SMEM((301,), jnp.int32),
         pltpu.SMEM((1,), jnp.int32)], rows)

    # --- read8: 8 scalar SMEM reads only ---
    def k_read(rows, seed, out, meta_s):
        def body(i, s):
            for e in range(8):
                s = s + meta_s[e * 8 + 6]
            return s
        out[0] = jax.lax.fori_loop(0, N, body, jnp.int32(0))

    run("read8", k_read, [pltpu.SMEM((128,), jnp.int32)], rows)

    # --- combo: a predicated pop (red2 + push8 + 2 pipelined DMAs + 4 whens)
    def k_combo(rows, seed, out, row_s, vec, stack, spp, sem):
        for c in range(4):
            pltpu.make_async_copy(
                rows.at[idx_of(jnp.int32(c), seed[0])], row_s.at[c], sem.at[c]
            ).start()

        def body(i, s):
            c = i % 4
            cp = pltpu.make_async_copy(
                rows.at[idx_of(i, seed[0])], row_s.at[c], sem.at[c])
            cp.wait()
            x = vec[:] * (i % 7 + 1)
            kmin = jnp.min(x.astype(jnp.int32))
            vmask = jnp.sum(x.astype(jnp.int32) & 1)

            @pl.when(i % 3 != 0)
            def _():
                spp[1] = spp[1] + 1

            sp = spp[0]
            emin = kmin % 8
            for e in range(8):
                meta = row_s[c, e * 8 + 6]
                tag_e = ((meta >> 5) << 1) | (meta & 1)
                ok = (((vmask >> e) & 1) == 1) & (e != emin)
                stack[jnp.where(ok, sp, 300)] = tag_e
                sp = sp + ok.astype(jnp.int32)
            spp[0] = sp % 200

            @pl.when(i % 5 != 0)
            def _():
                spp[2] = spp[2] + 1

            pltpu.make_async_copy(
                rows.at[idx_of(i + 4, seed[0])], row_s.at[c], sem.at[c]
            ).start()

            @pl.when(i % 7 != 0)
            def _():
                spp[3] = spp[3] + 1

            return s + sp

        out[0] = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        for c in range(4):
            pltpu.make_async_copy(rows.at[0], row_s.at[c], sem.at[c]).wait()

    run("combo", k_combo,
        [pltpu.SMEM((4, 128), jnp.int32), pltpu.VMEM((8, 1), jnp.float32),
         pltpu.SMEM((301,), jnp.int32), pltpu.SMEM((8,), jnp.int32),
         pltpu.SemaphoreType.DMA((4,))], rows)

    # --- batch4: one (32,1) packed reduction serving 4 slots ---
    def k_batch(rows, seed, out, row_s, vec, stack, spp, sem):
        for c in range(4):
            pltpu.make_async_copy(
                rows.at[idx_of(jnp.int32(c), seed[0])], row_s.at[c], sem.at[c]
            ).start()

        def body(i, s):
            # one batched reduction: lanes pack (slot, entry) keys
            x = vec[:] * (i % 7 + 1)  # (32, 1)
            packed = jnp.min(
                x.astype(jnp.int32)
                + jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
            )
            for c in range(4):
                cp = pltpu.make_async_copy(
                    rows.at[idx_of(i * 4 + c, seed[0])], row_s.at[c],
                    sem.at[c])
                cp.wait()
                vmask = (packed >> (c * 8)) & 0xFF
                sp = spp[0]
                emin = packed % 8
                for e in range(8):
                    meta = row_s[c, e * 8 + 6]
                    tag_e = ((meta >> 5) << 1) | (meta & 1)
                    ok = (((vmask >> e) & 1) == 1) & (e != emin)
                    stack[jnp.where(ok, sp, 300)] = tag_e
                    sp = sp + ok.astype(jnp.int32)
                spp[0] = sp % 200
                pltpu.make_async_copy(
                    rows.at[idx_of(i * 4 + c + 4, seed[0])], row_s.at[c],
                    sem.at[c]
                ).start()
            return s + spp[0]

        out[0] = jax.lax.fori_loop(0, N // 4, body, jnp.int32(0))
        for c in range(4):
            pltpu.make_async_copy(rows.at[0], row_s.at[c], sem.at[c]).wait()

    # batch4 reports per-POP (4 pops per iteration)
    def run4(name, kernel, scratch):
        f = jax.jit(
            lambda r, s: pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                          pl.BlockSpec((1,), memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(r, s)
        )
        out = f(rows, jnp.zeros((1,), jnp.int32))
        float(jnp.sum(out))
        iters = 3
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(rows, jnp.full((1,), i + 1, jnp.int32))
        float(jnp.sum(out))
        ns = (time.perf_counter() - t0) / iters / N * 1e9
        log(f"{name}: {ns:.0f} ns/pop")

    run4("batch4", k_batch,
         [pltpu.SMEM((4, 128), jnp.int32), pltpu.VMEM((32, 1), jnp.float32),
          pltpu.SMEM((301,), jnp.int32), pltpu.SMEM((8,), jnp.int32),
          pltpu.SemaphoreType.DMA((4,))])


if __name__ == "__main__":
    main()
