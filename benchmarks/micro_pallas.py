"""Isolate the split-kernel's per-pop cost components on real TPU.

Five synthetic kernels, each a while/fori loop of N iterations:
  loop   — scalar-only loop body (baseline loop overhead)
  dma1   — + one 512 B HBM->SMEM row DMA (pseudo-random index) per iter
  dma2   — + a second 4 KB HBM->VMEM (8,128) row DMA per iter
  comp   — dma1 + ~35 (8,128) vector ops (slab-scale compute), no 2nd DMA
  pipe4  — dma1 with 4 outstanding DMAs round-robin (issue cost vs latency)

ns/iter tells which component dominates the traversal pop.
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


def main():
    rows = jnp.arange(W * 128, dtype=jnp.int32).reshape(W, 128)
    rows_v = jnp.arange(W * 8 * 128, dtype=jnp.float32).reshape(W, 8, 128)
    log(f"device={jax.devices()[0]}, N={N}")

    def idx_of(i, seed):
        return ((i * 7919 + seed) * 1103515245 & 0x7FFFFFFF) % W

    # --- loop: scalar only ---
    def k_loop(rows, seed, out):
        def body(i, s):
            return s + idx_of(i, seed[0])
        out[0] = jax.lax.fori_loop(0, N, body, jnp.int32(0))

    run("loop ", k_loop, [], rows)

    # --- dma1: one SMEM row DMA per iter ---
    def k_dma1(rows, seed, out, row_s, sem):
        def body(i, s):
            idx = idx_of(i, seed[0])
            cp = pltpu.make_async_copy(rows.at[idx], row_s, sem)
            cp.start()
            cp.wait()
            return s + row_s[6]
        out[0] = jax.lax.fori_loop(0, N, body, jnp.int32(0))

    run("dma1 ", k_dma1,
        [pltpu.SMEM((128,), jnp.int32), pltpu.SemaphoreType.DMA], rows)

    # --- dma2: SMEM row + VMEM (8,128) row per iter ---
    def k_dma2(rows, seed, out, row_s, vrow, sem, sem2):
        def body(i, s):
            idx = idx_of(i, seed[0])
            cp = pltpu.make_async_copy(rows.at[idx], row_s, sem)
            cp.start()
            # reuse rows as the vector source via a second view is not
            # possible here; DMA an (8,128) slice window instead
            cp2 = pltpu.make_async_copy(
                rows.at[pl.ds(jnp.minimum(idx, W - 8), 8), :], vrow, sem2
            )
            cp2.start()
            cp.wait()
            cp2.wait()
            return s + row_s[6]
        out[0] = jax.lax.fori_loop(0, N, body, jnp.int32(0))

    run("dma2 ", k_dma2,
        [pltpu.SMEM((128,), jnp.int32), pltpu.VMEM((8, 128), jnp.int32),
         pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA], rows)

    # --- comp: dma1 + slab-scale vector work ---
    def k_comp(rows, seed, out, row_s, acc, sem):
        def body(i, s):
            idx = idx_of(i, seed[0])
            cp = pltpu.make_async_copy(rows.at[idx], row_s, sem)
            cp.start()
            cp.wait()
            x = acc[:]
            for _ in range(6):
                x = jnp.maximum(x * 1.0001 + 0.5, x)
                x = jnp.minimum(x * 0.9999 - 0.5, x)
            for _ in range(6):
                x = x + jnp.minimum(x, 0.25 * x)
            acc[:] = x
            return s + row_s[6]
        out[0] = jax.lax.fori_loop(0, N, body, jnp.int32(0))

    run("comp ", k_comp,
        [pltpu.SMEM((128,), jnp.int32), pltpu.VMEM((8, 128), jnp.float32),
         pltpu.SemaphoreType.DMA], rows)

    # --- pipe4: 4 outstanding row DMAs, round-robin ---
    def k_pipe(rows, seed, out, row_s, sem):
        for c in range(4):
            pltpu.make_async_copy(
                rows.at[idx_of(jnp.int32(c), seed[0])], row_s.at[c], sem.at[c]
            ).start()

        def body(i, s):
            c = i % 4
            cp = pltpu.make_async_copy(
                rows.at[idx_of(i, seed[0])], row_s.at[c], sem.at[c]
            )
            cp.wait()
            s = s + row_s[c, 6]
            pltpu.make_async_copy(
                rows.at[idx_of(i + 4, seed[0])], row_s.at[c], sem.at[c]
            ).start()
            return s

        out[0] = jax.lax.fori_loop(0, N, body, jnp.int32(0))
        for c in range(4):
            pltpu.make_async_copy(
                rows.at[0], row_s.at[c], sem.at[c]
            ).wait()

    run("pipe4", k_pipe,
        [pltpu.SMEM((4, 128), jnp.int32), pltpu.SemaphoreType.DMA((4,))],
        rows)


if __name__ == "__main__":
    main()
