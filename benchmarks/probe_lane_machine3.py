"""Probe 3: attack the ~400-500 ns fixed per-iteration overhead found by
probe 2 (body work and even the lane-gather are nearly free under it).

Hypotheses: (H1) sub-tile ref reads (`out_ref[0:1, :]`) of a VMEM ref
are slow on Mosaic (the round-2 note "single-row slices of (8,128)-tiled
buffers must come from HBM" suggests sub-tile ref access is special);
(H2) the serial dependence chain gather->use->state leaves the VPU idle
— interleaving 2 independent packets per iteration should nearly halve
per-packet cost if so.

  V0  probe-2 'fetch' re-run (baseline, state fed back via out_ref rows)
  V1  state in a dedicated (8,128) scratch, read as a FULL tile
  V2  V1 + full body (slab+rank+stack)
  V3  V2 x 2 independent packets interleaved (per-packet-iter cost)
  V4  V2 but fori_loop chunks of 8 inside a while_loop with an
      any-alive scalar cond per chunk (the real kernel's termination)
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 4096
S = 32


def timeit(fn, *args, reps=16):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*[a + (i % 3) if a.dtype != jnp.int32 else a
                   for a in args])
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / reps


def body_work(g, st_scr, r=0):
    box = g[0:48, :].reshape(6, 8, 128)
    t0 = (box[0] - 0.3) * box[3]
    t1 = (box[1] - 0.2) * box[4]
    t2 = (box[2] - 0.1) * box[5]
    front = jnp.maximum(jnp.maximum(jnp.minimum(t0, t1),
                                    jnp.minimum(t1, t2)),
                        jnp.minimum(t0, t2))
    back = jnp.minimum(jnp.minimum(jnp.maximum(t0, t1),
                                   jnp.maximum(t1, t2)),
                       jnp.maximum(t0, t2))
    hit = back >= front
    key = jnp.where(hit, front, jnp.float32(3e38))
    ka = key.reshape(8, 1, 128)
    kb = key.reshape(1, 8, 128)
    rank = jnp.sum((kb < ka).astype(jnp.int32), axis=1)
    nvalid = jnp.sum(hit.astype(jnp.int32), axis=0, keepdims=True)
    k = jnp.minimum(nvalid + r, 7)
    st = st_scr[:]
    for bit in (4, 2, 1):
        rolled = pltpu.roll(st, bit, axis=0)
        st = jnp.where((k & bit) != 0, rolled, st)
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
    st = jnp.where(sub < k, st + rank[0].astype(jnp.float32) + 1.0, st)
    st_scr[:] = st
    return rank


def make(kind):
    npk = 2 if kind == "V3" else 1

    def kern(tab_ref, idx0_ref, out_ref, st8, *st_scrs):
        def step(p, ptr8):
            # ptr8: (8,128) full-tile value; row 0 is the live pointer
            ptr = ptr8[0:1, :] & 127
            g = jnp.take_along_axis(
                tab_ref[:], jnp.broadcast_to(ptr, (96, 128)), axis=1)
            if kind in ("V2", "V3", "V4"):
                body_work(g, st_scrs[p])
            return (ptr8 + g[0:8, :].astype(jnp.int32) + 1) & 127

        if kind in ("V0", "V0b"):
            def body(i, _):
                ptr = out_ref[0:1, :].astype(jnp.int32) & 127
                g = jnp.take_along_axis(
                    tab_ref[:], jnp.broadcast_to(ptr, (96, 128)), axis=1)
                out_ref[:] = (g + 1.0) % 127.0
                return 0
            out_ref[:] = idx0_ref[:].astype(jnp.float32)
            jax.lax.fori_loop(0, ITERS, body, 0)
            return

        for p in range(npk):
            st8[p] = idx0_ref[0:8, :] + p
            st_scrs[p][:] = jnp.zeros((S, 128), jnp.float32)

        if kind == "V4":
            def chunk(c):
                def body(i, _):
                    st8[0] = step(0, st8[0])
                    return 0
                jax.lax.fori_loop(0, 8, body, 0)
                alive = jnp.sum(st8[0]) >= 0  # consumes a reduction
                return c + 1 + jnp.where(alive, 0, 0)
            jax.lax.while_loop(lambda c: c < ITERS // 8, chunk,
                               jnp.int32(0))
        else:
            def body(i, _):
                for p in range(npk):
                    st8[p] = step(p, st8[p])
                return 0
            jax.lax.fori_loop(0, ITERS, body, 0)
        out_ref[:] = jnp.concatenate(
            [st8[p].astype(jnp.float32) for p in range(npk)]
            + [jnp.zeros((96 - 8 * npk, 128), jnp.float32)], axis=0)

    tab = jax.random.randint(
        jax.random.PRNGKey(7), (96, 128), 0, 100).astype(jnp.float32)
    idx0 = jax.random.randint(jax.random.PRNGKey(8), (96, 128), 0, 128)
    f = jax.jit(lambda t, i: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((96, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((npk, 8, 128), jnp.int32)]
        + [pltpu.VMEM((S, 128), jnp.float32) for _ in range(npk)],
    )(t, i))
    return f, tab, idx0, npk


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    for kind in ("V0", "V1", "V2", "V3", "V4"):
        try:
            f, tab, idx0, npk = make(kind)
            dt = timeit(f, tab, idx0)
            per = dt / ITERS / npk * 1e9
            print(f"{kind}: {dt*1e3:.3f} ms, {per:.1f} ns/packet-iter",
                  flush=True)
        except Exception as e:
            print(f"{kind}: FAILED — {str(e).splitlines()[0][:200]}",
                  flush=True)
