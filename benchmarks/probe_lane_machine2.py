"""Probe 2: isolate the per-iteration cost structure of the per-lane
machine (probe_lane_machine.py found E5's full body at ~1.2 us/iter but
trivial bodies at ~28 us/iter — one of those is lying; find out which
and what the marginal costs are).

All variants share E5's exact loop skeleton (VMEM out_ref feedback,
fori_loop(ITERS)); each adds/removes one piece.
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
    dt = (time.perf_counter() - t0) / reps
    return dt


def make(body_kind, table_lanes=128):
    def kern(tab_ref, idx0_ref, out_ref, st_scr):
        def body(i, _):
            ptr = out_ref[0:1, :].astype(jnp.int32) & (table_lanes - 1)
            if body_kind in ("full", "fetch", "fetch2", "full2x"):
                g = jnp.take_along_axis(
                    tab_ref[:], jnp.broadcast_to(ptr, (96, 128)), axis=1)
                if body_kind == "fetch2":
                    g2 = jnp.take_along_axis(
                        tab_ref[:],
                        jnp.broadcast_to(ptr ^ 1, (96, 128)), axis=1)
                    g = g + g2 * 0.0 + g2
            else:  # "nofetch": static slice instead of gather
                g = tab_ref[:, 0:128] * (1.0 + ptr.astype(jnp.float32) * 0.0)
            if body_kind in ("full", "nofetch", "full2x"):
                reps_ = 2 if body_kind == "full2x" else 1
                for r in range(reps_):
                    box = g[0:48, :].reshape(6, 8, 128)
                    t0 = (box[0] - 0.3) * box[3]
                    t1 = (box[1] - 0.2) * box[4]
                    t2 = (box[2] - 0.1) * box[5]
                    front = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0, t1), jnp.minimum(t1, t2)),
                        jnp.minimum(t0, t2))
                    back = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0, t1), jnp.maximum(t1, t2)),
                        jnp.maximum(t0, t2))
                    hit = back >= front
                    key = jnp.where(hit, front, jnp.float32(3e38))
                    ka = key.reshape(8, 1, 128)
                    kb = key.reshape(1, 8, 128)
                    rank = jnp.sum((kb < ka).astype(jnp.int32), axis=1)
                    nvalid = jnp.sum(hit.astype(jnp.int32), axis=0,
                                     keepdims=True)
                    k = jnp.minimum(nvalid + r, 7)
                    st = st_scr[:]
                    for bit in (4, 2, 1):
                        rolled = pltpu.roll(st, bit, axis=0)
                        st = jnp.where((k & bit) != 0, rolled, st)
                    sub = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
                    st = jnp.where(sub < k, st + rank[0].astype(
                        jnp.float32) + 1.0, st)
                    st_scr[:] = st
            out_ref[:] = g + 1.0
            return 0
        out_ref[:] = idx0_ref[:].astype(jnp.float32)
        st_scr[:] = jnp.zeros((S, 128), jnp.float32)
        jax.lax.fori_loop(0, ITERS, body, 0)

    tab = jax.random.randint(
        jax.random.PRNGKey(7), (96, table_lanes), 0, 100).astype(jnp.float32)
    idx0 = jax.random.randint(jax.random.PRNGKey(8), (96, 128), 0, 128)
    f = jax.jit(lambda t, i: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((96, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, 128), jnp.float32)],
    )(t, i))
    return f, tab, idx0


def wide_gather_check(table_lanes):
    """Correctness of take_along_axis with a table wider than 128 lanes
    (cross-tile gather): does Mosaic decompose it, and what does it cost?"""
    def kern(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]
        idx = jnp.broadcast_to(idx_ref[:], (96, table_lanes))
        g = jnp.take_along_axis(tab, idx, axis=1)
        out_ref[:] = g[:, 0:128]

    tab = jax.random.normal(jax.random.PRNGKey(1), (96, table_lanes))
    idx = jax.random.randint(
        jax.random.PRNGKey(2), (1, table_lanes), 0, table_lanes)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((96, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    ref = jnp.take_along_axis(
        tab, jnp.broadcast_to(idx, (96, table_lanes)), axis=1)[:, 0:128]
    ok = bool(jnp.all(out == ref))
    print(f"wide lane-gather table_lanes={table_lanes}: ok={ok}", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    for kind in ("full", "fetch", "fetch2", "nofetch", "full2x"):
        try:
            f, tab, idx0 = make(kind)
            dt = timeit(f, tab, idx0)
            print(f"{kind}: {dt*1e3:.3f} ms, {dt/ITERS*1e9:.1f} ns/iter",
                  flush=True)
        except Exception as e:
            print(f"{kind}: FAILED — {str(e).splitlines()[0][:200]}",
                  flush=True)
    for tl in (256, 512):
        try:
            wide_gather_check(tl)
        except Exception as e:
            print(f"wide {tl}: FAILED — {str(e).splitlines()[0][:200]}",
                  flush=True)
