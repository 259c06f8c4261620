"""Round-3 feasibility probes for the per-lane traversal kernel.

The round-2 wall: the packet kernel pops ONE node per scalar-loop
iteration (~480-550 ns of serialized scalar control per pop) and pays
packet-union divergence (~23x per-ray-ideal pops).  The candidate fix is
a SIMT-style per-lane machine: 128 rays on lanes, each advancing its own
traversal one node per iteration, with per-lane stacks as shift
registers and NO scalar control in the loop body.  That design is
buildable iff one of these fetch primitives works and is fast:

  E1  take_along_axis along LANES of a (S,128) VMEM table (per-lane
      dynamic gather) — the dream path: fetch = ~1 op per sublane tile.
  E2  one-hot bf16/f32 matmul gather (table (W,128) @ onehot(128,128))
      — the MXU fallback.
  E3  per-lane variable shift of a (S,128) stack via static rolls +
      bit-selects — the stack push/pop mechanism.
  E4  take_along_axis along SUBLANES (axis=0) — alternative stack.

Each experiment: correctness on the real chip, then ns/iteration from a
fori_loop of ITERS dependent iterations (vary-input + fetch timing per
docs/TPU_NOTES.md measurement protocol).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 4096


def timeit(fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*[a + (i % 3) if a.dtype != jnp.int32 else a
                   for a in args])
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / reps
    return dt


def report(name, dt, iters=ITERS):
    print(f"{name}: {dt*1e3:.3f} ms total, {dt/iters*1e9:.1f} ns/iter",
          flush=True)


# ---------------------------------------------------------------- E1
def e1_lane_gather():
    """Correctness: per-lane gather along lanes of an (8,128) table."""
    def kern(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]          # (8, 128)
        idx = idx_ref[:]          # (8, 128) int32, values in [0,128)
        out_ref[:] = jnp.take_along_axis(tab, idx, axis=1)

    tab = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jax.random.randint(jax.random.PRNGKey(0), (8, 128), 0, 128)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    ref = jnp.take_along_axis(tab, idx, axis=1)
    ok = bool(jnp.all(out == ref))
    print(f"E1 lane-gather (8,128) axis=1: ok={ok}", flush=True)
    return ok


def e1b_tall_gather():
    """(96,128) table, same per-lane index broadcast down sublanes."""
    def kern(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]          # (96, 128)
        idx = jnp.broadcast_to(idx_ref[:], (96, 128))
        out_ref[:] = jnp.take_along_axis(tab, idx, axis=1)

    tab = jax.random.normal(jax.random.PRNGKey(1), (96, 128))
    idx = jax.random.randint(jax.random.PRNGKey(2), (1, 128), 0, 128)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((96, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    ref = jnp.take_along_axis(tab, jnp.broadcast_to(idx, (96, 128)), axis=1)
    ok = bool(jnp.all(out == ref))
    print(f"E1b lane-gather (96,128) axis=1 bcast idx: ok={ok}", flush=True)
    return ok


def e1c_timing():
    """ns/iter for a dependent chain: gather -> use -> new index."""
    def kern(tab_ref, idx0_ref, out_ref):
        def body(i, _):
            idx = jnp.broadcast_to(out_ref[0:1, :].astype(jnp.int32) & 127,
                                   (96, 128))
            g = jnp.take_along_axis(tab_ref[:], idx, axis=1)
            out_ref[:] = (g + jnp.float32(1.0)) % 127.0
            return 0
        out_ref[:] = idx0_ref[:].astype(jnp.float32)
        jax.lax.fori_loop(0, ITERS, body, 0)

    tab = jax.random.randint(
        jax.random.PRNGKey(1), (96, 128), 0, 127).astype(jnp.float32)
    idx0 = jax.random.randint(jax.random.PRNGKey(2), (96, 128), 0, 128)
    f = jax.jit(lambda t, i: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((96, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    dt = timeit(f, tab, idx0)
    report("E1c dependent lane-gather chain (96,128)", dt)


# ---------------------------------------------------------------- E2
def e2_onehot_matmul():
    def kern(tab_ref, idx_ref, out_ref):
        def body(i, _):
            idx = out_ref[0:1, :].astype(jnp.int32) & 127  # (1,128)
            lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            onehot = (lane == idx).astype(jnp.bfloat16)  # (128el,128lane)
            g = jnp.dot(tab_ref[:], onehot,
                        preferred_element_type=jnp.float32)
            out_ref[:] = (g + jnp.float32(1.0)) % 127.0
            return 0
        out_ref[:] = idx_ref[:].astype(jnp.float32)
        jax.lax.fori_loop(0, ITERS, body, 0)

    tab = jax.random.randint(
        jax.random.PRNGKey(1), (96, 128), 0, 127).astype(jnp.bfloat16)
    idx0 = jax.random.randint(jax.random.PRNGKey(2), (96, 128), 0, 128)
    f = jax.jit(lambda t, i: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((96, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    dt = timeit(f, tab, idx0)
    report("E2 dependent one-hot bf16 matmul chain (96,128)", dt)


# ---------------------------------------------------------------- E3
def e3_stack_shift():
    """Per-lane variable shift of a (32,128) stack by k in [0,8):
    3 static rolls + bit selects."""
    S = 32

    def kern(st_ref, k_ref, out_ref):
        def body(i, _):
            st = out_ref[:]
            k = (k_ref[0:1, :] + i) & 7  # (1,128)
            for bit in (4, 2, 1):
                rolled = pltpu.roll(st, bit, axis=0)
                st = jnp.where((k & bit) != 0, rolled, st)
            out_ref[:] = st + 1.0
            return 0
        out_ref[:] = st_ref[:]
        jax.lax.fori_loop(0, ITERS, body, 0)

    st = jax.random.normal(jax.random.PRNGKey(3), (S, 128))
    k = jax.random.randint(jax.random.PRNGKey(4), (1, 128), 0, 8)
    f = jax.jit(lambda s, kk: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, kk))
    # correctness at 1 iter
    def kern1(st_ref, k_ref, out_ref):
        st = st_ref[:]
        k = k_ref[0:1, :] & 7
        for bit in (4, 2, 1):
            rolled = pltpu.roll(st, bit, axis=0)
            st = jnp.where((k & bit) != 0, rolled, st)
        out_ref[:] = st
    out1 = pl.pallas_call(
        kern1, out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(st, k)
    kv = np.asarray(k)[0]
    stv = np.asarray(st)
    ref = np.stack([np.roll(stv[:, l], kv[l]) for l in range(128)], axis=1)
    ok = bool(np.all(np.asarray(out1) == ref))
    dt = timeit(f, st, k.astype(jnp.float32).astype(jnp.int32))
    print(f"E3 roll-select variable shift: ok={ok}", flush=True)
    report("E3 stack shift (32,128) chain", dt)


# ---------------------------------------------------------------- E4
def e4_sublane_gather():
    def kern(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    tab = jax.random.normal(jax.random.PRNGKey(5), (32, 128))
    idx = jax.random.randint(jax.random.PRNGKey(6), (32, 128), 0, 32)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32))(tab, idx)
    ref = jnp.take_along_axis(tab, idx, axis=0)
    ok = bool(jnp.all(out == ref))
    print(f"E4 sublane-gather (32,128) axis=0: ok={ok}", flush=True)


# ---------------------------------------------------------------- E5
def e5_full_body_mock():
    """The real per-iteration body shape: fetch (96,128) via lane gather,
    slab-ish vector math on 8 entries, rank/select, stack shift."""
    S = 32

    def kern(tab_ref, idx0_ref, out_ref, st_scr):
        def body(i, _):
            ptr = out_ref[0:1, :].astype(jnp.int32) & 127
            g = jnp.take_along_axis(
                tab_ref[:], jnp.broadcast_to(ptr, (96, 128)), axis=1)
            # slab-ish: 8 entries x ~30 ops on (8,128)
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
            # rank of each entry among the 8 (all-pairs compare)
            ka = key.reshape(8, 1, 128)
            kb = key.reshape(1, 8, 128)
            rank = jnp.sum((kb < ka).astype(jnp.int32), axis=1)  # (8,128)
            nvalid = jnp.sum(hit.astype(jnp.int32), axis=0,
                             keepdims=True)  # (1,128)
            # stack push: shift by nvalid (0..8), write new entries
            k = jnp.minimum(nvalid, 7)
            st = st_scr[:]
            for bit in (4, 2, 1):
                rolled = pltpu.roll(st, bit, axis=0)
                st = jnp.where((k & bit) != 0, rolled, st)
            sub = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
            newe = jnp.where(sub < 8,
                             rank[jnp.minimum(sub, 7) % 8].astype(jnp.float32)
                             if False else 0.0, 0.0)
            st = jnp.where(sub < k, st + newe + 1.0, st)
            st_scr[:] = st
            out_ref[:] = (g + st[0:96 % S].repeat(3, axis=0)[:96]
                          if False else (g + 1.0) % 127.0)
            return 0
        out_ref[:] = idx0_ref[:].astype(jnp.float32)
        st_scr[:] = jnp.zeros((S, 128), jnp.float32)
        jax.lax.fori_loop(0, ITERS, body, 0)

    tab = jax.random.randint(
        jax.random.PRNGKey(7), (96, 128), 0, 127).astype(jnp.float32)
    idx0 = jax.random.randint(jax.random.PRNGKey(8), (96, 128), 0, 128)
    f = jax.jit(lambda t, i: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((96, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, 128), jnp.float32)],
    )(t, i))
    dt = timeit(f, tab, idx0)
    report("E5 full per-lane body mock (fetch+slab+rank+stack)", dt)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    for fn in (e1_lane_gather, e1b_tall_gather, e1c_timing,
               e2_onehot_matmul, e3_stack_shift, e4_sublane_gather,
               e5_full_body_mock):
        try:
            fn()
        except Exception as e:
            msg = str(e).split(chr(10))[0][:300]
            print(f"{fn.__name__}: FAILED — {msg}", flush=True)
