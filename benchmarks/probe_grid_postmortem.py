"""Grid 18.7x post-mortem probe (VERDICT r2 weak #3 / next-round #4).

Theory to verify: the uniform-grid DDA was designed on round-1's
memoization-faked gather number ("loop-invariant gathers ~0.03 ms per
1M rows"); the honest rate on this backend is row-SERIALIZED (~6-15
ns/row, docs/TPU_NOTES.md "Sorts are NOT free" neighbourhood). One DDA
iteration at block=4 issues ~54 [R]-row gathers (cell_start + cell_word
+ 4 x (refs + 12-channel take_cols of pair vertices)), so per-iteration
cost is ~54 x R x ns_per_row — which reproduces the measured 8.3 s
bounce-subset pass. Measures:

  G1  take_cols(rows[:, :12], ridx) at R in {128k, 1M} over a 500k-row
      table — the inner-loop pair fetch (12 channel gathers).
  G2  single-channel gather cell_start[cid] at the same R.
  G3  one full DDA iteration shape: 2 + block*(1+12) gathers + MT math,
      inside a fori_loop of 32 dependent iterations (index feedback) —
      ns/iter/ray to compare against the bench's measured pass.
"""

import time

import jax
import jax.numpy as jnp

from tpu_raytracing.ops.gather import take_cols, take_rows


def timeit(fn, *args, reps=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*[a + (1 if a.dtype == jnp.int32 else 1e-6) * (i % 3)
                   for a in args])
    float(jnp.sum(out.astype(jnp.float32) if out.dtype != jnp.float32
                  else out))
    return (time.perf_counter() - t0) / reps


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    p = 500_000
    rows = jax.random.randint(key, (p, 16), 0, 1 << 20, dtype=jnp.int32)

    for r in (131_072, 1_000_000):
        ridx = jax.random.randint(jax.random.PRNGKey(1), (r,), 0, p)

        f1 = jax.jit(lambda rw, ix: jnp.sum(
            take_cols(rw[:, :12], ix).astype(jnp.float32), axis=0))
        dt = timeit(f1, rows, ridx)
        print(f"G1 take_cols 12ch R={r}: {dt*1e3:.2f} ms "
              f"({dt/r*1e9:.2f} ns/row, {dt/r/12*1e9:.2f} ns/row/ch)",
              flush=True)

        tbl = jax.random.randint(jax.random.PRNGKey(2), (1 << 22,), 0, 100)
        cid = jax.random.randint(jax.random.PRNGKey(3), (r,), 0, 1 << 22)
        f2 = jax.jit(lambda t, c: t[c])
        dt = timeit(f2, tbl, cid)
        print(f"G2 1-ch gather R={r}: {dt*1e3:.2f} ms "
              f"({dt/r*1e9:.2f} ns/row)", flush=True)

        # G3: DDA-iteration-shaped loop, 32 dependent iterations
        block = 4
        ITERS = 32

        def dda_like(rw, ix0, t0):
            def body(i, carry):
                ix, bt = carry
                acc = bt
                for j in range(block):
                    pt = take_cols(rw[:, :12], (ix + j) % p)  # [12, R]
                    v = pt.astype(jnp.float32)
                    # ~40 flops of MT-ish math per row
                    e1 = v[3] - v[0] + v[4] - v[1]
                    e2 = v[6] - v[0] + v[7] - v[2]
                    h = e1 * e2 - v[5] * v[8]
                    acc = jnp.minimum(acc, h * (v[9] - v[10]) + v[11])
                ix = (ix + acc.astype(jnp.int32)) % p  # dependent feedback
                return ix, acc
            ix, bt = jax.lax.fori_loop(
                0, ITERS, body, (ix0, t0))
            return bt

        f3 = jax.jit(dda_like)
        t0a = jnp.full((r,), 3e38, jnp.float32)
        out = f3(rows, ridx, t0a)
        jax.block_until_ready(out)
        tt = time.perf_counter()
        reps = 4
        for i in range(reps):
            out = f3(rows, ridx + i, t0a)
        float(jnp.sum(out))
        dt = (time.perf_counter() - tt) / reps
        print(f"G3 DDA-shaped loop R={r} block={block}: "
              f"{dt*1e3:.1f} ms / {ITERS} iters = "
              f"{dt/ITERS*1e3:.2f} ms/iter "
              f"({dt/ITERS/r*1e9:.1f} ns/ray/iter)", flush=True)


if __name__ == "__main__":
    main()
