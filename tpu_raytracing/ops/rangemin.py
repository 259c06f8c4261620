"""Generic two-tier sparse range-min tables (channel-major).

The SAH frontier's per-task/per-bin AABB sweeps need min-reductions over
contiguous ranges of a sorted primitive axis. Segmented prefix/suffix
scans (ops/scan.py) compute the same thing but lower to an
associative_scan doubling chain whose XLA program scales badly at 1M on
the remote-compile backend (the round-4 SAH compile blocker,
docs/TPU_NOTES.md). A sparse table is the compile-light equivalent: ~K0
dense shifted-min passes plus a coarse block tier (the same two-tier
design proven at 1M in bvh/bucket.py:_range_min_table), and each range
query is a handful of gathers whose operand is loop-invariant — the
measured fast case.

Negate channels to get range-MAX.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_F32_MAX = float(jnp.finfo(jnp.float32).max)

# Fine-tier depth: ranges shorter than 2^(K0-1) resolve from the fine
# tier alone; longer ones combine two fine edges with the coarse tier.
RANGE_K0 = 10


def build_range_min(vals: jnp.ndarray):
    """vals: [n, C] float32. Returns an opaque table for range_min_query.

    Layout is channel-major ([C, n]) so each of the C channels gathers
    from a contiguous flat row — C stays small (12 for the SAH sweep).
    """
    n, c = vals.shape
    base = vals.T  # [C, n]
    k_full = max(int(math.floor(math.log2(max(n, 1)))) + 1, 1)
    k0 = min(k_full, RANGE_K0)
    fine = [base]
    cur = base
    for kk in range(1, k0):
        d = 1 << (kk - 1)
        if d < n:
            shifted = jnp.concatenate(
                [cur[:, d:], jnp.full((c, d), _F32_MAX, jnp.float32)],
                axis=1)
            cur = jnp.minimum(cur, shifted)
        fine.append(cur)
    fine = jnp.stack(fine, axis=0)  # [K0, C, n]
    if k_full <= RANGE_K0:
        return fine, None, 0

    b = 1 << (k0 - 1)
    # fine[k0-1][:, i*b] min-reduces [i*b, i*b + b) — exactly block i.
    blocks = fine[k0 - 1][:, ::b]  # [C, nb]
    nb = blocks.shape[1]
    kc = max(int(math.floor(math.log2(max(nb, 1)))) + 1, 1)
    coarse = [blocks]
    cur = blocks
    for kk in range(1, kc):
        d = 1 << (kk - 1)
        if d < nb:
            shifted = jnp.concatenate(
                [cur[:, d:], jnp.full((c, d), _F32_MAX, jnp.float32)],
                axis=1)
            cur = jnp.minimum(cur, shifted)
        coarse.append(cur)
    return fine, jnp.stack(coarse, axis=0), b


def range_min_query(tbl, start: jnp.ndarray, count: jnp.ndarray):
    """Per-query min over vals[start : start + count) -> [Q, C].

    Empty (count <= 0) queries return +F32_MAX. Queries must lie within
    [0, n] (clipped defensively).
    """
    fine, coarse, b = tbl
    k0, c, n = fine.shape
    ln = jnp.maximum(count, 1)
    klev = jnp.int32(31) - jax.lax.clz(ln)
    fine_k = jnp.minimum(klev, k0 - 1)
    pa = jnp.clip(start, 0, n - 1)
    pb = jnp.clip(start + ln - (jnp.int32(1) << fine_k), 0, n - 1)
    flat_fine = fine.transpose(1, 0, 2).reshape(c, k0 * n)

    if coarse is not None:
        kc, _, nb = coarse.shape
        pe = jnp.clip(start + ln - b, 0, n - 1)
        ba = (start + b - 1) // b
        bb = (start + ln) // b
        lb = jnp.maximum(bb - ba, 1)
        kb = jnp.minimum(jnp.int32(31) - jax.lax.clz(lb), kc - 1)
        ca = jnp.clip(ba, 0, nb - 1)
        cb = jnp.clip(bb - (jnp.int32(1) << kb), 0, nb - 1)
        flat_coarse = coarse.transpose(1, 0, 2).reshape(c, kc * nb)
        use_fine = klev <= (k0 - 1)

    chans = []
    for r in range(c):
        va = flat_fine[r, :][fine_k * n + pa]
        vb = flat_fine[r, :][fine_k * n + pb]
        v = jnp.minimum(va, vb)
        if coarse is not None:
            edge = jnp.minimum(
                flat_fine[r, :][(k0 - 1) * n + pa],
                flat_fine[r, :][(k0 - 1) * n + pe])
            cmin = jnp.minimum(
                flat_coarse[r, :][kb * nb + ca],
                flat_coarse[r, :][kb * nb + cb])
            v = jnp.where(use_fine, v, jnp.minimum(edge, cmin))
        chans.append(v)
    out = jnp.stack(chans, axis=1)  # [Q, C]
    return jnp.where((count > 0)[:, None], out, _F32_MAX)
