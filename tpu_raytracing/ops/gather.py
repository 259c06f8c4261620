"""Channel-major row gathers.

On this TPU backend a row gather from an [N, C] array with small C pays the
(8, 128) tile padding on the minor dimension — C=3 reads ~42x the bytes.
Gathering along axis 1 of the transposed [C, N] array keeps the big axis on
the lanes (no padding); the transposes themselves are dense relayouts.
"""

from __future__ import annotations

import jax.numpy as jnp


def take_rows(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """a[idx] for any-rank ``a`` without minor-dim tile padding."""
    if a.ndim == 1:
        return a[idx]
    lead = a.shape[1:]
    flat = a.reshape(a.shape[0], -1)  # [N, C]
    out = jnp.take(flat.T, idx, axis=1).T  # [len(idx), C]
    return out.reshape((idx.shape[0],) + lead)


def take_cols(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather returned TRANSPOSED: [C, len(idx)] for a [N, C] operand.

    Keeps the big gathered axis on the lanes with no final relayout — the
    right form when downstream math runs channel-major (e.g. the BFS
    tracer's [w, V] slab / [leafw, V] Möller-Trumbore blocks)."""
    flat = a.reshape(a.shape[0], -1)
    return jnp.take(flat.T, idx, axis=1)  # [C, len(idx)]
