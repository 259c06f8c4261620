"""Segmented scan primitives.

The SAH builder's shared-memory reductions and atomic partition counters
(reference: src/SharedTaskBuilder.cu:206-380) become segmented prefix scans
over the dense primitive axis: tasks own contiguous ranges, so a flag-reset
min/max scan plus boundary gathers computes every per-task reduction at
once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segmented_scan(values: jnp.ndarray, seg_start: jnp.ndarray, combine,
                   reverse: bool = False) -> jnp.ndarray:
    """Inclusive segmented scan along axis 0.

    values: [N, ...]; seg_start: [N] bool, True where a segment begins (for
    reverse=True, True where a segment *ends*). ``combine`` is an associative
    elementwise op (jnp.minimum/maximum/add).
    """
    if reverse:
        values = values[::-1]
        seg_start = seg_start[::-1]

    flags = seg_start
    if values.ndim > 1:
        flag_shape = flags.reshape(flags.shape[0], *([1] * (values.ndim - 1)))
    else:
        flag_shape = flags

    def op(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, combine(av, bv))

    _, out = jax.lax.associative_scan(op, (flag_shape, values))
    if reverse:
        out = out[::-1]
    return out
