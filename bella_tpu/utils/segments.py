"""Scatter-free segment reductions over sorted streams.

The entire overlap pipeline operates on flat occurrence streams sorted so
that equal keys are contiguous ("segments"). TPU scatters are slow, so
every per-segment reduction here is built from associative scans +
gathers (segmented-scan operator), which XLA maps well to the VPU.

This is the TPU replacement for the reference's per-column hash
accumulators (include/overlap.hpp:306-341) and libcuckoo upserts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def boundaries(keys) -> jnp.ndarray:
    """True at the first element of each run of equal keys."""
    n = keys.shape[0]
    if n == 0:
        return jnp.zeros((0,), bool)
    return jnp.concatenate([jnp.ones((1,), bool), keys[1:] != keys[:-1]])


def boundaries2(a, b) -> jnp.ndarray:
    """Run starts for composite (a, b) keys."""
    n = a.shape[0]
    if n == 0:
        return jnp.zeros((0,), bool)
    diff = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return jnp.concatenate([jnp.ones((1,), bool), diff])


def boundaries_many(*keys) -> jnp.ndarray:
    """Run starts for composite (k1, k2, ...) keys."""
    n = keys[0].shape[0]
    if n == 0:
        return jnp.zeros((0,), bool)
    diff = keys[0][1:] != keys[0][:-1]
    for k in keys[1:]:
        diff = diff | (k[1:] != k[:-1])
    return jnp.concatenate([jnp.ones((1,), bool), diff])


def seg_bounds(boundary):
    """(start_idx, end_idx) of the segment containing each element."""
    n = boundary.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(boundary, idx, 0))
    is_last = jnp.concatenate([boundary[1:], jnp.ones((1,), bool)])
    end = jax.lax.associative_scan(
        jnp.minimum, jnp.where(is_last, idx, n - 1)[::-1]
    )[::-1]
    return start, end


def seg_count(boundary):
    """Segment length, broadcast to every element of the segment."""
    start, end = seg_bounds(boundary)
    return (end - start + 1).astype(jnp.int32)


def seg_sum(values, boundary):
    """Segment sum, broadcast to every element (cumsum + bound gathers)."""
    start, end = seg_bounds(boundary)
    c = jnp.cumsum(values.astype(jnp.int64))
    return c[end] - c[start] + values[start].astype(jnp.int64)


def _segscan(op, values, boundary, reverse=False):
    """Inclusive segmented scan with `op` (max/min/add) resetting at
    segment starts. Standard associative segmented-scan pair operator."""
    if reverse:
        is_last = jnp.concatenate([boundary[1:], jnp.ones((1,), bool)])
        values, boundary = values[::-1], is_last[::-1]

    def combine(x, y):
        xf, xv = x
        yf, yv = y
        return xf | yf, jnp.where(yf, yv, op(xv, yv))

    _, out = jax.lax.associative_scan(combine, (boundary, values))
    return out[::-1] if reverse else out


def seg_max(values, boundary):
    """Segment max, broadcast to every element."""
    fwd = _segscan(jnp.maximum, values, boundary)
    _, end = seg_bounds(boundary)
    return fwd[end]


def seg_min(values, boundary):
    fwd = _segscan(jnp.minimum, values, boundary)
    _, end = seg_bounds(boundary)
    return fwd[end]


def seg_rank(boundary):
    """0-based rank of each element within its segment."""
    start, _ = seg_bounds(boundary)
    return (jnp.arange(boundary.shape[0], dtype=jnp.int64) - start).astype(jnp.int32)


def seg_ids(boundary):
    """Dense 0-based segment index per element."""
    return (jnp.cumsum(boundary.astype(jnp.int64)) - 1).astype(jnp.int32)
