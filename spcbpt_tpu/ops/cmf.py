"""Batched CMF (cumulative mass function) utilities.

The reference samples CMFs with a per-thread binary search
(Tracer::binary_sample cuProg.h:245-264). Here lanes bisect in lockstep with
per-lane [base, base+size) bounds into one flat CMF array — log2(max_size)
gather rounds, fully vectorized.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_searchsorted(cmf_flat, base, size, x, max_size: int):
    """Per-lane searchsorted-right within segments of a flat CMF.

    Returns local index l in [0, size-1]: the first slot with cmf > x
    (clamped). pmf recovery: cmf[base+l] - (l>0 ? cmf[base+l-1] : 0).
    max_size bounds the bisection round count (static)."""
    import math
    lo = jnp.zeros_like(base)           # first candidate
    hi = jnp.maximum(size, 1)           # one past last
    rounds = max(1, math.ceil(math.log2(int(max_size) + 1)))

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        v = cmf_flat[jnp.clip(base + mid, 0, cmf_flat.shape[0] - 1)]
        go_right = (v <= x) & (lo < hi - 1) | (mid == lo) & (v <= x)
        # standard bisect: if cmf[mid] <= x, answer is right of mid
        new_lo = jnp.where(v <= x, mid + 1, lo)
        new_hi = jnp.where(v <= x, hi, mid)
        return (jnp.minimum(new_lo, hi), new_hi)

    lo, hi = jax.lax.fori_loop(0, rounds + 1, body, (lo, hi))
    return jnp.clip(lo, 0, jnp.maximum(size - 1, 0))


def segment_pmf(cmf_flat, base, local_idx):
    c = cmf_flat[jnp.clip(base + local_idx, 0, cmf_flat.shape[0] - 1)]
    prev = cmf_flat[jnp.clip(base + local_idx - 1, 0, cmf_flat.shape[0] - 1)]
    return jnp.where(local_idx > 0, c - prev, c)
