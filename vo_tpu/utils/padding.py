"""Fixed-capacity padded arrays with validity masks.

The central design divergence from the MATLAB reference: every stage there
shrinks ragged arrays dynamically (e.g. the five filter steps in
find_remaining_points, VO.m:287-333). XLA requires static shapes, so every
feature set here is a fixed-capacity buffer + boolean mask, and "filtering"
becomes stable compaction of indices — a sort by (invalid, position), which
maps onto TPU-friendly sort/gather instead of data-dependent reshapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_indices(mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stable front-compaction of a [N] bool mask.

    Returns (perm, out_mask): gathering any aligned array with ``perm`` moves
    the valid rows to the front preserving order; ``out_mask`` marks the first
    count(mask) slots valid. Invalid slots gather from arbitrary (masked) rows.
    """
    n = mask.shape[0]
    pos = jnp.arange(n)
    # Sort key: invalid rows pushed to the back, stable within each class.
    key = jnp.where(mask, pos, pos + n)
    perm = jnp.argsort(key)
    count = jnp.sum(mask)
    out_mask = pos < count
    return perm, out_mask


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray, mask: jnp.ndarray | None = None, fill=0):
    """Gather rows of x by idx; rows where mask is False are set to ``fill``."""
    out = jnp.take(x, idx, axis=0, mode="clip")
    if mask is not None:
        shape = (mask.shape[0],) + (1,) * (out.ndim - 1)
        out = jnp.where(mask.reshape(shape), out, fill)
    return out


def pad_to(x: jnp.ndarray, n: int, fill=0) -> jnp.ndarray:
    """Pad/truncate the leading axis to exactly n rows."""
    cur = x.shape[0]
    if cur == n:
        return x
    if cur > n:
        return x[:n]
    pad_width = [(0, n - cur)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_width, constant_values=fill)


def masked_topk(scores: jnp.ndarray, mask: jnp.ndarray, k: int):
    """top-k over masked scores. Invalid entries score -inf. Returns (vals, idx, valid)."""
    neg = jnp.finfo(scores.dtype).min
    s = jnp.where(mask, scores, neg)
    vals, idx = jax.lax.top_k(s, k)
    return vals, idx, vals > neg
