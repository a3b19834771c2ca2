"""Batched descriptor matching as MXU-shaped linear algebra.

Replaces all five MATLAB ``matchFeatures`` calls per frame (stereo VO.m:87;
temporal cascade VO.m:283,293,311,323). MATLAB defaults replicated: SSD
metric, Lowe ratio test (MaxRatio 0.6), MatchThreshold as a percent of the
maximum possible descriptor distance [MATLAB docs].

TPU-first: the N x M SSD matrix is ONE matmul
(||a||^2 + ||b||^2 - 2 a.b — the 2 a.b term runs on the MXU), the top-2
nearest neighbors come from two masked min-reductions (cheaper than a general
top-k on TPU), and masked/padded rows never produce matches. Match lists are
fixed-capacity index arrays + masks (see utils.padding) rather than ragged
pair lists.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MatcherConfig
from ..utils.padding import compact_indices

# Max possible SSD between two L2-normalized nonnegative SIFT descriptors.
_MAX_SSD = 2.0
# Plain python float: a module-level jnp scalar would initialize the XLA
# backend at import time, breaking jax.distributed.initialize ordering on
# multi-host bring-up (dist.multihost_smoke).
_BIG = 1e30


class Matches(NamedTuple):
    """Compacted match pairs between set A and set B (fixed capacity)."""

    a_idx: jnp.ndarray  # [C] row index into A
    b_idx: jnp.ndarray  # [C] row index into B
    mask: jnp.ndarray  # [C] bool
    dist: jnp.ndarray  # [C] SSD of the accepted pair


def distance_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """[Na, Nb] SSD distances; the cross term is a single MXU matmul."""
    na2 = jnp.sum(desc_a * desc_a, axis=-1, keepdims=True)
    nb2 = jnp.sum(desc_b * desc_b, axis=-1, keepdims=True)
    cross = jnp.dot(desc_a, desc_b.T, preferred_element_type=jnp.float32)
    return jnp.maximum(na2 + nb2.T - 2.0 * cross, 0.0)


def _top2_min(D: jnp.ndarray):
    """Per-row two smallest values and the argmin. Two masked min passes."""
    d1 = jnp.min(D, axis=1)
    j1 = jnp.argmin(D, axis=1)
    D2 = D.at[jnp.arange(D.shape[0]), j1].set(_BIG)
    d2 = jnp.min(D2, axis=1)
    return d1, j1, d2


def match(
    desc_a: jnp.ndarray,
    mask_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    mask_b: jnp.ndarray,
    cfg: MatcherConfig,
    capacity: int | None = None,
) -> Matches:
    """Match rows of A to rows of B (A is the 'query' side, as in matchFeatures).

    Pipeline per row: nearest + second-nearest distance -> absolute threshold
    (percent of max distance) -> Lowe ratio -> optional mutual cross-check.
    Output compacted to ``capacity`` (default: len(A)) pairs, stable order.
    """
    if capacity is None:
        capacity = desc_a.shape[0]
    D = distance_matrix(desc_a, desc_b)
    D = jnp.where(mask_a[:, None] & mask_b[None, :], D, _BIG)
    d1, j1, d2 = _top2_min(D)
    thr = (cfg.match_threshold / 100.0) * _MAX_SSD
    ok = (d1 <= thr) & mask_a
    # Lowe ratio on distances (matchFeatures applies it on the metric values).
    ok &= d1 <= cfg.max_ratio * d2
    if cfg.mutual:
        i1_col = jnp.argmin(D, axis=0)  # best A row for each B column
        ok &= jnp.take(i1_col, j1) == jnp.arange(desc_a.shape[0])
    perm, out_mask = compact_indices(ok)
    a_idx = perm
    b_idx = jnp.take(j1, perm)
    dist = jnp.take(d1, perm)
    zero = jnp.zeros_like(a_idx)
    return Matches(
        a_idx=jnp.where(out_mask, a_idx, zero)[:capacity],
        b_idx=jnp.where(out_mask, b_idx, zero)[:capacity],
        mask=out_mask[:capacity],
        dist=jnp.where(out_mask, dist, 0.0)[:capacity],
    )
