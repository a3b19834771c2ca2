"""Temporal + stereo 4-view consistency tracking.

Replaces ``find_remaining_points`` (VO.m:280-334). The reference runs four
``matchFeatures`` stages and physically *slices* every array after each one;
here the same cascade is index COMPOSITION over fixed-capacity buffers — each
stage produces index arrays into the ORIGINAL padded feature sets plus a
validity mask, and the data (pixels, descriptors) is gathered exactly once at
the end. Stage semantics mirror the reference exactly:

  1. cur-L vs old-L  (VO.m:283)  -> old set filtered by col 2 (VO.m:287-290)
  2. cur-R vs old-R' (VO.m:293)  -> old filtered again       (VO.m:297-300)
  3. cur-L' vs cur-R'' stereo    (VO.m:311) -> current aligned (VO.m:314-317)
  4. cur-L''' vs old-L'' re-align (VO.m:323) -> 1:1 rows      (VO.m:326-333)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import MatcherConfig
from ..utils.padding import gather_rows
from .match import match
from .sift import Features


class StereoFeatures(NamedTuple):
    """Row-aligned stereo-matched features carried across frames (VO.m:225-230).

    ``ids`` are persistent track identifiers threaded frame-to-frame by
    odometry.pipeline (a feature tracked across frames keeps its id) — the
    hook multi-frame observation windows (BA) hang off. -1 = unassigned.
    """

    l_xy: jnp.ndarray  # [C, 2]
    r_xy: jnp.ndarray  # [C, 2]
    l_desc: jnp.ndarray  # [C, 128]
    r_desc: jnp.ndarray  # [C, 128]
    mask: jnp.ndarray  # [C]
    ids: jnp.ndarray  # [C] int32 persistent track id (-1 unassigned)


class TrackResult(NamedTuple):
    """1:1 correspondences between current and previous frames after the cascade."""

    cur_l_idx: jnp.ndarray  # [C] into current LEFT feature set
    cur_r_idx: jnp.ndarray  # [C] into current RIGHT feature set
    old_row: jnp.ndarray  # [C] row into the previous StereoFeatures
    mask: jnp.ndarray  # [C]


def stereo_features(feats_l: Features, feats_r: Features, cfg: MatcherConfig, capacity: int) -> StereoFeatures:
    """Frame's stereo-matched subset (the VO.m:87 + VO.m:141-144 contract)."""
    sf, _ = stereo_features_with_matches(feats_l, feats_r, cfg, capacity)
    return sf


def stereo_features_with_matches(
    feats_l: Features, feats_r: Features, cfg: MatcherConfig, capacity: int
):
    """Like stereo_features but also returns the raw Matches (index payload)."""
    m = match(feats_l.desc, feats_l.mask, feats_r.desc, feats_r.mask, cfg, capacity)
    sf = StereoFeatures(
        l_xy=gather_rows(feats_l.xy, m.a_idx, m.mask),
        r_xy=gather_rows(feats_r.xy, m.b_idx, m.mask),
        l_desc=gather_rows(feats_l.desc, m.a_idx, m.mask),
        r_desc=gather_rows(feats_r.desc, m.b_idx, m.mask),
        mask=m.mask,
        ids=jnp.full((capacity,), -1, jnp.int32),
    )
    return sf, m


def track(
    old: StereoFeatures,
    cur_l: Features,
    cur_r: Features,
    cfg: MatcherConfig,
    capacity: int,
) -> TrackResult:
    """The 4-stage cascade. ``old`` is row-aligned; outputs index the inputs."""
    # Stage 1: current-left vs old-left. Rows of m1 define the "old'" ordering.
    m1 = match(cur_l.desc, cur_l.mask, old.l_desc, old.mask, cfg, capacity)
    a1, b1, k1 = m1.a_idx, m1.b_idx, m1.mask  # a1: cur-L idx, b1: old row

    # Stage 2: current-right vs old'-right. Rows of m2 define "old''"/cur-R''.
    old_r_desc_1 = gather_rows(old.r_desc, b1, k1)
    m2 = match(cur_r.desc, cur_r.mask, old_r_desc_1, k1, cfg, capacity)
    a2 = m2.a_idx  # cur-R idx
    b2 = jnp.take(b1, m2.b_idx)  # composed old row
    k2 = m2.mask

    # Stage 3: stereo match of cur-L' (m1 rows) vs cur-R'' (m2 rows).
    cur_l_desc_1 = gather_rows(cur_l.desc, a1, k1)
    cur_r_desc_2 = gather_rows(cur_r.desc, a2, k2)
    m3 = match(cur_l_desc_1, k1, cur_r_desc_2, k2, cfg, capacity)
    l3 = jnp.take(a1, m3.a_idx)  # cur-L orig idx, m3 rows
    r3 = jnp.take(a2, m3.b_idx)  # cur-R orig idx, m3 rows
    old3 = jnp.take(b2, m3.b_idx)  # old row carried along cur-R''
    k3 = m3.mask

    # Stage 4: re-align cur-L''' against old''-left for 1:1 rows.
    cur_l_desc_3 = gather_rows(cur_l.desc, l3, k3)
    old_l_desc_2 = gather_rows(old.l_desc, b2, k2)
    m4 = match(cur_l_desc_3, k3, old_l_desc_2, k2, cfg, capacity)
    final_mask = m4.mask
    cur_l_idx = jnp.take(l3, m4.a_idx)
    cur_r_idx = jnp.take(r3, m4.a_idx)
    old_row = jnp.take(b2, m4.b_idx)
    zero = jnp.zeros_like(cur_l_idx)
    return TrackResult(
        cur_l_idx=jnp.where(final_mask, cur_l_idx, zero),
        cur_r_idx=jnp.where(final_mask, cur_r_idx, zero),
        old_row=jnp.where(final_mask, old_row, zero),
        mask=final_mask,
    )
