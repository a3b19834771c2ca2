"""Global landmark map: fixed-capacity device-side store.

Replaces the reference's growing ``landmarks`` array + per-point loop in
``CreateLandmarksFromFeatures.m``: triangulate new stereo pairs, keep every
``stride``-th (CreateLandmarksFromFeatures.m:4 steps by 2), gate depth to
(0, 80] m (lines 9-15), transform to the world frame with the current pose
(line 17), append (line 20).

TPU-first: insertion is a masked batched triangulation + one
``dynamic_update_slice`` at a running write cursor — no per-point loop, no
reallocation. The reference's accidental [0,0,0] rows (preallocation bug,
CreateLandmarksFromFeatures.m:2) are NOT replicated: only valid points land
in the store. Capacity overflow drops the tail and counts it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import LandmarkConfig
from ..geom import se3
from ..geom.camera import StereoCalib
from ..geom.triangulate import triangulate_rectified
from ..utils.padding import compact_indices


class LandmarkMap(NamedTuple):
    xyz: jnp.ndarray  # [capacity, 3] world-frame points
    count: jnp.ndarray  # scalar int32 — valid prefix length
    dropped: jnp.ndarray  # scalar int32 — points lost to capacity overflow


def init_map(cfg: LandmarkConfig) -> LandmarkMap:
    return LandmarkMap(
        xyz=jnp.zeros((cfg.capacity, 3), jnp.float32),
        count=jnp.int32(0),
        dropped=jnp.int32(0),
    )


def insert(
    lmap: LandmarkMap,
    l_px: jnp.ndarray,  # [C, 2] new stereo features, left
    r_px: jnp.ndarray,  # [C, 2] right
    mask: jnp.ndarray,  # [C]
    pose_c2w: jnp.ndarray,  # [4, 4] current world pose
    calib: StereoCalib,
    cfg: LandmarkConfig,
) -> LandmarkMap:
    """Triangulate + gate + world-transform + append. One jittable program."""
    C = l_px.shape[0]
    # Reference stride: keep every cfg.stride-th candidate (CLF.m:4).
    stride_keep = (jnp.arange(C) % cfg.stride) == 0
    X = triangulate_rectified(l_px, r_px, calib)  # camera frame
    keep = (
        mask
        & stride_keep
        & (X[:, 2] > cfg.min_depth)
        & (X[:, 2] <= cfg.max_depth)
        & jnp.isfinite(X).all(axis=1)
    )
    Xw = se3.apply(pose_c2w, X[None])[0]  # [C, 3] world frame (CLF.m:17)
    perm, out_mask = compact_indices(keep)
    Xw_c = jnp.take(Xw, perm, axis=0)
    Xw_c = jnp.where(out_mask[:, None], Xw_c, 0.0)
    n_new = jnp.sum(keep)
    cap = lmap.xyz.shape[0]
    # Clamp the write window inside capacity; tail beyond capacity is dropped.
    start = jnp.minimum(lmap.count, cap - C)
    window = jax.lax.dynamic_slice(lmap.xyz, (start, jnp.zeros_like(start)), (C, 3))
    # Only overwrite slots [count-start, count-start+n_new) of the window.
    local = jnp.arange(C) - (lmap.count - start)
    write = (local >= 0) & (local < n_new)
    src = jnp.take(Xw_c, jnp.clip(local, 0, C - 1), axis=0)
    window = jnp.where(write[:, None], src, window).astype(lmap.xyz.dtype)
    xyz = jax.lax.dynamic_update_slice(lmap.xyz, window, (start, jnp.zeros_like(start)))
    new_count = jnp.minimum(lmap.count + n_new, cap)
    dropped = lmap.dropped + (lmap.count + n_new - new_count)
    return LandmarkMap(xyz=xyz, count=new_count, dropped=dropped)
