"""Checkpoint / resume for long VO runs.

The reference only ever WRITES state, at the end of the run
(poses.mat/error.mat/landmarks.mat, VO.m:247-253) — nothing is loaded back
and a crash at frame 4400 of 4541 loses everything (SURVEY §5). Here the
full resumable state — carried features, current pose, landmark map prefix,
trajectory so far, PRNG key, frame index — is dumped atomically to one npz
every ``checkpoint_every`` frames and restored with ``load``.
"""
from __future__ import annotations

import os
import tempfile
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend.track import StereoFeatures
from .landmarks import LandmarkMap
from .pipeline import VOState

FORMAT_VERSION = 2


class Checkpoint(NamedTuple):
    state: VOState
    lmap: LandmarkMap | None
    poses: np.ndarray  # [T, 4, 4] trajectory so far (frames 2..)
    rel_poses: np.ndarray
    key: jnp.ndarray
    frame_idx: int
    # Per-frame stats so far (v2+; r4 zero-filled these on resume):
    n_inliers: np.ndarray | None = None
    n_tracks: np.ndarray | None = None
    pose_ok: np.ndarray | None = None
    # RefinerWorker.checkpoint_state payload (v2+, refined runs only).
    refiner: dict | None = None


def save(
    path: str,
    state: VOState,
    lmap,
    poses,
    rel_poses,
    key,
    frame_idx: int,
    stats: tuple | None = None,
    refiner_state: dict | None = None,
) -> str:
    """Atomic npz dump (write temp + rename, so a crash never corrupts the
    last good checkpoint). ``stats`` = (n_inliers, n_tracks, pose_ok) per
    frame so far; ``refiner_state`` = RefinerWorker.checkpoint_state() —
    both restored on resume so a refined (--ba/--loop-closure) run resumes
    bit-exactly instead of silently losing its graph history (VERDICT r5
    item 7)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    count = int(lmap.count) if lmap is not None else 0
    payload = dict(
        version=FORMAT_VERSION,
        frame_idx=frame_idx,
        prev_l_xy=np.asarray(state.prev.l_xy),
        prev_r_xy=np.asarray(state.prev.r_xy),
        prev_l_desc=np.asarray(state.prev.l_desc),
        prev_r_desc=np.asarray(state.prev.r_desc),
        prev_mask=np.asarray(state.prev.mask),
        prev_ids=np.asarray(state.prev.ids),
        next_id=np.asarray(state.next_id),
        pose_c2w=np.asarray(state.pose_c2w),
        prev_rel=np.asarray(state.prev_rel),
        state_frame_idx=np.asarray(state.frame_idx),
        poses=np.asarray(poses),
        rel_poses=np.asarray(rel_poses),
        key=np.asarray(key),
        lm_count=count,
        lm_dropped=int(lmap.dropped) if lmap is not None else 0,
        # Only the valid prefix is persisted — the store capacity may be huge.
        lm_xyz=np.asarray(lmap.xyz[:count]) if lmap is not None else np.zeros((0, 3), np.float32),
        lm_capacity=int(lmap.xyz.shape[0]) if lmap is not None else 0,
    )
    if stats is not None:
        n_in, n_tr, oks = stats
        payload["stat_n_inliers"] = np.asarray(n_in, np.int32)
        payload["stat_n_tracks"] = np.asarray(n_tr, np.int32)
        payload["stat_pose_ok"] = np.asarray(oks, bool)
    if refiner_state is not None:
        for k, v in refiner_state.items():
            payload["refx_" + k] = v
    d = os.path.dirname(os.path.abspath(path))
    # Suffix must end in .npz or np.savez appends it and the rename grabs the
    # empty mkstemp placeholder instead of the written archive.
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez_compressed(tmp, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load(path: str) -> Checkpoint:
    z = np.load(path)
    if int(z["version"]) not in (1, FORMAT_VERSION):
        raise ValueError(f"checkpoint version {int(z['version'])} != {FORMAT_VERSION}")
    prev = StereoFeatures(
        l_xy=jnp.asarray(z["prev_l_xy"]),
        r_xy=jnp.asarray(z["prev_r_xy"]),
        l_desc=jnp.asarray(z["prev_l_desc"]),
        r_desc=jnp.asarray(z["prev_r_desc"]),
        mask=jnp.asarray(z["prev_mask"]),
        ids=jnp.asarray(z["prev_ids"]),
    )
    state = VOState(
        prev=prev,
        pose_c2w=jnp.asarray(z["pose_c2w"]),
        prev_rel=jnp.asarray(z["prev_rel"]),
        frame_idx=jnp.asarray(z["state_frame_idx"]),
        next_id=jnp.asarray(z["next_id"]),
        key=jnp.asarray(z["key"]),  # PRNG key lives in the state (pipeline)
    )
    cap = int(z["lm_capacity"])
    lmap = None
    if cap > 0:
        xyz = jnp.zeros((cap, 3), jnp.float32)
        count = int(z["lm_count"])
        if count:
            xyz = xyz.at[:count].set(jnp.asarray(z["lm_xyz"]))
        lmap = LandmarkMap(xyz=xyz, count=jnp.int32(count), dropped=jnp.int32(int(z["lm_dropped"])))
    refiner = {k[5:]: z[k] for k in z.files if k.startswith("refx_")} or None
    return Checkpoint(
        state=state,
        lmap=lmap,
        poses=z["poses"],
        rel_poses=z["rel_poses"],
        key=jnp.asarray(z["key"]),
        frame_idx=int(z["frame_idx"]),
        n_inliers=z["stat_n_inliers"] if "stat_n_inliers" in z else None,
        n_tracks=z["stat_n_tracks"] if "stat_n_tracks" in z else None,
        pose_ok=z["stat_pose_ok"] if "stat_pose_ok" in z else None,
        refiner=refiner,
    )
