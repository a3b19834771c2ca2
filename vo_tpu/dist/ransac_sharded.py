"""Hypothesis-parallel RANSAC over a device mesh.

SURVEY §2.3: correspondences are REPLICATED across the mesh's "model" axis,
the hypothesis batch is SHARDED (each device draws its own minimal samples
from a per-device PRNG fold), winners are reduced with one all_gather +
argmin — collectives ride ICI, the scoring matmul stays local. Refinement of
the single winner is replicated (cheap, keeps every device's copy of the
pose bit-identical).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RansacConfig
from ..geom.camera import StereoCalib
from ..pose.ransac import PoseEstimate, best_hypothesis, finalize_pose


def estimate_world_pose_sharded(
    px2d: jnp.ndarray,
    pts3d: jnp.ndarray,
    mask: jnp.ndarray,
    calib: StereoCalib,
    cfg: RansacConfig,
    key: jax.Array,
    mesh: Mesh,
    axis: str = "model",
) -> PoseEstimate:
    """Same contract as pose.ransac.estimate_world_pose, hypothesis-sharded."""
    n_shards = mesh.shape[axis]
    per_shard = max(1, cfg.n_hypotheses // n_shards)

    def local(px2d_, pts3d_, mask_, key_):
        shard = jax.lax.axis_index(axis)
        k = jax.random.fold_in(key_, shard)
        R, t, score, any_valid = best_hypothesis(
            px2d_, pts3d_, mask_, calib, cfg, k, n_hypotheses=per_shard
        )
        # Reduce winners across the axis: gather each shard's champion.
        scores = jax.lax.all_gather(score, axis)  # [S]
        Rs = jax.lax.all_gather(R, axis)  # [S, 3, 3]
        ts = jax.lax.all_gather(t, axis)  # [S, 3]
        valids = jax.lax.all_gather(any_valid, axis)  # [S]
        best = jnp.argmin(jnp.where(valids, scores, jnp.inf))
        return Rs[best], ts[best], jnp.any(valids)

    # Replicate inputs along the hypothesis axis; outputs replicated.
    specs = P()  # fully replicated arrays
    local_sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(specs, specs, specs, specs),
        out_specs=(specs, specs, specs),
        check_vma=False,
    )
    R_best, t_best, any_valid = local_sharded(px2d, pts3d, mask, key)
    return finalize_pose(R_best, t_best, any_valid, px2d, pts3d, mask, calib, cfg)
