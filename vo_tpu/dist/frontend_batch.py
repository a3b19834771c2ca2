"""Frame-parallel front-end: detect/describe/match over a sharded frame batch.

SURVEY §2.3 "Data/frame parallelism": the front-end is embarrassingly
parallel across frames, so a [B, H, W] stereo batch is sharded on the mesh's
"data" axis and the whole vmapped detector runs under one pjit — XLA inserts
no collectives at all (purely local), which is the point: ICI is saved for
the RANSAC/BA reductions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MatcherConfig, SIFTConfig
from ..frontend.sift import Features, detect_and_describe
from ..frontend.track import StereoFeatures, stereo_features


def detect_batch(imgs: jnp.ndarray, cfg: SIFTConfig, mesh: Mesh, axis: str = "data") -> Features:
    """[B, H, W] frame batch -> batched Features, sharded on ``axis``."""
    shard = NamedSharding(mesh, P(axis))
    fn = jax.vmap(lambda im: detect_and_describe(im, cfg))
    return jax.jit(fn, in_shardings=shard, out_shardings=shard)(imgs)


def stereo_batch(
    left: jnp.ndarray,
    right: jnp.ndarray,
    sift_cfg: SIFTConfig,
    match_cfg: MatcherConfig,
    capacity: int,
    mesh: Mesh,
    axis: str = "data",
) -> StereoFeatures:
    """Batched detect + stereo-match (VO.m:79-87 over B frames at once)."""
    shard = NamedSharding(mesh, P(axis))

    def one(l, r):
        fl = detect_and_describe(l, sift_cfg)
        fr = detect_and_describe(r, sift_cfg)
        return stereo_features(fl, fr, match_cfg, capacity)

    fn = jax.vmap(one)
    return jax.jit(fn, in_shardings=(shard, shard), out_shardings=shard)(left, right)
