"""Distributed sliding-window BA: landmark blocks sharded over the mesh.

SURVEY §2.3 "Sharded map store + distributed sliding-window BA": keyframe
poses are REPLICATED, the landmark axis M (and the [K, M] observation grid
with it) is SHARDED over the "model" axis. ba.window is written so every
cross-landmark contraction (U, g_p, the Schur correction S, its rhs, the
costs) is a single einsum reduced with ``psum`` when given an axis name —
so the distributed solver is literally ``shard_map(solve_window)``: the
camera system assembly rides ICI, the landmark back-substitution stays
local to each shard.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..ba.window import BAProblem, BAResult, solve_window
from ..config import BAConfig
from ..geom.camera import StereoCalib


def solve_window_sharded(
    prob: BAProblem,
    calib: StereoCalib,
    cfg: BAConfig,
    mesh: Mesh,
    axis: str = "model",
) -> BAResult:
    """Same contract as ba.window.solve_window; M must divide mesh.shape[axis]."""
    M = prob.X.shape[0]
    n = mesh.shape[axis]
    if M % n != 0:
        raise ValueError(f"landmark capacity {M} not divisible by {n} shards")

    in_specs = BAProblem(
        T_c2w=P(),  # replicated poses
        X=P(axis),  # sharded landmarks
        obs_uv=P(None, axis),  # [K, M, 2] sharded on M
        obs_mask=P(None, axis),
        obs_ur=P(None, axis),
        obs_ur_mask=P(None, axis),
        X_mask=P(axis),
        kf_mask=P(),
    )
    out_specs = BAResult(T_c2w=P(), X=P(axis), cost0=P(), cost=P(), n_obs=P())

    fn = jax.shard_map(
        lambda p: solve_window(p, calib, cfg, axis_name=axis),
        mesh=mesh,
        in_specs=(in_specs,),
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(prob)
