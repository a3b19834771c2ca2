"""Pose-graph optimization over keyframes — pure JAX Gauss-Newton on SE(3).

North-star extension (SURVEY §2.3/§7.6): the reference chains relative poses
with no correction (VO.m:130). Here keyframe poses are refined against a
fixed-capacity set of relative-pose constraints (odometry edges + optional
loop-closure edges), which bounds drift growth along the trajectory.

Design: residual of edge (i, j, Z_ij) is log(Z_ij^{-1} · T_i^{-1} · T_j) ∈ R⁶.
Jacobians come from jax.jacfwd of the edge residual w.r.t. the two twist
increments — 6x6 blocks, assembled into a dense 6K x 6K system (K keyframes,
K ~ tens). Fixed iteration count, first pose anchored. Everything jittable
with static shapes; edges are padded with a mask.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import se3


class PoseGraph(NamedTuple):
    T_c2w: jnp.ndarray  # [K, 4, 4] keyframe poses (initial)
    edge_i: jnp.ndarray  # [E] int32 source keyframe index
    edge_j: jnp.ndarray  # [E] int32 target keyframe index
    edge_T: jnp.ndarray  # [E, 4, 4] measured relative pose T_i^{-1} T_j
    edge_mask: jnp.ndarray  # [E] validity
    edge_weight: jnp.ndarray  # [E] scalar information weight


class PoseGraphResult(NamedTuple):
    T_c2w: jnp.ndarray
    cost0: jnp.ndarray
    cost: jnp.ndarray


def _edge_residual(xi_i, xi_j, T_i, T_j, Z):
    """r = log(Z^{-1} (exp(xi_i) T_i)^{-1} (exp(xi_j) T_j)) — [6]."""
    Ti = se3.compose(se3.exp(xi_i), T_i)
    Tj = se3.compose(se3.exp(xi_j), T_j)
    return se3.log(se3.compose(se3.inv(Z), se3.compose(se3.inv(Ti), Tj)))


def _residuals_and_jac(T, g: PoseGraph):
    Ti = jnp.take(T, g.edge_i, axis=0)
    Tj = jnp.take(T, g.edge_j, axis=0)
    z6 = jnp.zeros((g.edge_i.shape[0], 6), T.dtype)
    r = jax.vmap(_edge_residual)(z6, z6, Ti, Tj, g.edge_T)  # [E, 6]
    Ji = jax.vmap(jax.jacfwd(_edge_residual, argnums=0))(z6, z6, Ti, Tj, g.edge_T)
    Jj = jax.vmap(jax.jacfwd(_edge_residual, argnums=1))(z6, z6, Ti, Tj, g.edge_T)
    return r, Ji, Jj  # [E,6], [E,6,6], [E,6,6]


def optimize(g: PoseGraph, iters: int = 10, damping: float = 1e-6) -> PoseGraphResult:
    """Fixed-iteration damped GN. First keyframe anchored (gauge)."""
    with jax.default_matmul_precision("float32"):
        return _optimize_impl(g, iters, damping)


def _optimize_impl(g: PoseGraph, iters: int, damping: float) -> PoseGraphResult:
    # (full-precision context set by optimize: 6x6/SE3 contractions only)
    K = g.T_c2w.shape[0]
    w = jnp.where(g.edge_mask, g.edge_weight, 0.0)

    def cost_of(T):
        Ti = jnp.take(T, g.edge_i, axis=0)
        Tj = jnp.take(T, g.edge_j, axis=0)
        z6 = jnp.zeros((g.edge_i.shape[0], 6), T.dtype)
        r = jax.vmap(_edge_residual)(z6, z6, Ti, Tj, g.edge_T)
        return jnp.sum(w * jnp.sum(r * r, axis=-1))

    def gn_step(carry, _):
        T, lam = carry
        r, Ji, Jj = _residuals_and_jac(T, g)
        # Assemble H (6K x 6K) and b by scatter-add over the two endpoints.
        H = jnp.zeros((K, 6, K, 6), T.dtype)
        b = jnp.zeros((K, 6), T.dtype)
        Jiw = Ji * w[:, None, None]
        Jjw = Jj * w[:, None, None]
        H = H.at[g.edge_i, :, g.edge_i, :].add(jnp.einsum("eab,eac->ebc", Jiw, Ji))
        H = H.at[g.edge_j, :, g.edge_j, :].add(jnp.einsum("eab,eac->ebc", Jjw, Jj))
        Hij = jnp.einsum("eab,eac->ebc", Jiw, Jj)
        H = H.at[g.edge_i, :, g.edge_j, :].add(Hij)
        H = H.at[g.edge_j, :, g.edge_i, :].add(jnp.swapaxes(Hij, -1, -2))
        b = b.at[g.edge_i].add(-jnp.einsum("eab,ea->eb", Jiw, r))
        b = b.at[g.edge_j].add(-jnp.einsum("eab,ea->eb", Jjw, r))
        eye6 = jnp.eye(6, dtype=T.dtype)
        # Anchor the gauge (node 0) AND every edge-less node: padded node
        # slots otherwise leave ~zero diagonal blocks that wreck the f32 LU
        # solve (dxi -> inf/NaN -> every GN step rejected).
        deg = (
            jnp.zeros((K,), T.dtype)
            .at[g.edge_i]
            .add(jnp.where(g.edge_mask, 1.0, 0.0))
            .at[g.edge_j]
            .add(jnp.where(g.edge_mask, 1.0, 0.0))
        )
        anchor = jnp.where(
            (jnp.arange(K) == 0) | (deg == 0), jnp.asarray(1e6, T.dtype), 0.0
        )
        # Adaptive LM damping: a full GN step can overshoot badly on SE(3)
        # (loop residuals of ~1 m / ~1 rad); without raising lambda on
        # reject the scan re-proposes the identical step forever.
        Hd = H.at[jnp.arange(K), :, jnp.arange(K), :].add(
            (anchor + lam)[:, None, None] * eye6
        )
        dxi = jnp.linalg.solve(Hd.reshape(6 * K, 6 * K), b.reshape(6 * K)).reshape(K, 6)
        T_try = jnp.einsum("kij,kjl->kil", jax.vmap(se3.exp)(dxi), T)
        cost_try = cost_of(T_try)
        better = cost_try < cost_of(T)
        T_new = jnp.where(better, T_try, T)
        lam_new = jnp.where(better, jnp.maximum(lam * 0.3, 1e-8), lam * 10.0)
        return (T_new, lam_new), None

    cost0 = cost_of(g.T_c2w)
    (T, _), _ = jax.lax.scan(
        gn_step, (g.T_c2w, jnp.asarray(max(damping, 1e-4), g.T_c2w.dtype)), None, length=iters
    )
    return PoseGraphResult(T_c2w=T, cost0=cost0, cost=cost_of(T))


def odometry_edges(T_c2w: jnp.ndarray, weight: float = 1.0):
    """Consecutive-keyframe edges from a pose chain: Z_i = T_i^{-1} T_{i+1}."""
    K = T_c2w.shape[0]
    i = jnp.arange(K - 1, dtype=jnp.int32)
    j = i + 1
    Z = jnp.einsum("kij,kjl->kil", jax.vmap(se3.inv)(T_c2w[:-1]), T_c2w[1:])
    return i, j, Z, jnp.ones(K - 1, bool), jnp.full((K - 1,), weight, T_c2w.dtype)
