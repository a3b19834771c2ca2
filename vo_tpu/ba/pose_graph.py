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
    # Start lambda AT the caller's damping (no 1e-4 floor): redistributing a
    # loop correction along an n-node chain rides curvature modes with
    # eigenvalues ~O(1/n^2) (~1e-5 at n=257), and lam=1e-4 suppresses
    # exactly those modes — measured on the 4,500-frame run: 7 closures with
    # mm-accurate loop edges moved keyframe RMS by only 0.002 m. The
    # accept/reject logic already escalates lambda x10 on overshoot, so a
    # small start costs at most a few rejected steps.
    (T, _), _ = jax.lax.scan(
        gn_step, (g.T_c2w, jnp.asarray(damping, g.T_c2w.dtype)), None, length=iters
    )
    return PoseGraphResult(T_c2w=T, cost0=cost0, cost=cost_of(T))


# ---------------------------------------------------------------------------
# Host-side float64 solver for the GLOBAL loop-closure graph.
#
# Redistributing a loop correction along an n-node odometry chain rides
# curvature modes with eigenvalues ~O(1/n^2); at the reference scale
# (n=257-512 after decimation) the dense 6n x 6n system's condition number
# (~1e10 with the gauge anchor) exceeds f32 resolution, and the jitted f32
# solve above silently under-corrects: measured on the 4,500-frame KITTI 00
# run, 7 closures with mm-accurate loop edges moved keyframe RMS by 0.002 m.
# TPUs have no native f64, and this solve is (a) rare — one per accepted
# closure, cooldown-limited, (b) off the frame critical path (refiner worker
# thread), and (c) tiny (<10 GFLOP) — so the right engineering is an exact
# host solve here, keeping the jitted/sharded f32 path for the distributed
# component and its equivalence tests.
# ---------------------------------------------------------------------------


def _np_exp_so3(w):
    import numpy as np

    theta2 = (w * w).sum(-1)
    theta = np.sqrt(theta2 + 1e-300)
    a = np.where(theta2 < 1e-8, 1.0 - theta2 / 6.0, np.sin(theta) / theta)
    b = np.where(theta2 < 1e-8, 0.5 - theta2 / 24.0, (1.0 - np.cos(theta)) / np.maximum(theta2, 1e-300))
    W = np.zeros(w.shape[:-1] + (3, 3))
    W[..., 0, 1], W[..., 0, 2] = -w[..., 2], w[..., 1]
    W[..., 1, 0], W[..., 1, 2] = w[..., 2], -w[..., 0]
    W[..., 2, 0], W[..., 2, 1] = -w[..., 1], w[..., 0]
    eye = np.broadcast_to(np.eye(3), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def _np_exp_se3(xi):
    import numpy as np

    v, w = xi[..., :3], xi[..., 3:]
    theta2 = (w * w).sum(-1)
    theta = np.sqrt(theta2 + 1e-300)
    R = _np_exp_so3(w)
    W = np.zeros(w.shape[:-1] + (3, 3))
    W[..., 0, 1], W[..., 0, 2] = -w[..., 2], w[..., 1]
    W[..., 1, 0], W[..., 1, 2] = w[..., 2], -w[..., 0]
    W[..., 2, 0], W[..., 2, 1] = -w[..., 1], w[..., 0]
    b = np.where(theta2 < 1e-8, 0.5 - theta2 / 24.0, (1.0 - np.cos(theta)) / np.maximum(theta2, 1e-300))
    c = np.where(
        theta2 < 1e-8, 1.0 / 6.0 - theta2 / 120.0, (theta - np.sin(theta)) / np.maximum(theta2 * theta, 1e-300)
    )
    eye = np.broadcast_to(np.eye(3), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * (W @ W)
    T = np.zeros(xi.shape[:-1] + (4, 4))
    T[..., :3, :3] = R
    T[..., :3, 3] = np.einsum("...ij,...j->...i", V, v)
    T[..., 3, 3] = 1.0
    return T


def _np_log_se3(T):
    import numpy as np

    R = T[..., :3, :3]
    t = T[..., :3, 3]
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = np.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    vvec = np.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = 0.5 * np.sqrt((vvec * vvec).sum(-1) + 1e-300)
    theta = np.arctan2(sin_t, cos_t)
    scale = np.where(theta < 1e-4, 0.5 + theta * theta / 12.0, theta / np.maximum(2.0 * sin_t, 1e-300))
    w = vvec * scale[..., None]
    # Near theta = pi the antisymmetric part vanishes (vvec -> 0) and
    # theta/(2 sin) is ill-conditioned: an out-and-back revisit produces a
    # ~pi loop edge whose residuals/Jacobians would be garbage and the
    # closure silently lost (ADVICE r4). Recover the axis from the
    # SYMMETRIC part instead: (R + R^T)/2 = cos(t) I + (1-cos t) nn^T, so
    # the largest column of nn^T gives the axis up to sign; the (tiny but
    # sign-correct) antisymmetric vector disambiguates the sign. At exactly
    # pi both signs are valid logarithms.
    near_pi = theta > 3.0
    if np.any(near_pi):
        eye3 = np.broadcast_to(np.eye(3), R.shape)
        B = 0.5 * (R + np.swapaxes(R, -1, -2))
        nnT = (B - cos_t[..., None, None] * eye3) / np.maximum(
            (1.0 - cos_t)[..., None, None], 1e-12
        )
        diag = np.maximum(np.einsum("...ii->...i", nnT), 0.0)
        k = np.argmax(diag, axis=-1)
        ax = np.take_along_axis(nnT, k[..., None, None], axis=-1)[..., 0]
        ax = ax / np.maximum(np.linalg.norm(ax, axis=-1, keepdims=True), 1e-12)
        sign = np.where(np.einsum("...i,...i->...", ax, vvec) < 0.0, -1.0, 1.0)
        w = np.where(near_pi[..., None], theta[..., None] * ax * sign[..., None], w)
    theta2 = (w * w).sum(-1)
    W = np.zeros(w.shape[:-1] + (3, 3))
    W[..., 0, 1], W[..., 0, 2] = -w[..., 2], w[..., 1]
    W[..., 1, 0], W[..., 1, 2] = w[..., 2], -w[..., 0]
    W[..., 2, 0], W[..., 2, 1] = -w[..., 1], w[..., 0]
    coef = np.where(
        theta2 < 1e-8,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - np.sqrt(theta2) * np.sin(np.sqrt(theta2)) / np.maximum(2.0 * (1.0 - np.cos(np.sqrt(theta2))), 1e-300))
        / np.maximum(theta2, 1e-300),
    )
    eye = np.broadcast_to(np.eye(3), W.shape)
    Vinv = eye - 0.5 * W + coef[..., None, None] * (W @ W)
    v = np.einsum("...ij,...j->...i", Vinv, t)
    return np.concatenate([v, w], axis=-1)


def optimize_np(T_c2w, edge_i, edge_j, edge_T, edge_weight, iters: int = 10, damping: float = 1e-9):
    """Exact-size float64 LM on the loop-closure graph (see block comment).

    Args are plain numpy: T_c2w [n,4,4]; edge_* [E] / [E,4,4] (all edges
    valid — callers drop padding). Returns (T [n,4,4] f64, cost0, cost).
    """
    import numpy as np

    T = np.asarray(T_c2w, np.float64).copy()
    ei = np.asarray(edge_i)
    ej = np.asarray(edge_j)
    Z = np.asarray(edge_T, np.float64)
    w = np.asarray(edge_weight, np.float64)
    n = T.shape[0]
    Zinv = np.linalg.inv(Z)

    def residuals(T):
        Ti = T[ei]
        Tj = T[ej]
        return _np_log_se3(Zinv @ np.linalg.inv(Ti) @ Tj)  # [E, 6]

    def cost_of(T):
        r = residuals(T)
        with np.errstate(over="ignore", invalid="ignore"):
            c = float((w * (r * r).sum(-1)).sum())
        return c if np.isfinite(c) else np.inf  # wild trial step -> reject

    eps = 1e-7
    lam = damping
    cost = cost_of(T)
    cost0 = cost
    for _ in range(iters):
        r = residuals(T)
        # Finite-difference Jacobians of the LEFT-multiplicative increments,
        # vectorized over edges: 12 perturbed residual sweeps.
        Ji = np.zeros((r.shape[0], 6, 6))
        Jj = np.zeros((r.shape[0], 6, 6))
        Ti = T[ei]
        Tj = T[ej]
        base = Zinv @ np.linalg.inv(Ti) @ Tj
        for d in range(6):
            xi = np.zeros(6)
            xi[d] = eps
            E = _np_exp_se3(xi)
            r_i = _np_log_se3(Zinv @ np.linalg.inv(E[None] @ Ti) @ Tj)
            r_j = _np_log_se3(base @ np.linalg.inv(Tj) @ (E[None] @ Tj))
            Ji[:, :, d] = (r_i - r) / eps
            Jj[:, :, d] = (r_j - r) / eps
        H = np.zeros((n, 6, n, 6))
        b = np.zeros((n, 6))
        Jiw = Ji * w[:, None, None]
        Jjw = Jj * w[:, None, None]
        np.add.at(H, (ei, slice(None), ei, slice(None)), np.einsum("eab,eac->ebc", Jiw, Ji))
        np.add.at(H, (ej, slice(None), ej, slice(None)), np.einsum("eab,eac->ebc", Jjw, Jj))
        Hij = np.einsum("eab,eac->ebc", Jiw, Jj)
        np.add.at(H, (ei, slice(None), ej, slice(None)), Hij)
        np.add.at(H, (ej, slice(None), ei, slice(None)), np.swapaxes(Hij, -1, -2))
        np.add.at(b, ei, -np.einsum("eab,ea->eb", Jiw, r))
        np.add.at(b, ej, -np.einsum("eab,ea->eb", Jjw, r))
        Hm = H.reshape(6 * n, 6 * n)
        # Gauge: node 0 anchored by penalty (f64 makes the conditioning moot).
        diag = np.zeros(n)
        diag[0] = 1e9
        for k in range(n):
            Hm[6 * k : 6 * k + 6, 6 * k : 6 * k + 6] += (diag[k] + lam) * np.eye(6)
        try:
            dxi = np.linalg.solve(Hm, b.reshape(-1)).reshape(n, 6)
        except np.linalg.LinAlgError:
            lam = max(lam * 10.0, 1e-6)
            continue
        T_try = _np_exp_se3(dxi) @ T
        c_try = cost_of(T_try)
        if c_try < cost:
            T, cost = T_try, c_try
            lam = max(lam * 0.3, 1e-12)
            if cost0 > 0 and cost < 1e-10 * max(cost0, 1.0):
                break
        else:
            lam = max(lam * 10.0, 1e-9)
    return T, cost0, cost


def odometry_edges(T_c2w: jnp.ndarray, weight: float = 1.0):
    """Consecutive-keyframe edges from a pose chain: Z_i = T_i^{-1} T_{i+1}."""
    K = T_c2w.shape[0]
    i = jnp.arange(K - 1, dtype=jnp.int32)
    j = i + 1
    Z = jnp.einsum("kij,kjl->kil", jax.vmap(se3.inv)(T_c2w[:-1]), T_c2w[1:])
    return i, j, Z, jnp.ones(K - 1, bool), jnp.full((K - 1,), weight, T_c2w.dtype)
