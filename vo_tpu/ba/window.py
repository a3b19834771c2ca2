"""Sliding-window bundle adjustment via Schur complement — pure JAX.

North-star extension (SURVEY §7.6): the reference has NO bundle adjustment
(frame-to-frame chaining only, VO.m:130), so drift accumulates unbounded.
This module jointly refines a window of K keyframe poses and M landmarks by
damped Gauss-Newton (Levenberg-Marquardt) on the reprojection error.

TPU-first design:
- Observations live on a DENSE [K, M] grid with a validity mask — no sparse
  indexing. Every Jacobian/Hessian block is an einsum over the landmark axis,
  which is exactly the contraction the MXU wants and exactly the axis the
  distributed version shards (dist/ba_sharded.py reduces the same einsums
  with psum over landmark shards).
- The landmark block H_ll is 3x3-block-diagonal -> inverted in closed form.
- The reduced camera system S (6K x 6K; K ~ 10) is solved densely on-chip.
- Gauge freedom is fixed with a strong prior on pose 0 (the stereo baseline
  fixes scale, so one anchored pose suffices).
- The LM loop is a fixed-length ``lax.scan`` with accept/reject damping —
  no data-dependent control flow.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import BAConfig
from ..geom import se3
from ..geom.camera import StereoCalib


class BAProblem(NamedTuple):
    """Fixed-capacity window state.

    T_c2w:    [K, 4, 4] keyframe camera-to-world poses (initial estimates)
    X:        [M, 3]    world landmarks
    obs_uv:   [K, M, 2] observed left-camera pixels
    obs_mask: [K, M]    observation validity
    obs_ur:   [K, M]    observed RIGHT-camera u (rectified: v_r == v_l).
                        The stereo residual pins metric scale — left-only
                        windows are monocular SfM whose scale floats on the
                        landmark initialization.
    obs_ur_mask: [K, M] right-observation validity
    X_mask:   [M]       landmark validity
    kf_mask:  [K]       keyframe validity (unused slots frozen)
    """

    T_c2w: jnp.ndarray
    X: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_mask: jnp.ndarray
    obs_ur: jnp.ndarray
    obs_ur_mask: jnp.ndarray
    X_mask: jnp.ndarray
    kf_mask: jnp.ndarray


class BAResult(NamedTuple):
    T_c2w: jnp.ndarray  # [K, 4, 4] refined poses
    X: jnp.ndarray  # [M, 3] refined landmarks
    cost0: jnp.ndarray  # initial robust cost
    cost: jnp.ndarray  # final robust cost
    n_obs: jnp.ndarray  # active observation count


def _project_jacobians(T_w2c, X, calib: StereoCalib):
    """Residual ingredients for the full [K, M] grid, stereo observation model.

    Residual components per observation: (u_left, v_left, u_right) — the
    rectified right camera shares v and adds the disparity constraint that
    makes window scale observable. Returns (uvr_hat [K,M,3], x_cam [K,M,3],
    A [K,M,3,6], B [K,M,3,3]) with A = d(res)/d(pose twist), B = d(res)/dX.
    """
    R = T_w2c[:, :3, :3]  # [K, 3, 3]
    t = T_w2c[:, :3, 3]  # [K, 3]
    xc = jnp.einsum("kij,mj->kmi", R, X) + t[:, None, :]  # [K, M, 3]
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    xr = x - calib.baseline  # right-camera x (pure-x rectified baseline)
    u = calib.fu * x / zs + calib.cu
    v = calib.fv * y / zs + calib.cv
    ur = calib.fu * xr / zs + calib.cu
    uv = jnp.stack([u, v, ur], axis=-1)
    # dπ/dx_cam  [K, M, 3, 3]
    zero = jnp.zeros_like(x)
    Jpi = jnp.stack(
        [
            jnp.stack([calib.fu / zs, zero, -calib.fu * x / zs**2], axis=-1),
            jnp.stack([zero, calib.fv / zs, -calib.fv * y / zs**2], axis=-1),
            jnp.stack([calib.fu / zs, zero, -calib.fu * xr / zs**2], axis=-1),
        ],
        axis=-2,
    )
    # dx_cam/dξ = [I | -[x_cam]×]  (ξ = (υ, ω), T' = exp(ξ) T)
    O = jnp.zeros_like(x)
    hat = jnp.stack(
        [
            jnp.stack([O, -xc[..., 2], xc[..., 1]], axis=-1),
            jnp.stack([xc[..., 2], O, -xc[..., 0]], axis=-1),
            jnp.stack([-xc[..., 1], xc[..., 0], O], axis=-1),
        ],
        axis=-2,
    )  # [K, M, 3, 3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), hat.shape)
    Jxi = jnp.concatenate([eye, -hat], axis=-1)  # [K, M, 3, 6]
    A = jnp.einsum("kmij,kmjl->kmil", Jpi, Jxi)  # [K, M, 2, 6]
    B = jnp.einsum("kmij,kjl->kmil", Jpi, R)  # [K, M, 2, 3]
    return uv, xc, A, B


def _inv3x3(M):
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A_ = e * i - f * h
    B_ = -(d * i - f * g)
    C_ = d * h - e * g
    det = a * A_ + b * B_ + c * C_
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    adj = jnp.stack(
        [
            jnp.stack([A_, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B_, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C_, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def _robust_cost_and_weight(r2, huber2):
    """Huber: cost rho(r2), IRLS weight rho'(r)/r."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    h = jnp.sqrt(huber2)
    cost = jnp.where(r2 <= huber2, 0.5 * r2, h * (r - 0.5 * h))
    w = jnp.where(r2 <= huber2, 1.0, h / r)
    return cost, w


def _residuals(T_w2c, X, prob: BAProblem, calib, cfg: BAConfig):
    """Shared residual/weight block: (r [K,M,3], comp_w [K,M,3], cost, n_obs, A, B)."""
    uv, xc, A, B = _project_jacobians(T_w2c, X, calib)
    obs = jnp.concatenate([prob.obs_uv, prob.obs_ur[..., None]], axis=-1)
    r = uv - obs  # [K, M, 3]
    behind = xc[..., 2] <= 0.1
    mask = prob.obs_mask & prob.X_mask[None, :] & prob.kf_mask[:, None] & ~behind
    mask_r = mask & prob.obs_ur_mask
    comp_m = jnp.stack([mask, mask, mask_r], axis=-1).astype(r.dtype)  # [K, M, 3]
    r2 = jnp.sum(r * r * comp_m, axis=-1)
    cost_e, w_rob = _robust_cost_and_weight(r2, cfg.huber_px**2)
    comp_w = comp_m * jnp.where(mask, w_rob, 0.0)[..., None]  # [K, M, 3]
    cost = jnp.sum(jnp.where(mask, cost_e, 0.0))
    n_obs = jnp.sum(mask)
    return r, comp_w, cost, n_obs, A, B


def _assemble(T_w2c, X, prob: BAProblem, calib, cfg: BAConfig, axis_name=None):
    """Build Schur-reduced camera system. All landmark contractions are the
    einsums reduced with psum when ``axis_name`` names a mesh axis sharding M."""
    r, comp_w, cost, n_obs, A, B = _residuals(T_w2c, X, prob, calib, cfg)

    Aw = A * comp_w[..., None]
    # Camera diag blocks U[k] and gradient  (sum over landmarks -> psum-able)
    U = jnp.einsum("kmia,kmib->kab", Aw, A)  # [K, 6, 6]
    g_p = -jnp.einsum("kmia,kmi->ka", Aw, r)  # [K, 6]
    # Landmark blocks V[m], gradient  (sum over cameras; local per shard)
    Bw = B * comp_w[..., None]
    V = jnp.einsum("kmia,kmib->mab", Bw, B)  # [M, 3, 3]
    g_l = -jnp.einsum("kmia,kmi->ma", Bw, r)  # [M, 3]
    Wkm = jnp.einsum("kmia,kmib->kmab", Aw, B)  # [K, M, 6, 3]

    if axis_name is not None:
        cost = jax.lax.psum(cost, axis_name)
        n_obs = jax.lax.psum(n_obs, axis_name)
        U = jax.lax.psum(U, axis_name)
        g_p = jax.lax.psum(g_p, axis_name)
    return dict(U=U, g_p=g_p, V=V, g_l=g_l, Wkm=Wkm, cost=cost, n_obs=n_obs)


def _solve_schur(sys, lam, cfg: BAConfig, kf_mask, axis_name=None):
    """Schur-complement solve for (dxi [K,6], dX [M,3]) at damping lam."""
    U, g_p, V, g_l, Wkm = sys["U"], sys["g_p"], sys["V"], sys["g_l"], sys["Wkm"]
    K = U.shape[0]
    eye3 = jnp.eye(3, dtype=V.dtype)
    Vd = V + lam * (V * eye3 + 1e-6 * eye3)
    V_inv = _inv3x3(Vd)  # [M, 3, 3]

    WV = jnp.einsum("kmab,mbc->kmac", Wkm, V_inv)  # [K, M, 6, 3]
    # Off-diagonal (and diagonal) Schur correction: sum over landmarks.
    S_corr = jnp.einsum("kmac,lmbc->kalb", WV, Wkm)  # [K, 6, K, 6]
    rhs_corr = jnp.einsum("kmac,mc->ka", WV, g_l)  # [K, 6]
    if axis_name is not None:
        S_corr = jax.lax.psum(S_corr, axis_name)
        rhs_corr = jax.lax.psum(rhs_corr, axis_name)

    eye6 = jnp.eye(6, dtype=U.dtype)
    Ud = U + lam * (U * eye6 + 1e-6 * eye6)
    S = jnp.zeros((K, 6, K, 6), U.dtype)
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].set(Ud)
    S = S - S_corr
    rhs = g_p - rhs_corr
    # Gauge: anchor pose 0; freeze invalid keyframe slots.
    anchor = jnp.zeros((K,), U.dtype).at[0].set(1e8) + jnp.where(kf_mask, 0.0, 1e8)
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(anchor[:, None, None] * eye6)
    dxi = jnp.linalg.solve(S.reshape(6 * K, 6 * K), rhs.reshape(6 * K)).reshape(K, 6)
    # Back-substitute landmarks (local per shard).
    dX = jnp.einsum("mab,mb->ma", V_inv, g_l - jnp.einsum("kmab,ka->mb", Wkm, dxi))
    return dxi, dX


def _apply_update(T_w2c, X, dxi, dX):
    T_new = jnp.einsum("kij,kjl->kil", jax.vmap(se3.exp)(dxi), T_w2c)
    return T_new, X + dX


def _cost_only(T_w2c, X, prob, calib, cfg, axis_name=None):
    _, _, c, _, _, _ = _residuals(T_w2c, X, prob, calib, cfg)
    return jax.lax.psum(c, axis_name) if axis_name is not None else c


def solve_window(
    prob: BAProblem, calib: StereoCalib, cfg: BAConfig, axis_name: str | None = None
) -> BAResult:
    """LM-damped GN over the window. Jittable; shard the M axis + pass
    ``axis_name`` to run the identical code distributed (dist/ba_sharded)."""
    with jax.default_matmul_precision("float32"):
        return _solve_window_impl(prob, calib, cfg, axis_name)


def _solve_window_impl(
    prob: BAProblem, calib: StereoCalib, cfg: BAConfig, axis_name: str | None = None
) -> BAResult:
    # (full-precision context set by solve_window: the Jacobian/Schur
    # contractions are small but bf16-sensitive on world-scale coordinates)
    T_w2c0 = jax.vmap(se3.inv)(prob.T_c2w)
    cost0 = _cost_only(T_w2c0, prob.X, prob, calib, cfg, axis_name)

    # Trust-region prior toward the VO-chained initial poses (see BAConfig):
    # residual = accumulated twist from T_w2c0, Jacobian = identity per pose.
    # Added AFTER the psum'd assembly so sharded and single-device solves see
    # the identical (replicated) system.
    dt = prob.X.dtype
    w6 = jnp.concatenate(
        [jnp.full((3,), cfg.prior_t_w, dt), jnp.full((3,), cfg.prior_r_w, dt)]
    )
    kf_w = prob.kf_mask.astype(dt)[:, None]  # [K, 1] — no prior on frozen slots

    def prior_cost(acc):
        return 0.5 * jnp.sum(w6 * acc * acc * kf_w)

    def lm_step(carry, _):
        T_w2c, X, lam, cost, acc = carry
        sys = _assemble(T_w2c, X, prob, calib, cfg, axis_name)
        sys["U"] = sys["U"] + jnp.diag(w6)[None] * kf_w[..., None]
        sys["g_p"] = sys["g_p"] - w6 * acc * kf_w
        dxi, dX = _solve_schur(sys, lam, cfg, prob.kf_mask, axis_name)
        T_try, X_try = _apply_update(T_w2c, X, dxi, dX)
        acc_try = acc + dxi
        cost_try = _cost_only(T_try, X_try, prob, calib, cfg, axis_name) + prior_cost(acc_try)
        accept = cost_try < cost
        T_new = jnp.where(accept, T_try, T_w2c)
        X_new = jnp.where(accept, X_try, X)
        acc_new = jnp.where(accept, acc_try, acc)
        lam_new = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9), lam * 4.0)
        cost_new = jnp.where(accept, cost_try, cost)
        return (T_new, X_new, lam_new, cost_new, acc_new), cost_new

    acc0 = jnp.zeros((prob.T_c2w.shape[0], 6), dt)
    init = (T_w2c0, prob.X, jnp.asarray(cfg.damping, dt), cost0, acc0)
    (T_w2c, X, _, cost, _), _ = jax.lax.scan(lm_step, init, None, length=cfg.iters)
    n_obs = jnp.sum(prob.obs_mask & prob.X_mask[None, :] & prob.kf_mask[:, None])
    if axis_name is not None:
        n_obs = jax.lax.psum(n_obs, axis_name)
    return BAResult(
        T_c2w=jax.vmap(se3.inv)(T_w2c),
        X=X,
        cost0=cost0,
        cost=cost,
        n_obs=n_obs,
    )
