"""SE(3) rigid-transform algebra as pure JAX.

Replaces MATLAB's ``rigidtform3d`` type and its uses in the reference:
pose composition ``pose.A * rel_pose.A`` (VO.m:130), point transform
``pose.transformPointsForward`` (CreateLandmarksFromFeatures.m:17).

Representation: 4x4 homogeneous matrices ``T`` with ``T = [[R, t], [0, 1]]``
mapping *local* points to *parent* points: ``x_parent = R @ x_local + t``.
This matches MATLAB's camera-pose convention where ``transformPointsForward``
maps camera-frame points into the world frame.

All functions broadcast over leading batch dimensions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# All operands here are <=4x4: full f32 MXU precision is free, and pose
# chaining (VO.m:130) degrades visibly at the TPU default bf16 passes.
_PREC = jax.lax.Precision.HIGHEST


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build [..., 4, 4] transform from [..., 3, 3] rotation and [..., 3] translation."""
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=top.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A then-apply B in A's frame: returns A @ B (matches VO.m:130 pose.A * rel_pose.A)."""
    return jnp.matmul(A, B, precision=_PREC)


def inv(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse (exploits orthonormal R; no linear solve)."""
    R = rotation(T)
    t = translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision=_PREC))


def apply(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Transform [..., N, 3] points by [..., 4, 4] (x_out = R x + t)."""
    R = rotation(T)
    t = translation(T)
    return jnp.einsum("...ij,...nj->...ni", R, pts, precision=_PREC) + t[..., None, :]


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: [..., 3] -> [..., 3, 3] skew matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation. Safe at theta=0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    # Taylor-safe coefficients.
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    W2 = jnp.matmul(W, W, precision=_PREC)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues: [..., 3, 3] -> [..., 3]. Safe near theta=0 and pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    # Antisymmetric part -> axis * 2 sin(theta)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # atan2 formulation: differentiable at theta=0 (arccos' blows up there,
    # which poisons jacfwd through pose-graph residuals with NaNs).
    sin_theta = 0.5 * jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-32)
    theta = jnp.arctan2(sin_theta, cos_theta)
    small = theta < 1e-4
    # Near pi the antisymmetric part vanishes; use diagonal formula.
    near_pi = theta > jnp.pi - 1e-3
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_theta + 1e-32))
    w_generic = v * scale[..., None]
    # theta ~ pi branch: axis from diagonal of (R + I)/2 = aa^T-ish
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag + 1.0) / 2.0, 0.0, 1.0)
    axis = jnp.sqrt(axis2)
    # Fix signs using off-diagonal terms (largest-axis heuristic).
    sx = jnp.sign(jnp.where(v[..., 0] == 0, 1.0, v[..., 0]))
    sy = jnp.sign(R[..., 0, 1]) * sx
    sz = jnp.sign(R[..., 0, 2]) * sx
    axis = axis * jnp.stack([sx, sy, sz], axis=-1)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-32)
    w_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential. xi = [..., 6] = (v, w) with translation part v first."""
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    small = theta2 < 1e-8
    R = exp_so3(w)
    W = hat(w)
    W2 = jnp.matmul(W, W, precision=_PREC)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v, precision=_PREC)
    return from_rt(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm -> [..., 6] = (v, w)."""
    R = rotation(T)
    t = translation(T)
    w = log_so3(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    small = theta2 < 1e-8
    W = hat(w)
    W2 = jnp.matmul(W, W, precision=_PREC)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - theta sin/(2(1-cos))) W^2
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - theta * jnp.sin(theta) / (2.0 * (1.0 - jnp.cos(theta)) + 1e-32)) / (theta2 + 1e-32),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, t, precision=_PREC)
    return jnp.concatenate([v, w], axis=-1)


def orthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project [..., 3, 3] onto SO(3) via SVD (det +1 enforced)."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(jnp.matmul(U, Vt, precision=_PREC))
    S = jnp.ones(R.shape[:-2] + (3,), dtype=R.dtype).at[..., 2].set(det)
    return jnp.einsum("...ik,...k,...kj->...ij", U, S, Vt, precision=_PREC)


def kabsch(src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray | None = None):
    """Weighted rigid alignment: returns (R, t) with dst ~ R @ src + t.

    src, dst: [..., N, 3]; weights: [..., N] nonneg. Used by P3P to lift
    recovered camera-frame points onto the world points (pose/p3p.py).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    wsum = jnp.sum(weights, axis=-1, keepdims=True) + 1e-32
    wn = weights / wsum
    mu_s = jnp.einsum("...n,...ni->...i", wn, src, precision=_PREC)
    mu_d = jnp.einsum("...n,...ni->...i", wn, dst, precision=_PREC)
    s = src - mu_s[..., None, :]
    d = dst - mu_d[..., None, :]
    H = jnp.einsum("...n,...ni,...nj->...ij", wn, s, d, precision=_PREC)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", jnp.swapaxes(Vt, -1, -2), jnp.swapaxes(U, -1, -2), precision=_PREC))
    S = jnp.ones(H.shape[:-2] + (3,), dtype=H.dtype).at[..., 2].set(det)
    R = jnp.einsum("...ji,...j,...kj->...ik", Vt, S, U, precision=_PREC)  # V diag(S) U^T
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s, precision=_PREC)
    return R, t
