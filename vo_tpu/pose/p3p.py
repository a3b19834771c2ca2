"""Batched P3P minimal solver (Grunert's quartic) + quartic root finder.

Replaces the P3P core of MATLAB ``estworldpose`` (VO.m:123-127; README.md:30
names P3P). TPU-first: the classical eigen-decomposition route for quartic
roots (companion matrix) needs nonsymmetric eig, which TPUs don't support, so
roots come from Ferrari's closed form evaluated in f32 with a fixed number of
Newton polish steps and a validity mask per root — RANSAC tolerates masked-out
hypotheses, so numerical edge cases cost recall, not correctness. Everything
is vmapped over the hypothesis axis; no data-dependent shapes.

Formulation (Grunert 1841, as in Haralick et al. 1994 "Review and Analysis of
Solutions of the Three Point Perspective Pose Estimation Problem"): with
distances s1, s2=u*s1, s3=v*s1 from the camera center to the 3 world points,
elimination yields a quartic in v; u and s1 follow in closed form; the rigid
pose is then the Kabsch alignment of the world triangle onto the recovered
camera-frame triangle.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import se3


def _cbrt(x):
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def solve_quartic(c4, c3, c2, c1, c0, polish_iters: int = 8):
    """Real roots of c4 x^4 + ... + c0 (batched scalars) -> (roots [..., 4], valid [..., 4]).

    Ferrari resolvent-cubic factorization + Newton polish. Complex root pairs
    are masked invalid. Leading-coefficient ~0 (degenerate) masks everything.
    """
    eps = 1e-12
    lead_ok = jnp.abs(c4) > 1e-10
    c4s = jnp.where(lead_ok, c4, 1.0)
    b, c, d, e = c3 / c4s, c2 / c4s, c1 / c4s, c0 / c4s
    # Depressed quartic y^4 + p y^2 + q y + r with x = y - b/4.
    b2 = b * b
    p = c - 3.0 * b2 / 8.0
    q = d - b * c / 2.0 + b2 * b / 8.0
    r = e - b * d / 4.0 + b2 * c / 16.0 - 3.0 * b2 * b2 / 256.0
    # Resolvent cubic: z^3 - p z^2 - 4 r z + (4 p r - q^2) = 0. Find its
    # largest real root via the trigonometric method.
    a2 = -p
    a1 = -4.0 * r
    a0 = 4.0 * p * r - q * q
    # Depressed cubic t^3 + P t + Q, z = t - a2/3.
    P = a1 - a2 * a2 / 3.0
    Q = 2.0 * a2**3 / 27.0 - a2 * a1 / 3.0 + a0
    disc = (Q / 2.0) ** 2 + (P / 3.0) ** 3
    # disc > 0: one real root (Cardano); disc <= 0: three real (trig), take max.
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_card = _cbrt(-Q / 2.0 + sq) + _cbrt(-Q / 2.0 - sq)
    m = jnp.sqrt(jnp.maximum(-P / 3.0, eps))
    acos_arg = jnp.clip(3.0 * Q / (2.0 * P * m + jnp.where(jnp.abs(P) < eps, eps, 0.0)), -1.0, 1.0)
    theta = jnp.arccos(acos_arg) / 3.0
    t_trig = 2.0 * m * jnp.cos(theta)  # largest of the three
    t0 = jnp.where(disc > 0, t_card, t_trig)
    z0 = t0 - a2 / 3.0
    # Factor into two quadratics: y^2 +- s y + (z0/2 -+ q/(2 s)), s = sqrt(z0 - p).
    s2_ = z0 - p
    s_ok = s2_ > eps
    s = jnp.sqrt(jnp.maximum(s2_, eps))
    # When s ~ 0 (biquadratic case), fall back to y^2 = (-p +- sqrt(p^2-4r))/2.
    t1 = z0 / 2.0 - q / (2.0 * s)
    t2 = z0 / 2.0 + q / (2.0 * s)
    d1 = s * s - 4.0 * t1
    d2 = s * s - 4.0 * t2
    rt1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    rt2 = jnp.sqrt(jnp.maximum(d2, 0.0))
    y_roots = jnp.stack(
        [(-s + rt1) / 2.0, (-s - rt1) / 2.0, (s + rt2) / 2.0, (s - rt2) / 2.0], axis=-1
    )
    valid = jnp.stack([d1 >= 0, d1 >= 0, d2 >= 0, d2 >= 0], axis=-1)
    # Biquadratic fallback.
    bq_disc = p * p - 4.0 * r
    bq_ok = bq_disc >= 0
    bq_sq = jnp.sqrt(jnp.maximum(bq_disc, 0.0))
    y1sq = (-p + bq_sq) / 2.0
    y2sq = (-p - bq_sq) / 2.0
    bq_roots = jnp.stack(
        [
            jnp.sqrt(jnp.maximum(y1sq, 0.0)),
            -jnp.sqrt(jnp.maximum(y1sq, 0.0)),
            jnp.sqrt(jnp.maximum(y2sq, 0.0)),
            -jnp.sqrt(jnp.maximum(y2sq, 0.0)),
        ],
        axis=-1,
    )
    bq_valid = jnp.stack([y1sq >= 0, y1sq >= 0, y2sq >= 0, y2sq >= 0], axis=-1) & bq_ok[..., None]
    use_bq = ~s_ok
    y_roots = jnp.where(use_bq[..., None], bq_roots, y_roots)
    valid = jnp.where(use_bq[..., None], bq_valid, valid)
    roots = y_roots - (b / 4.0)[..., None]
    valid &= lead_ok[..., None]

    # Newton polish on the ORIGINAL quartic (recovers f32 accuracy).
    def poly(x):
        return (((c4[..., None] * x + c3[..., None]) * x + c2[..., None]) * x + c1[..., None]) * x + c0[..., None]

    def dpoly(x):
        return ((4.0 * c4[..., None] * x + 3.0 * c3[..., None]) * x + 2.0 * c2[..., None]) * x + c1[..., None]

    def body(_, x):
        f = poly(x)
        df = dpoly(x)
        return x - f / jnp.where(jnp.abs(df) < eps, jnp.where(df < 0, -eps, eps), df)

    roots = jax.lax.fori_loop(0, polish_iters, body, roots)
    # Reject roots that didn't converge to the polynomial.
    scale = 1.0 + jnp.abs(c0[..., None]) + jnp.abs(c4[..., None])
    valid &= jnp.abs(poly(roots)) < 1e-3 * scale
    return roots, valid


def _align_triads(src: jnp.ndarray, dst: jnp.ndarray):
    """Exact rigid alignment of 3 corresponding points: dst = R @ src + t.

    src, dst: [..., 3, 3] (three points, xyz). Builds the orthonormal triad
    (edge, in-plane normal component, cross) of each triangle and composes
    R = T_dst @ T_src^T — exact when the correspondences are consistent
    (the P3P case), no SVD. Returns (R [..., 3, 3], t [..., 3], ok [...]),
    ok False for degenerate (collinear / coincident) triangles.
    """

    def triad(p):
        e1 = p[..., 1, :] - p[..., 0, :]
        e2 = p[..., 2, :] - p[..., 0, :]
        n1 = jnp.linalg.norm(e1, axis=-1, keepdims=True)
        u1 = e1 / jnp.maximum(n1, 1e-12)
        e2p = e2 - jnp.sum(e2 * u1, axis=-1, keepdims=True) * u1
        n2 = jnp.linalg.norm(e2p, axis=-1, keepdims=True)
        u2 = e2p / jnp.maximum(n2, 1e-12)
        u3 = jnp.cross(u1, u2)
        ok = (n1[..., 0] > 1e-9) & (n2[..., 0] > 1e-9)
        return jnp.stack([u1, u2, u3], axis=-1), ok  # columns = basis

    Ts, ok_s = triad(src)
    Td, ok_d = triad(dst)
    R = jnp.einsum("...ij,...kj->...ik", Td, Ts)  # Td @ Ts^T
    mu_s = jnp.mean(src, axis=-2)
    mu_d = jnp.mean(dst, axis=-2)
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s)
    return R, t, ok_s & ok_d


class P3PSolutions(NamedTuple):
    """Up to 4 poses per problem. T_w2c maps world -> camera."""

    R_w2c: jnp.ndarray  # [..., 4, 3, 3]
    t_w2c: jnp.ndarray  # [..., 4, 3]
    valid: jnp.ndarray  # [..., 4]


def p3p_grunert(bearings: jnp.ndarray, pts_world: jnp.ndarray) -> P3PSolutions:
    """Solve P3P for [..., 3, 3] unit bearings and [..., 3, 3] world points."""
    f1, f2, f3 = bearings[..., 0, :], bearings[..., 1, :], bearings[..., 2, :]
    P1, P2, P3 = pts_world[..., 0, :], pts_world[..., 1, :], pts_world[..., 2, :]
    a2 = jnp.sum((P2 - P3) ** 2, axis=-1)  # side a opposite vertex 1
    b2 = jnp.sum((P1 - P3) ** 2, axis=-1)
    c2 = jnp.sum((P1 - P2) ** 2, axis=-1)
    cos_a = jnp.sum(f2 * f3, axis=-1)
    cos_b = jnp.sum(f1 * f3, axis=-1)
    cos_g = jnp.sum(f1 * f2, axis=-1)
    b2s = jnp.where(b2 < 1e-12, 1.0, b2)
    deg = (b2 < 1e-12) | (a2 < 1e-12) | (c2 < 1e-12)
    acb = (a2 - c2) / b2s  # (a^2 - c^2) / b^2
    apb = (a2 + c2) / b2s
    # Grunert quartic coefficients (Haralick et al. 1994, eq. for v).
    A4 = (acb - 1.0) ** 2 - 4.0 * (c2 / b2s) * cos_a**2
    A3 = 4.0 * (
        acb * (1.0 - acb) * cos_b
        - (1.0 - apb) * cos_a * cos_g
        + 2.0 * (c2 / b2s) * cos_a**2 * cos_b
    )
    A2 = 2.0 * (
        acb**2
        - 1.0
        + 2.0 * acb**2 * cos_b**2
        + 2.0 * ((b2 - c2) / b2s) * cos_a**2
        - 4.0 * apb * cos_a * cos_b * cos_g
        + 2.0 * ((b2 - a2) / b2s) * cos_g**2
    )
    A1 = 4.0 * (
        -acb * (1.0 + acb) * cos_b
        + 2.0 * (a2 / b2s) * cos_g**2 * cos_b
        - (1.0 - apb) * cos_a * cos_g
    )
    A0 = (1.0 + acb) ** 2 - 4.0 * (a2 / b2s) * cos_g**2
    v, v_ok = solve_quartic(A4, A3, A2, A1, A0)  # [..., 4]
    v_ok &= v > 1e-6  # distances must be positive
    # u from v (Haralick): u = ((-1 + acb) v^2 - 2 acb cos_b v + 1 + acb) / (2 (cos_g - v cos_a))
    denom = 2.0 * (cos_g[..., None] - v * cos_a[..., None])
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    u = ((-1.0 + acb[..., None]) * v * v - 2.0 * acb[..., None] * cos_b[..., None] * v + 1.0 + acb[..., None]) / denom
    u_ok = u > 1e-6
    s1sq = b2s[..., None] / jnp.maximum(1.0 + v * v - 2.0 * v * cos_b[..., None], 1e-12)
    s1 = jnp.sqrt(s1sq)
    s2 = u * s1
    s3 = v * s1
    # Camera-frame points per root: [..., 4, 3, 3]
    cam_pts = jnp.stack(
        [
            s1[..., None] * f1[..., None, :],
            s2[..., None] * f2[..., None, :],
            s3[..., None] * f3[..., None, :],
        ],
        axis=-2,
    )
    world_pts = jnp.broadcast_to(pts_world[..., None, :, :], cam_pts.shape)
    # Rigid alignment world -> camera per root. The three correspondences are
    # exact by construction (camera points are distances along the bearings),
    # so an orthonormal-triad alignment is exact — and unlike Kabsch it needs
    # no batched 3x3 SVD, which lowers to an iterative loop that dominated
    # RANSAC time on TPU (measured 15.7 ms of a 16.6 ms estimate).
    R, t, tri_ok = _align_triads(world_pts, cam_pts)
    valid = v_ok & u_ok & ~deg[..., None] & tri_ok
    # Verify the alignment actually reproduces the bearings (kills wrong roots
    # from polish failures / reflections).
    pred = jnp.einsum("...rij,...rnj->...rni", R, world_pts) + t[..., None, :]
    pred_n = pred / (jnp.linalg.norm(pred, axis=-1, keepdims=True) + 1e-12)
    bear_n = jnp.broadcast_to(bearings[..., None, :, :], pred_n.shape)
    align = jnp.sum(pred_n * bear_n, axis=-1)  # cos of angular error
    valid &= jnp.all(align > 0.9999, axis=-1) | jnp.zeros_like(valid)  # ~0.8 deg
    return P3PSolutions(R_w2c=R, t_w2c=t, valid=valid)
