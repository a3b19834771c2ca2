"""Batched two-view triangulation.

Replaces MATLAB ``triangulate`` and the reference's scalar per-point loop
(VO.m:113-116; also CreateLandmarksFromFeatures.m:7). The MATLAB built-in
solves the homogeneous DLT system per point; here ALL points are solved at
once as one batched 4x4 symmetric eigenproblem — no per-point host loop, and
the whole thing jits onto the TPU.

Two paths:
- ``triangulate_dlt``: general two-projection-matrix DLT (matches the MATLAB
  semantics; works for any P1/P2).
- ``triangulate_rectified``: closed-form disparity inversion for rectified
  stereo (exact for KITTI's P0/P1; much cheaper — pure elementwise VPU work).
"""
from __future__ import annotations

import jax.numpy as jnp

from .camera import StereoCalib


def _dlt_rows(P: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Two DLT rows per point: [N, 2, 4]. px: [N, 2], P: [3, 4]."""
    u = px[..., 0:1]
    v = px[..., 1:2]
    r0 = u * P[2] - P[0]
    r1 = v * P[2] - P[1]
    return jnp.stack([r0, r1], axis=-2)


def _normalizer(P: jnp.ndarray) -> jnp.ndarray:
    """Conditioning transform N ~ K^-1 (zero skew) so DLT rows are O(1) in f32."""
    fu, fv = P[0, 0], P[1, 1]
    cu, cv = P[0, 2], P[1, 2]
    z = jnp.zeros_like(fu)
    o = jnp.ones_like(fu)
    return jnp.stack(
        [
            jnp.stack([1.0 / fu, z, -cu / fu]),
            jnp.stack([z, 1.0 / fv, -cv / fv]),
            jnp.stack([z, z, o]),
        ]
    )


def triangulate_dlt(px1: jnp.ndarray, px2: jnp.ndarray, P1: jnp.ndarray, P2: jnp.ndarray) -> jnp.ndarray:
    """Triangulate [N, 2] pixel pairs through [3, 4] P1/P2 -> [N, 3].

    Intrinsic-normalized DLT: pixels and projections are premultiplied by
    ~K^-1 so the linear system is well-conditioned in f32, then the
    inhomogeneous 3-unknown least-squares system is solved per point as one
    batched 3x3 solve (no per-point loop; all einsum/solve, TPU-friendly).
    """
    out = []
    rows = []
    for P, px in ((P1, px1), (P2, px2)):
        N = _normalizer(P)
        Pn = N @ P
        ph = jnp.concatenate([px, jnp.ones_like(px[..., :1])], axis=-1)
        pn = jnp.einsum("ij,...j->...i", N, ph)
        rows.append(_dlt_rows(Pn, pn[..., :2] / pn[..., 2:3]))
    A = jnp.concatenate(rows, axis=-2)  # [N, 4, 4]
    M = A[..., :3]
    b = -A[..., 3]
    AtA = jnp.einsum("...ki,...kj->...ij", M, M)
    Atb = jnp.einsum("...ki,...k->...i", M, b)
    eye = jnp.eye(3, dtype=AtA.dtype) * 1e-10
    return jnp.linalg.solve(AtA + eye, Atb[..., None])[..., 0]


def triangulate_rectified(px_l: jnp.ndarray, px_r: jnp.ndarray, calib: StereoCalib) -> jnp.ndarray:
    """Closed-form rectified-stereo triangulation: z = f*B/disparity.

    Exact for KITTI's rectified pair (calib.txt P0/P1). Returns [N, 3] in the
    LEFT camera frame. Non-positive disparities produce large/invalid depths;
    callers gate on depth (the reference gates 0 < z <= 80,
    CreateLandmarksFromFeatures.m:9-15).
    """
    disparity = px_l[..., 0] - px_r[..., 0]
    z = calib.fu * calib.baseline / jnp.where(disparity <= 0, jnp.inf, disparity)
    x = (px_l[..., 0] - calib.cu) / calib.fu * z
    y = (px_l[..., 1] - calib.cv) / calib.fv * z
    return jnp.stack([x, y, z], axis=-1)
