"""Pinhole / rectified-stereo camera model.

Replaces the reference's ad-hoc intrinsics extraction from KITTI projection
matrices (VO.m:23-51) and MATLAB's ``cameraIntrinsics`` (VO.m:50-51).

KITTI odometry calibration: each camera is given as a 3x4 projection matrix
``P = K [I | t]`` with shared K across the rectified pair and a pure-x
baseline offset (kitti/00/calib.txt rows P0/P1).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class StereoCalib(NamedTuple):
    """Rectified stereo calibration derived from two 3x4 projection matrices.

    Mirrors the scalar intrinsics the reference derives at VO.m:35-48:
    fu, fv focal lengths; cu, cv principal point; baseline (VO.m:47, T = bx2-bx1).
    """

    P1: jnp.ndarray  # [3, 4] left projection
    P2: jnp.ndarray  # [3, 4] right projection
    fu: jnp.ndarray  # scalar
    fv: jnp.ndarray
    cu: jnp.ndarray
    cv: jnp.ndarray
    baseline: jnp.ndarray  # scalar, meters
    image_size: tuple  # (height, width) — static python ints

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [
                [self.fu, 0.0, self.cu],
                [0.0, self.fv, self.cv],
                [0.0, 0.0, 1.0],
            ],
            dtype=self.P1.dtype,
        )


def calib_from_projections(P1, P2, image_size=(376, 1241), dtype=jnp.float32) -> StereoCalib:
    """Derive scalar intrinsics + baseline like VO.m:35-48."""
    P1 = jnp.asarray(P1, dtype=dtype)
    P2 = jnp.asarray(P2, dtype=dtype)
    fu1, fv1 = P1[0, 0], P1[1, 1]
    cu1, cv1 = P1[0, 2], P1[1, 2]
    bx1 = -P1[0, 3] / fu1
    bx2 = -P2[0, 3] / P2[0, 0]
    return StereoCalib(
        P1=P1,
        P2=P2,
        fu=fu1,
        fv=fv1,
        cu=cu1,
        cv=cv1,
        baseline=bx2 - bx1,
        image_size=tuple(int(s) for s in image_size),
    )


def scale_calib(calib: StereoCalib, image_size) -> StereoCalib:
    """Rescale a calibration to a new (H, W) image size.

    Focal lengths / principal point / P-matrix translation columns scale with
    the resize ratio; the metric baseline is invariant. Used by the synthetic
    renderer so reduced-resolution test frames keep a geometrically sensible
    field of view (principal point inside the image).
    """
    H0, W0 = calib.image_size
    H1, W1 = (int(s) for s in image_size)
    sy, sx = H1 / H0, W1 / W0
    S = jnp.asarray([[sx, 0.0, 0.0], [0.0, sy, 0.0], [0.0, 0.0, 1.0]], calib.P1.dtype)
    return calib_from_projections(S @ calib.P1, S @ calib.P2, image_size=(H1, W1))


def project(P: jnp.ndarray, pts3d: jnp.ndarray) -> jnp.ndarray:
    """Project [..., N, 3] camera-frame points through a [3, 4] matrix -> [..., N, 2] px."""
    Xh = jnp.concatenate([pts3d, jnp.ones_like(pts3d[..., :1])], axis=-1)
    uvw = jnp.einsum("ij,...nj->...ni", P, Xh)
    return uvw[..., :2] / (uvw[..., 2:3] + 1e-32)


def project_pinhole(calib: StereoCalib, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points with the left intrinsics only (no baseline)."""
    z = pts_cam[..., 2:3]
    u = calib.fu * pts_cam[..., 0:1] / (z + 1e-32) + calib.cu
    v = calib.fv * pts_cam[..., 1:2] / (z + 1e-32) + calib.cv
    return jnp.concatenate([u, v], axis=-1)


def unproject_pinhole(calib: StereoCalib, px: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Lift [..., N, 2] pixels at [..., N] depth to camera-frame 3D."""
    x = (px[..., 0] - calib.cu) / calib.fu * depth
    y = (px[..., 1] - calib.cv) / calib.fv * depth
    return jnp.stack([x, y, depth], axis=-1)


def bearings(calib: StereoCalib, px: jnp.ndarray) -> jnp.ndarray:
    """Unit bearing vectors for [..., N, 2] pixels (left camera)."""
    x = (px[..., 0] - calib.cu) / calib.fu
    y = (px[..., 1] - calib.cv) / calib.fv
    v = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)
