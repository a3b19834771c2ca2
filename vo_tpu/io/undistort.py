"""Lens undistortion stage.

Replaces ``undistortImage`` (VO.m:75-76). On KITTI odometry it is an exact
no-op — the cameraIntrinsics at VO.m:50-51 carries no distortion
coefficients and the images are pre-rectified — and the pipeline skips the
remap entirely in that case. For raw (unrectified) feeds the standard
plumb-bob (radial k1,k2,k3 + tangential p1,p2) model is provided as a
jittable inverse-map bilinear warp, precomputed once per calibration.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geom.camera import StereoCalib


class DistortionModel(NamedTuple):
    """Plumb-bob coefficients. All-zeros == identity (the KITTI case)."""

    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0

    @property
    def is_identity(self) -> bool:
        return all(abs(c) < 1e-12 for c in self)


def distort_normalized(xn: np.ndarray, yn: np.ndarray, d: DistortionModel):
    """Apply the forward distortion model to normalized coords (numpy, host)."""
    r2 = xn * xn + yn * yn
    radial = 1.0 + d.k1 * r2 + d.k2 * r2 * r2 + d.k3 * r2 * r2 * r2
    xd = xn * radial + 2.0 * d.p1 * xn * yn + d.p2 * (r2 + 2.0 * xn * xn)
    yd = yn * radial + d.p1 * (r2 + 2.0 * yn * yn) + 2.0 * d.p2 * xn * yn
    return xd, yd


def build_remap(calib: StereoCalib, d: DistortionModel) -> np.ndarray:
    """[H, W, 2] source-pixel map: for each undistorted pixel, where to sample.

    Computed once per calibration on the host (the classic inverse-map table);
    the per-frame work is only the bilinear gather in ``undistort_image``.
    """
    H, W = calib.image_size
    fu, fv = float(calib.fu), float(calib.fv)
    cu, cv = float(calib.cu), float(calib.cv)
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    xn = (u - cu) / fu
    yn = (v - cv) / fv
    xd, yd = distort_normalized(xn, yn, d)
    src_u = xd * fu + cu
    src_v = yd * fv + cv
    return np.stack([src_v, src_u], axis=-1).astype(np.float32)  # (y, x) order


def undistort_image(img: jnp.ndarray, remap: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp of [H, W] by a [H, W, 2] (y, x) source map. Jittable."""
    H, W = img.shape
    ys = remap[..., 0]
    xs = remap[..., 1]
    x0 = jnp.clip(jnp.floor(xs), 0, W - 2)
    y0 = jnp.clip(jnp.floor(ys), 0, H - 2)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    flat = img.reshape(-1)
    base = (y0.astype(jnp.int32) * W + x0.astype(jnp.int32)).reshape(-1)
    v00 = jnp.take(flat, base, mode="clip").reshape(H, W)
    v10 = jnp.take(flat, base + 1, mode="clip").reshape(H, W)
    v01 = jnp.take(flat, base + W, mode="clip").reshape(H, W)
    v11 = jnp.take(flat, base + W + 1, mode="clip").reshape(H, W)
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v10 * fx * (1 - fy)
        + v01 * (1 - fx) * fy
        + v11 * fx * fy
    )
    # Out-of-bounds source pixels -> 0 (undistortImage FillValues default).
    inb = (xs >= 0) & (xs <= W - 1) & (ys >= 0) & (ys <= H - 1)
    return jnp.where(inb, out, 0.0)


class Undistorter:
    """Per-camera undistortion with identity fast path (the KITTI case)."""

    def __init__(self, calib: StereoCalib, model: DistortionModel | None = None):
        self.model = model or DistortionModel()
        self.identity = self.model.is_identity
        self._remap = None if self.identity else jnp.asarray(build_remap(calib, self.model))
        self._warp = None if self.identity else jax.jit(undistort_image)

    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        if self.identity:
            return img
        return self._warp(img, self._remap)
