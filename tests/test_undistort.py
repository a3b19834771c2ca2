"""Undistortion stage: identity fast path (KITTI) + plumb-bob remap."""
import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.io import undistort


def test_identity_model_is_noop(kitti_calib):
    u = undistort.Undistorter(kitti_calib)  # no coefficients: VO.m:50-51
    assert u.identity
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, 64)), jnp.float32)
    out = u(img)
    assert out is img  # literally no work


def test_remap_inverts_distortion(kitti_calib):
    """Distort a synthetic image, undistort it, compare to the original."""
    rng = np.random.default_rng(1)
    H, W = kitti_calib.image_size
    # Smooth image so interpolation error is small.
    yy, xx = np.mgrid[0:H, 0:W]
    img = 0.5 + 0.3 * np.sin(xx / 40.0) * np.cos(yy / 30.0)
    model = undistort.DistortionModel(k1=-0.05, k2=0.002, p1=1e-4, p2=-1e-4)
    assert not model.is_identity

    # Forward-distort the image: sample original at distorted positions.
    remap = undistort.build_remap(kitti_calib, model)
    distorted = np.asarray(undistort.undistort_image(jnp.asarray(img, jnp.float32), jnp.asarray(remap)))
    # undistort_image with the same map applied to the distorted image is NOT
    # the inverse; instead verify the remap agrees with the forward model at
    # feature positions: a point at undistorted (u,v) must have been sampled
    # from distort(u,v).
    fu, cv_, cu = float(kitti_calib.fu), float(kitti_calib.cv), float(kitti_calib.cu)
    fv = float(kitti_calib.fv)
    for u, v in [(200.0, 100.0), (900.0, 300.0), (620.0, 190.0)]:
        xn, yn = (u - cu) / fu, (v - cv_) / fv
        xd, yd = undistort.distort_normalized(np.array([xn]), np.array([yn]), model)
        exp_u, exp_v = xd[0] * fu + cu, yd[0] * fv + cv_
        got_v, got_u = remap[int(v), int(u)]
        assert abs(got_u - exp_u) < 1.0 and abs(got_v - exp_v) < 1.0


def test_center_pixel_fixed_point(kitti_calib):
    """The principal point is a fixed point of radial distortion."""
    model = undistort.DistortionModel(k1=-0.1)
    remap = undistort.build_remap(kitti_calib, model)
    cv_, cu = int(float(kitti_calib.cv)), int(float(kitti_calib.cu))
    src = remap[cv_, cu]
    assert abs(src[1] - float(kitti_calib.cu)) < 1.5
    assert abs(src[0] - float(kitti_calib.cv)) < 1.5
