import os

import jax.numpy as jnp
import numpy as np

from vo_tpu.geom import camera, triangulate
from vo_tpu.io import kitti, synthetic


def test_calib_parse(kitti_calib):
    # Known values from kitti/00/calib.txt rows P0/P1 (cf. VO.m:35-48).
    assert np.isclose(float(kitti_calib.fu), 718.856, atol=1e-3)
    assert np.isclose(float(kitti_calib.cu), 607.1928, atol=1e-3)
    assert np.isclose(float(kitti_calib.cv), 185.2157, atol=1e-3)
    assert np.isclose(float(kitti_calib.baseline), 0.5372, atol=1e-3)


def test_times_and_poses(ref_root, gt_poses):
    times = kitti.read_times(os.path.join(ref_root, "kitti", "00", "times.txt"))
    assert times.shape[0] == 4541
    assert np.isclose(np.diff(times).mean(), 0.10374, atol=1e-3)
    assert gt_poses.shape == (4541, 4, 4)
    np.testing.assert_allclose(gt_poses[0], np.eye(4), atol=1e-8)


def test_project_unproject_roundtrip(kitti_calib, rng):
    pts = np.stack(
        [rng.uniform(-10, 10, 100), rng.uniform(-3, 3, 100), rng.uniform(4, 60, 100)], axis=-1
    )
    px = camera.project_pinhole(kitti_calib, jnp.asarray(pts, jnp.float32))
    back = camera.unproject_pinhole(kitti_calib, px, jnp.asarray(pts[:, 2], jnp.float32))
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-3)


def test_triangulate_dlt_exact(kitti_calib, rng):
    pts = np.stack(
        [rng.uniform(-15, 15, 200), rng.uniform(-4, 4, 200), rng.uniform(4, 70, 200)], axis=-1
    )
    P1 = np.asarray(kitti_calib.P1, np.float64)
    P2 = np.asarray(kitti_calib.P2, np.float64)
    px1 = synthetic.project_np(P1, pts)
    px2 = synthetic.project_np(P2, pts)
    X = triangulate.triangulate_dlt(
        jnp.asarray(px1, jnp.float32), jnp.asarray(px2, jnp.float32), kitti_calib.P1, kitti_calib.P2
    )
    err = np.linalg.norm(np.asarray(X) - pts, axis=-1)
    rel = err / pts[:, 2]
    assert np.median(rel) < 5e-3  # f32 DLT; depth-relative error
    assert np.all(rel < 0.05)


def test_triangulate_rectified_matches_dlt(kitti_calib, rng):
    pts = np.stack(
        [rng.uniform(-15, 15, 200), rng.uniform(-4, 4, 200), rng.uniform(4, 70, 200)], axis=-1
    )
    P1 = np.asarray(kitti_calib.P1, np.float64)
    P2 = np.asarray(kitti_calib.P2, np.float64)
    px1 = synthetic.project_np(P1, pts)
    px2 = synthetic.project_np(P2, pts)
    X = triangulate.triangulate_rectified(
        jnp.asarray(px1, jnp.float32), jnp.asarray(px2, jnp.float32), kitti_calib
    )
    np.testing.assert_allclose(np.asarray(X), pts, rtol=2e-3, atol=2e-2)


def test_triangulate_noise_robust(kitti_calib, rng):
    # With 0.5 px noise, depth error should stay bounded for nearby points.
    pts = np.stack(
        [rng.uniform(-10, 10, 500), rng.uniform(-3, 3, 500), rng.uniform(5, 25, 500)], axis=-1
    )
    P1 = np.asarray(kitti_calib.P1, np.float64)
    P2 = np.asarray(kitti_calib.P2, np.float64)
    px1 = synthetic.project_np(P1, pts) + rng.normal(scale=0.5, size=(500, 2))
    px2 = synthetic.project_np(P2, pts) + rng.normal(scale=0.5, size=(500, 2))
    X = triangulate.triangulate_rectified(
        jnp.asarray(px1, jnp.float32), jnp.asarray(px2, jnp.float32), kitti_calib
    )
    err = np.abs(np.asarray(X)[:, 2] - pts[:, 2])
    assert np.median(err / pts[:, 2]) < 0.05


def test_synthetic_tracks_consistency(kitti_calib, gt_poses, rng):
    lm = synthetic.scatter_landmarks(rng, gt_poses[:20], 2000)
    tr = synthetic.make_tracks(rng, kitti_calib, gt_poses[0], gt_poses[1], lm)
    assert tr.px_cur_l.shape[0] > 100
    # Triangulating prev stereo pixels must recover pts_prev_cam.
    X = triangulate.triangulate_rectified(
        jnp.asarray(tr.px_prev_l, jnp.float32), jnp.asarray(tr.px_prev_r, jnp.float32), kitti_calib
    )
    np.testing.assert_allclose(np.asarray(X), tr.pts_prev_cam, rtol=5e-3, atol=5e-2)
    # rel_pose maps cur-camera points into prev-camera coords.
    mapped = tr.pts_cur_cam @ tr.rel_pose[:3, :3].T + tr.rel_pose[:3, 3]
    np.testing.assert_allclose(mapped, tr.pts_prev_cam, atol=1e-4)
