import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.config import RansacConfig
from vo_tpu.geom import se3
from vo_tpu.io import synthetic
from vo_tpu.pose import p3p, ransac


def test_solve_quartic_known_roots(rng):
    # (x-1)(x-2)(x-3)(x-4) = x^4 -10x^3 +35x^2 -50x +24
    roots, valid = p3p.solve_quartic(
        *[jnp.asarray(np.full(1, v), jnp.float64) for v in (1.0, -10.0, 35.0, -50.0, 24.0)]
    )
    r = np.sort(np.asarray(roots)[0][np.asarray(valid)[0]])
    np.testing.assert_allclose(r, [1, 2, 3, 4], atol=1e-8)


def test_solve_quartic_complex_pairs():
    # (x^2+1)(x-1)(x-2): two real roots only.
    # x^4 -3x^3 +3x^2 -3x +2
    roots, valid = p3p.solve_quartic(
        *[jnp.asarray(np.full(1, v), jnp.float64) for v in (1.0, -3.0, 3.0, -3.0, 2.0)]
    )
    r = np.sort(np.asarray(roots)[0][np.asarray(valid)[0]])
    assert r.size >= 2
    got = sorted(set(np.round(r, 6)))
    np.testing.assert_allclose(got, [1.0, 2.0], atol=1e-6)


def test_solve_quartic_batch_f32(rng):
    # Random quartics with 4 known real roots, f32.
    n = 256
    R = rng.uniform(-3, 3, size=(n, 4)).astype(np.float32)
    c4 = np.ones(n, np.float32)
    c3 = -R.sum(1)
    c2 = np.zeros(n, np.float32)
    c1 = np.zeros(n, np.float32)
    c0 = np.zeros(n, np.float32)
    for i in range(n):
        r = R[i]
        c2[i] = (
            r[0] * r[1] + r[0] * r[2] + r[0] * r[3] + r[1] * r[2] + r[1] * r[3] + r[2] * r[3]
        )
        c1[i] = -(
            r[0] * r[1] * r[2] + r[0] * r[1] * r[3] + r[0] * r[2] * r[3] + r[1] * r[2] * r[3]
        )
        c0[i] = r.prod()
    roots, valid = p3p.solve_quartic(*[jnp.asarray(v) for v in (c4, c3, c2, c1, c0)])
    roots, valid = np.asarray(roots), np.asarray(valid)
    ok = 0
    for i in range(n):
        if valid[i].sum() < 4:
            continue
        if np.allclose(np.sort(roots[i]), np.sort(R[i]), atol=2e-2):
            ok += 1
    assert ok > 0.85 * n  # f32 + clustered roots: a few near-degenerate misses allowed


def _random_problem(rng, n_pts=50, noise=0.0):
    from vo_tpu.io import kitti

    calib = kitti.load_stereo_calib("/root/reference/kitti/00")
    # Ground-truth world->cam pose.
    w = rng.normal(size=3) * 0.2
    t = rng.normal(size=3) * np.array([2.0, 0.5, 2.0])
    R = np.asarray(se3.exp_so3(jnp.asarray(w, jnp.float64)))
    pts_cam = np.stack(
        [rng.uniform(-10, 10, n_pts), rng.uniform(-3, 3, n_pts), rng.uniform(5, 50, n_pts)],
        axis=-1,
    )
    # world pts: X_w = R_c2w (X_c - t_w2c)... define T_w2c = [R|t]; X_c = R X_w + t
    pts_world = (pts_cam - t) @ R  # R^T^T... X_w = R^T (X_c - t)
    px = np.stack(
        [
            calib.fu * pts_cam[:, 0] / pts_cam[:, 2] + calib.cu,
            calib.fv * pts_cam[:, 1] / pts_cam[:, 2] + calib.cv,
        ],
        axis=-1,
    )
    if noise:
        px = px + rng.normal(scale=noise, size=px.shape)
    T_w2c = np.eye(4)
    T_w2c[:3, :3] = R
    T_w2c[:3, 3] = t
    return calib, pts_world, px, T_w2c


def test_p3p_exact(rng):
    calib, pts_world, px, T_w2c = _random_problem(rng, n_pts=3)
    bear = np.asarray(ransac._bearings(jnp.asarray(px, jnp.float64), calib))
    sols = p3p.p3p_grunert(jnp.asarray(bear)[None], jnp.asarray(pts_world)[None])
    R_all = np.asarray(sols.R_w2c)[0]
    t_all = np.asarray(sols.t_w2c)[0]
    valid = np.asarray(sols.valid)[0]
    assert valid.any()
    errs = [
        np.linalg.norm(R_all[i] - T_w2c[:3, :3]) + np.linalg.norm(t_all[i] - T_w2c[:3, 3])
        for i in range(4)
        if valid[i]
    ]
    assert min(errs) < 1e-4


def test_ransac_clean(rng):
    calib, pts_world, px, T_w2c = _random_problem(rng, n_pts=100, noise=0.2)
    cfg = RansacConfig(n_hypotheses=256)
    est = ransac.estimate_world_pose(
        jnp.asarray(px, jnp.float32),
        jnp.asarray(pts_world, jnp.float32),
        jnp.ones(100, bool),
        calib,
        cfg,
        jax.random.PRNGKey(0),
    )
    assert bool(est.ok)
    T_c2w = np.linalg.inv(T_w2c)
    got = np.asarray(est.pose_c2w)
    assert np.linalg.norm(got[:3, 3] - T_c2w[:3, 3]) < 0.05
    assert np.linalg.norm(got[:3, :3] - T_c2w[:3, :3]) < 0.01
    assert int(est.n_inliers) > 80


def test_ransac_outliers(rng):
    calib, pts_world, px, T_w2c = _random_problem(rng, n_pts=200, noise=0.3)
    n_out = 80  # 40% outliers
    out_idx = rng.choice(200, n_out, replace=False)
    px = px.copy()
    px[out_idx] = np.stack([rng.uniform(0, 1241, n_out), rng.uniform(0, 376, n_out)], axis=-1)
    cfg = RansacConfig(n_hypotheses=512)
    est = ransac.estimate_world_pose(
        jnp.asarray(px, jnp.float32),
        jnp.asarray(pts_world, jnp.float32),
        jnp.ones(200, bool),
        calib,
        cfg,
        jax.random.PRNGKey(1),
    )
    assert bool(est.ok)
    T_c2w = np.linalg.inv(T_w2c)
    got = np.asarray(est.pose_c2w)
    assert np.linalg.norm(got[:3, 3] - T_c2w[:3, 3]) < 0.1
    # Outliers must be excluded from the consensus.
    inl = np.asarray(est.inliers)
    assert inl[out_idx].mean() < 0.1


def test_ransac_padded_mask(rng):
    calib, pts_world, px, T_w2c = _random_problem(rng, n_pts=64, noise=0.2)
    # Pad to 256 with garbage; mask marks the garbage invalid.
    pad_px = np.zeros((256, 2))
    pad_pts = np.zeros((256, 3))
    pad_px[:64] = px
    pad_pts[:64] = pts_world
    pad_px[64:] = rng.uniform(0, 1000, size=(192, 2))
    pad_pts[64:] = rng.normal(size=(192, 3)) * 100
    mask = np.zeros(256, bool)
    mask[:64] = True
    est = ransac.estimate_world_pose(
        jnp.asarray(pad_px, jnp.float32),
        jnp.asarray(pad_pts, jnp.float32),
        jnp.asarray(mask),
        calib,
        RansacConfig(n_hypotheses=256),
        jax.random.PRNGKey(2),
    )
    assert bool(est.ok)
    T_c2w = np.linalg.inv(T_w2c)
    got = np.asarray(est.pose_c2w)
    assert np.linalg.norm(got[:3, 3] - T_c2w[:3, 3]) < 0.05
    assert not np.asarray(est.inliers)[64:].any()


def test_ransac_too_few_points(rng):
    calib, pts_world, px, _ = _random_problem(rng, n_pts=16)
    mask = np.zeros(16, bool)
    mask[:4] = True  # below min_points=6
    est = ransac.estimate_world_pose(
        jnp.asarray(px, jnp.float32),
        jnp.asarray(pts_world, jnp.float32),
        jnp.asarray(mask),
        calib,
        RansacConfig(),
        jax.random.PRNGKey(3),
    )
    assert not bool(est.ok)


def test_ransac_on_kitti_tracks(kitti_calib, gt_poses, rng):
    """End-to-end geometry: synthetic KITTI tracks -> relative pose."""
    lm = synthetic.scatter_landmarks(rng, gt_poses[:10], 3000)
    tr = synthetic.make_tracks(
        rng, kitti_calib, gt_poses[4], gt_poses[5], lm, noise_px=0.3, outlier_frac=0.2
    )
    from vo_tpu.geom import triangulate

    X_prev = triangulate.triangulate_rectified(
        jnp.asarray(tr.px_prev_l, jnp.float32), jnp.asarray(tr.px_prev_r, jnp.float32), kitti_calib
    )
    n = tr.px_cur_l.shape[0]
    est = ransac.estimate_world_pose(
        jnp.asarray(tr.px_cur_l, jnp.float32),
        X_prev,
        jnp.ones(n, bool),
        kitti_calib,
        RansacConfig(n_hypotheses=512),
        jax.random.PRNGKey(4),
    )
    assert bool(est.ok)
    got = np.asarray(est.pose_c2w)
    # rel_pose = cam-i pose in frame i-1 coords == what estworldpose returns.
    t_err = np.linalg.norm(got[:3, 3] - tr.rel_pose[:3, 3])
    r_err = np.linalg.norm(got[:3, :3] - tr.rel_pose[:3, :3])
    assert t_err < 0.1, t_err
    assert r_err < 0.01, r_err
