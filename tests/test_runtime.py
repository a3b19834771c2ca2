"""Checkpoint/resume, figure generation, and CLI surface."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from vo_tpu.config import LandmarkConfig, PipelineConfig, RansacConfig, SIFTConfig


def small_cfg():
    return PipelineConfig(
        sift=SIFTConfig(max_keypoints=256, n_octaves=3),
        ransac=RansacConfig(n_hypotheses=128),
        landmarks=LandmarkConfig(capacity=20000),
        max_tracks=256,
    )


@pytest.fixture(scope="module")
def small_seq():
    from vo_tpu.io import synthetic

    return synthetic.kitti_synthetic_sequence(
        n_frames=8, n_landmarks=800, seed=3, image_size=(128, 256)
    )


@pytest.mark.slow
def test_checkpoint_resume_bitexact(tmp_path, small_seq):
    """Full run == checkpointed run resumed mid-way (same poses, same map)."""
    from vo_tpu.odometry import runner

    cfg = small_cfg()
    ck = str(tmp_path / "ck.npz")
    full = runner.run_sequence(small_seq, cfg, n_frames=8, warmup=False)
    # Run only 5 frames (checkpoint at 5), then resume to 8.
    part = runner.run_sequence(
        small_seq, cfg, n_frames=5, warmup=False, checkpoint_path=ck, checkpoint_every=5
    )
    assert os.path.exists(ck)
    resumed = runner.run_sequence(
        small_seq, cfg, n_frames=8, warmup=False, checkpoint_path=ck, resume=True
    )
    assert resumed.poses.shape == full.poses.shape
    np.testing.assert_allclose(resumed.poses, full.poses, atol=1e-5)
    assert resumed.landmarks.shape == full.landmarks.shape
    np.testing.assert_allclose(resumed.landmarks, full.landmarks, atol=1e-4)


@pytest.mark.slow
def test_refined_resume_bit_exact(tmp_path):
    """Mid-run interrupt + resume of a --loop-closure --ba run reproduces the
    uninterrupted trajectory BIT-exactly (VERDICT r5 item 7): the v2
    checkpoint round-trips the refiner ledgers, LoopCloser archive (incl.
    descriptors), loop edges, in-flight pipelined rounds and the
    associator rings, and the worker has no timing-dependent branches."""
    import dataclasses

    import numpy as np

    from vo_tpu.io import kitti, synthetic
    from vo_tpu.odometry import runner

    # Out-and-back GT so the closure machinery (archive, candidates,
    # verification rounds) actually engages state worth checkpointing.
    gt = kitti.read_poses("/root/reference/kitti/poses/00.txt")
    half = gt[:18]
    poses = np.concatenate([half, half[::-1]])[:34]
    calib = kitti.load_stereo_calib("/root/reference/kitti/00")
    from vo_tpu.geom.camera import scale_calib

    seq = synthetic.SyntheticSequence(
        scale_calib(calib, (128, 256)), poses, n_landmarks=900, seed=6
    )
    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg,
        ba=dataclasses.replace(cfg.ba, keyframe_every=4, window=4),
        loop=dataclasses.replace(cfg.loop, min_gap=2, verify_cooldown=1),
    )
    kw = dict(use_ba=True, use_loop_closure=True, warmup=False)
    # Uninterrupted reference (non-deferred path to match the resumed run).
    full = runner.run_sequence(seq, cfg, n_frames=34, progress=lambda i, s: None, **kw)
    ck = str(tmp_path / "ck_refined.npz")
    runner.run_sequence(
        seq, cfg, n_frames=18, checkpoint_path=ck, checkpoint_every=18, **kw
    )
    assert os.path.exists(ck)
    resumed = runner.run_sequence(
        seq, cfg, n_frames=34, checkpoint_path=ck, resume=True, **kw
    )
    assert resumed.poses.shape == full.poses.shape
    assert np.array_equal(resumed.poses, full.poses), (
        np.abs(resumed.poses - full.poses).max()
    )
    assert np.array_equal(resumed.n_inliers, full.n_inliers)
    assert np.array_equal(resumed.pose_ok, full.pose_ok)
    assert resumed.refine_stats["n_keyframes"] == full.refine_stats["n_keyframes"]
    assert resumed.refine_stats["loops_closed"] == full.refine_stats["loops_closed"]


def test_checkpoint_roundtrip_fields(tmp_path, small_seq):
    from vo_tpu.odometry import checkpoint, landmarks as lm_mod, runner
    from vo_tpu.odometry.pipeline import init_state

    cfg = small_cfg()
    import jax

    st = init_state(cfg)
    lmap = lm_mod.init_map(cfg.landmarks)
    key = jax.random.PRNGKey(9)
    p = str(tmp_path / "c.npz")
    checkpoint.save(p, st, lmap, np.zeros((2, 4, 4)), np.zeros((2, 4, 4)), key, 3)
    ck = checkpoint.load(p)
    assert ck.frame_idx == 3
    np.testing.assert_array_equal(np.asarray(ck.key), np.asarray(key))
    assert int(ck.lmap.count) == 0
    assert ck.poses.shape == (2, 4, 4)


def test_figures_write(tmp_path):
    from vo_tpu.viz import figures

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 128)).astype(np.float32)
    n = 20
    cur = rng.uniform(0, 120, (n, 2))
    old = cur + rng.normal(0, 2, (n, 2))
    mask = np.ones(n, bool)
    p1 = figures.feed_view(img, cur, old, rng.uniform(0, 5, n), mask, path=str(tmp_path / "view.png"))
    poses = np.tile(np.eye(4), (10, 1, 1))
    poses[:, 0, 3] = np.arange(10)
    p2 = figures.trajectory_map(poses, poses, path=str(tmp_path / "map.png"))
    p3 = figures.error_curve(rng.uniform(0, 3, 10), path=str(tmp_path / "err.png"))
    p4 = figures.map_3d(rng.uniform(-5, 5, (100, 3)), poses, path=str(tmp_path / "3d.png"))
    for p in (p1, p2, p3, p4):
        assert os.path.getsize(p) > 1000


@pytest.mark.slow
def test_cli_run_synthetic(tmp_path):
    """End-to-end CLI: synthetic run writes trajectory, metrics, figures."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = str(tmp_path / "out")
    r = subprocess.run(
        [
            sys.executable, "-m", "vo_tpu", "run", "--synthetic", "--frames", "6",
            "--out", out, "--cpu", "--max-keypoints", "256", "--hypotheses", "128",
        ],
        capture_output=True, text=True, timeout=560, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "trajectory.npz"))
    m = json.load(open(os.path.join(out, "metrics.json")))
    assert "ate" in m and np.isfinite(m["ate"]["rmse"])
    assert os.path.exists(os.path.join(out, "map.png"))


def test_cli_missing_data_errors():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "vo_tpu", "run", "--data", "/nonexistent_dir"],
        capture_output=True, text=True, timeout=240, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode != 0
