"""End-to-end VO integration: synthetic KITTI-geometry sequence -> trajectory."""
import numpy as np
import pytest

from vo_tpu.config import PipelineConfig, RansacConfig, SIFTConfig
from vo_tpu.eval import metrics
from vo_tpu.io import synthetic
from vo_tpu.odometry import runner

pytestmark = pytest.mark.slow  # multi-minute on the 2-core CI host; fast path = -m "not slow"


@pytest.fixture(scope="module")
def result_and_seq():
    seq = synthetic.kitti_synthetic_sequence(n_frames=12, n_landmarks=3000, seed=3)
    cfg = PipelineConfig(
        sift=SIFTConfig(max_keypoints=768, n_octaves=3),
        ransac=RansacConfig(n_hypotheses=256),
        max_tracks=512,
    )
    res = runner.run_sequence(seq, cfg, warmup=False)
    return res, seq


def test_pipeline_tracks_and_inliers(result_and_seq):
    res, _ = result_and_seq
    assert res.poses.shape[0] == 11
    assert res.pose_ok.all(), res.pose_ok
    assert (res.n_tracks > 20).all(), res.n_tracks
    assert (res.n_inliers > 12).all(), res.n_inliers


def test_pipeline_trajectory_accuracy(result_and_seq):
    res, seq = result_and_seq
    # Frame-to-frame VO on clean synthetic frames: cm-level per-frame accuracy.
    err = metrics.xz_error(res.poses, seq.gt_poses)
    assert err.max() < 1.0, err
    a = metrics.ate(res.poses, seq.gt_poses)
    assert a["rmse"] < 0.6, a
    r = metrics.rpe(res.poses, seq.gt_poses)
    assert r["trans_rmse"] < 0.2, r


def test_pipeline_landmarks(result_and_seq):
    res, seq = result_and_seq
    assert res.landmarks.shape[0] > 200
    # Landmarks live in the world frame near the trajectory (depth gate 80 m).
    traj = seq.gt_poses[:12, :3, 3]
    center = traj.mean(0)
    d = np.linalg.norm(res.landmarks - center, axis=1)
    assert np.median(d) < 150.0
    # No spurious origin landmarks (the reference's CLF.m:2 bug is fixed).
    assert not np.any(np.all(res.landmarks == 0, axis=1))


def test_multi_step_matches_single_step():
    """The multi-frame fused step (pipeline.vo_step_multi, cfg.fused_group=4
    + a 3-frame single-step tail at n_frames=7) must reproduce the
    single-frame path: same ops and PRNG sequence, differing only by XLA's
    wider detection batching (reduction reordering at float tolerance). A
    per-frame ``progress`` consumer forces the single-step path for the
    reference run."""
    seq = synthetic.kitti_synthetic_sequence(
        n_frames=7, n_landmarks=1500, seed=2, image_size=(188, 620)
    )
    cfg = PipelineConfig(
        sift=SIFTConfig(max_keypoints=384, n_octaves=3),
        ransac=RansacConfig(n_hypotheses=128),
        max_tracks=256,
    )
    res_pair = runner.run_sequence(seq, cfg, warmup=False)  # deferred fast path
    res_single = runner.run_sequence(seq, cfg, warmup=False, progress=lambda i, s: None)
    assert res_pair.poses.shape == res_single.poses.shape
    assert np.abs(res_pair.poses - res_single.poses).max() < 1e-3
    assert np.array_equal(res_pair.pose_ok, res_single.pose_ok)
    assert np.abs(res_pair.n_tracks - res_single.n_tracks).max() <= 2


def test_pipeline_fallback_on_blank_frames():
    """Blank frames kill tracking; the step must fall back, not crash (SURVEY §5)."""
    seq = synthetic.kitti_synthetic_sequence(n_frames=4, n_landmarks=800, seed=5)

    class Blanked:
        calib = seq.calib
        gt_poses = seq.gt_poses

        def __len__(self):
            return 4

        def frame(self, i):
            if i == 2:
                z = np.zeros((376, 1241), np.float32)
                return z, z
            return seq.frame(i)

    cfg = PipelineConfig(
        sift=SIFTConfig(max_keypoints=512, n_octaves=3),
        ransac=RansacConfig(n_hypotheses=128),
        max_tracks=256,
        view_3d=False,
    )
    res = runner.run_sequence(Blanked(), cfg, warmup=False)
    assert res.poses.shape[0] == 3
    # Frame 2 (blank) must be flagged as fallback.
    assert not res.pose_ok[1]
