"""Loop closure: out-and-back trajectory, injected drift, graph correction."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.config import MatcherConfig, SIFTConfig
from vo_tpu.frontend.sift import detect_and_describe
from vo_tpu.frontend.track import stereo_features
from vo_tpu.io import kitti, synthetic
from vo_tpu.slam.loop_closure import ArchivedKeyframe, LoopCloser, LoopConfig

pytestmark = pytest.mark.slow  # multi-minute on the 2-core CI host; fast path = -m "not slow"


@pytest.fixture(scope="module")
def loop_setup():
    """Sequence that drives out along KITTI 00 and returns to the start."""
    calib = kitti.load_stereo_calib("/root/reference/kitti/00")
    gt = kitti.read_poses("/root/reference/kitti/poses/00.txt")
    fwd = gt[:10]
    back = gt[8::-1]
    poses = np.concatenate([fwd, back])  # 19 poses, ends where it started
    # SyntheticSequence rescales the calibration itself (scale_calib): use
    # seq.calib everywhere so the verifier's triangulation/P3P geometry
    # matches the rendered frames.
    seq = synthetic.SyntheticSequence(
        calib, poses, n_landmarks=2500, seed=12, image_size=(160, 320)
    )
    return seq, poses


def _keyframe(seq, i, pose, sift_cfg, mcfg, cap=384):
    l, r = seq.frame(i)
    fl = detect_and_describe(jnp.asarray(l, jnp.float32), sift_cfg)
    fr = detect_and_describe(jnp.asarray(r, jnp.float32), sift_cfg)
    sf = stereo_features(fl, fr, mcfg, cap)
    return ArchivedKeyframe(
        frame_idx=i,
        pose_c2w=np.asarray(pose, np.float32),
        l_px=np.asarray(sf.l_xy),
        r_px=np.asarray(sf.r_xy),
        l_desc=np.asarray(sf.l_desc),
        mask=np.asarray(sf.mask),
    )


def test_loop_detected_and_corrects_drift(loop_setup):
    seq, true_poses = loop_setup
    sift_cfg = SIFTConfig(max_keypoints=384, n_octaves=2)
    mcfg = MatcherConfig()
    cfg = LoopConfig(radius=8.0, min_gap=8, min_inliers=15, max_keyframes=32, graph_iters=10)
    lc = LoopCloser(seq.calib, cfg)

    # Drift: grows linearly along x, reaching ~2.2 m by the last keyframe —
    # clearly above LoopConfig.min_correction (closures exist for real
    # drift; sub-gate discrepancies are skipped as verification noise).
    n = len(true_poses)
    corrected = None
    drifted_last = None
    for i in range(n):
        drift = np.eye(4, dtype=np.float32)
        drift[0, 3] = 0.12 * i
        drifted = (drift @ true_poses[i]).astype(np.float32)
        kf = _keyframe(seq, i, drifted, sift_cfg, mcfg)
        res = lc.add_keyframe(kf)
        if res is not None:
            corrected = res
        drifted_last = drifted
    assert corrected is not None, "no loop closure fired"
    old_k, new_k = corrected["loop"]
    assert new_k - old_k >= cfg.min_gap
    T = corrected["corrected"]
    # The corrected final keyframe must be much closer to truth than drifted.
    err_drift = np.linalg.norm(drifted_last[:3, 3] - true_poses[-1][:3, 3])
    err_corr = np.linalg.norm(T[new_k][:3, 3] - true_poses[new_k][:3, 3])
    assert err_corr < 0.5 * err_drift, (err_drift, err_corr)


def test_appearance_channel_fires_beyond_radius(loop_setup):
    """Closure must fire when drift exceeds 2x the proximity radius: the
    appearance-retrieval channel (global descriptor matvec) proposes the
    revisit candidate that the metric gate can no longer see (VERDICT r2
    item 5 — the reference's own drift reaches 41 m, 4500/error.png, far
    beyond any usable metric radius)."""
    seq, true_poses = loop_setup
    sift_cfg = SIFTConfig(max_keypoints=384, n_octaves=2)
    mcfg = MatcherConfig()
    cfg = LoopConfig(radius=2.0, min_gap=8, min_inliers=15, max_keyframes=32, graph_iters=10)
    lc = LoopCloser(seq.calib, cfg)

    n = len(true_poses)
    fired = False
    for i in range(n):
        drift = np.eye(4, dtype=np.float32)
        drift[0, 3] = 0.30 * i  # ~5.4 m by the revisit: > 2x the 2 m radius
        drifted = (drift @ true_poses[i]).astype(np.float32)
        kf = _keyframe(seq, i, drifted, sift_cfg, mcfg)
        res = lc.add_keyframe(kf)
        if res is not None:
            fired = True
    assert fired, "appearance channel failed to close the loop under drift"

    # Control: with the appearance channel off, the same drift defeats the
    # metric gate and no loop fires.
    import dataclasses

    lc2 = LoopCloser(seq.calib, dataclasses.replace(cfg, appearance=False))
    fired2 = False
    for i in range(n):
        drift = np.eye(4, dtype=np.float32)
        drift[0, 3] = 0.30 * i
        drifted = (drift @ true_poses[i]).astype(np.float32)
        kf = _keyframe(seq, i, drifted, sift_cfg, mcfg)
        if lc2.add_keyframe(kf) is not None:
            fired2 = True
    assert not fired2, "metric-only gate unexpectedly fired despite drift"


def test_drift_aware_gate_closes_submeter_loop(loop_setup):
    """VERDICT r3 item 3: closure must fire at sub-``min_correction`` drift
    on a short loop. The old FIXED min_correction=1.0 m gate skipped every
    verified loop on sub-meter-drift runs (loops_closed=0 in every artifact
    through r3); the drift-aware gate floors at the verification-noise
    level (0.5 m for the full-query verifier — config.py), so 0.8 m of
    injected drift sits above the floor and below the old fixed gate."""
    seq, true_poses = loop_setup
    sift_cfg = SIFTConfig(max_keypoints=384, n_octaves=2)
    mcfg = MatcherConfig()
    cfg = LoopConfig(radius=8.0, min_gap=8, min_inliers=15, max_keyframes=32, graph_iters=10)
    lc = LoopCloser(seq.calib, cfg)
    n = len(true_poses)
    fired = False
    for i in range(n):
        drift = np.eye(4, dtype=np.float32)
        drift[0, 3] = 0.8 * i / (n - 1)  # reaches 0.8 m at the revisit
        drifted = (drift @ true_poses[i]).astype(np.float32)
        if lc.add_keyframe(_keyframe(seq, i, drifted, sift_cfg, mcfg)) is not None:
            fired = True
    assert fired, "drift-aware gate failed to close a 0.8 m-drift loop"


def test_no_false_loops_without_revisit(loop_setup):
    """A straight outbound path must not produce loop edges."""
    seq, _ = loop_setup
    calib = seq.calib
    gt = kitti.read_poses("/root/reference/kitti/poses/00.txt")
    sift_cfg = SIFTConfig(max_keypoints=256, n_octaves=2)
    mcfg = MatcherConfig()
    cfg = LoopConfig(radius=3.0, min_gap=5, min_inliers=15, max_keyframes=32)
    lc = LoopCloser(calib, cfg)
    seq2 = synthetic.SyntheticSequence(
        kitti.load_stereo_calib("/root/reference/kitti/00"),
        gt[:12], n_landmarks=1500, seed=3, image_size=(160, 320),
    )
    for i in range(12):
        kf = _keyframe(seq2, i, gt[i].astype(np.float32), sift_cfg, mcfg)
        assert lc.add_keyframe(kf) is None
    assert not lc.loop_edges


def test_runner_with_loop_closure_flag(loop_setup):
    """End-to-end: use_loop_closure runs and produces a finite trajectory."""
    from vo_tpu.config import BAConfig, LandmarkConfig, PipelineConfig, RansacConfig
    from vo_tpu.odometry import runner

    seq, true_poses = loop_setup
    cfg = PipelineConfig(
        sift=SIFTConfig(max_keypoints=256, n_octaves=2),
        ransac=RansacConfig(n_hypotheses=128),
        landmarks=LandmarkConfig(capacity=20000),
        ba=BAConfig(keyframe_every=2),
        max_tracks=256,
    )
    res = runner.run_sequence(seq, cfg, warmup=False, use_loop_closure=True)
    assert res.poses.shape[0] == len(true_poses) - 1
    assert np.isfinite(res.poses).all()
