"""Background refiner + trajectory correction propagation.

Covers the round-2 contract: BA / loop closure run OFF the frame critical
path (odometry.refiner), their keyframe corrections are propagated to EVERY
pose rigidly (odometry.correction), and the reference's every-Nth-frame
telemetry (VO.m:168-204) is actually invoked by the runner.
"""
import os

import numpy as np
import pytest

from vo_tpu.config import BAConfig, PipelineConfig, RansacConfig, SIFTConfig
from vo_tpu.eval import metrics
from vo_tpu.io import synthetic
from vo_tpu.odometry import runner
from vo_tpu.odometry.correction import reanchor_trajectory, rebuild_rel_poses


def _random_traj(rng, T):
    """Smooth random SE(3) trajectory as [T,4,4] float64."""
    poses = [np.eye(4)]
    for _ in range(T - 1):
        w = rng.normal(scale=0.02, size=3)
        t = rng.normal(scale=0.3, size=3) + np.array([0.0, 0.0, 1.0])
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        R = np.eye(3) + np.sinc(th / np.pi) * K + 0.5 * np.sinc(th / (2 * np.pi)) ** 2 * (K @ K)
        rel = np.eye(4)
        rel[:3, :3] = R
        rel[:3, 3] = t
        poses.append(poses[-1] @ rel)
    return np.stack(poses)


class TestReanchor:
    def test_keyframe_rows_become_exact(self):
        rng = np.random.default_rng(0)
        poses = _random_traj(rng, 40)
        kf_rows = np.array([5, 15, 25, 35])
        kf_fixed = _random_traj(rng, 4) + 0.0
        out = reanchor_trajectory(poses, kf_rows, kf_fixed)
        for j, r in enumerate(kf_rows):
            np.testing.assert_allclose(out[r], kf_fixed[j].astype(np.float32), atol=1e-4)

    def test_segments_move_rigidly(self):
        """Relative motion WITHIN a keyframe segment is preserved exactly."""
        rng = np.random.default_rng(1)
        poses = _random_traj(rng, 30)
        kf_rows = np.array([4, 14, 24])
        delta = np.eye(4)
        delta[0, 3] = 3.0  # shift all keyframes 3m in x
        kf_fixed = np.einsum("ij,kjl->kil", delta, poses[kf_rows])
        out = reanchor_trajectory(poses, kf_rows, kf_fixed).astype(np.float64)
        # rel pose between consecutive rows inside a segment is unchanged
        for t in range(5, 14):
            rel_old = np.linalg.inv(poses[t - 1]) @ poses[t]
            rel_new = np.linalg.inv(out[t - 1]) @ out[t]
            np.testing.assert_allclose(rel_new, rel_old, atol=1e-4)

    def test_rows_before_first_keyframe_unchanged(self):
        rng = np.random.default_rng(2)
        poses = _random_traj(rng, 20)
        out = reanchor_trajectory(poses, np.array([10]), poses[[10]] + 0.0)
        np.testing.assert_allclose(out[:10], poses[:10].astype(np.float32), atol=1e-5)

    def test_full_trajectory_ate_drops_after_correction(self):
        """VERDICT r1 item 3: the WHOLE trajectory (not just keyframes) must
        improve when keyframes are corrected back onto ground truth."""
        rng = np.random.default_rng(3)
        gt = _random_traj(rng, 60)
        # Inject linearly growing drift (the unclosed-loop failure mode of
        # the reference, 4500/map.png).
        drifted = gt.copy()
        for t in range(60):
            d = np.eye(4)
            d[0, 3] = 0.05 * t
            drifted[t] = d @ gt[t]
        kf_rows = np.arange(0, 60, 5)

        def rmse(est):
            e = np.linalg.norm(np.asarray(est, np.float64)[:, :3, 3] - gt[:, :3, 3], axis=1)
            return float(np.sqrt(np.mean(e**2)))

        ate_before = rmse(drifted)
        out = reanchor_trajectory(drifted, kf_rows, gt[kf_rows])
        ate_after = rmse(out)
        assert ate_after < 0.25 * ate_before, (ate_before, ate_after)
        # Non-keyframe rows specifically must improve too.
        non_kf = np.setdiff1d(np.arange(60), kf_rows)
        err_non_kf = np.linalg.norm(out[non_kf, :3, 3] - gt[non_kf, :3, 3], axis=1)
        assert err_non_kf.max() < 0.3, err_non_kf.max()

    def test_rebuild_rel_poses_consistent(self):
        rng = np.random.default_rng(4)
        poses = _random_traj(rng, 15).astype(np.float32)
        rels = rebuild_rel_poses(poses).astype(np.float64)
        p = np.asarray(poses, np.float64)
        np.testing.assert_allclose(rels[0], p[0], atol=1e-5)
        for t in range(1, 15):
            np.testing.assert_allclose(p[t - 1] @ rels[t], p[t], atol=1e-3)


@pytest.fixture(scope="module")
def small_cfg():
    return PipelineConfig(
        sift=SIFTConfig(max_keypoints=512, n_octaves=3),
        ransac=RansacConfig(n_hypotheses=128),
        ba=BAConfig(keyframe_every=2, window=6),
        max_tracks=384,
        view_3d=False,
    )


@pytest.fixture(scope="module")
def seq16():
    return synthetic.kitti_synthetic_sequence(n_frames=16, n_landmarks=3000, seed=7)


@pytest.mark.slow
class TestRefinerRunner:
    def test_ba_refiner_end_to_end(self, small_cfg, seq16):
        res = runner.run_sequence(seq16, small_cfg, warmup=False, use_ba=True)
        assert res.poses.shape[0] == 15
        assert np.isfinite(res.poses).all()
        assert res.refine_stats.get("n_keyframes", 0) >= 5
        assert res.refine_stats.get("ba_solves", 0) >= 1
        # rel_poses rebuilt from corrected absolutes: chain must reproduce them.
        p = np.concatenate([np.eye(4, dtype=np.float64)[None], res.poses.astype(np.float64)])
        for t in range(res.poses.shape[0]):
            np.testing.assert_allclose(
                p[t] @ res.rel_poses[t].astype(np.float64), p[t + 1], atol=5e-3
            )
        # Accuracy stays sane with refinement on.
        a = metrics.ate(res.poses, seq16.gt_poses)
        assert a["rmse"] < 1.0, a

    def test_ba_refiner_deterministic(self, small_cfg, seq16):
        """Lock-step refiner: two identical runs give identical trajectories."""
        r1 = runner.run_sequence(seq16, small_cfg, warmup=False, use_ba=True, seed=1)
        r2 = runner.run_sequence(seq16, small_cfg, warmup=False, use_ba=True, seed=1)
        np.testing.assert_array_equal(r1.poses, r2.poses)

    def test_viz_every_writes_reference_figure_dump(self, small_cfg, seq16, tmp_path):
        """VO.m:168-204 parity: img/<i>/{view,map,error,3d_map}.png appear."""
        import dataclasses

        cfg = dataclasses.replace(small_cfg, view_3d=True)
        viz = str(tmp_path / "img")
        res = runner.run_sequence(
            seq16, cfg, n_frames=12, warmup=False, viz_every=5, viz_dir=viz
        )
        assert res.poses.shape[0] == 11
        for i in (5, 10):
            d = os.path.join(viz, str(i))
            for name in ("view.png", "map.png", "error.png", "3d_map.png"):
                assert os.path.exists(os.path.join(d, name)), (i, name)


class TestPropagateClosure:
    """ADVICE r3 high: keyframes decimated out of the LoopCloser archive must
    follow their nearest surviving neighbor on closure, or reanchoring
    alternates between pre- and post-closure anchors (zigzag)."""

    def test_uniform_closure_moves_every_ledger_entry(self):
        from vo_tpu.odometry.refiner import propagate_closure

        rng = np.random.default_rng(5)
        chain = _random_traj(rng, 9).astype(np.float32)
        kf_order = list(range(9))
        kf_corrected = {i: chain[i].copy() for i in kf_order}
        kf_chain = {i: chain[i].copy() for i in kf_order}
        delta = np.eye(4)
        delta[0, 3] = 2.0
        # Survivors: even keyframes only (post-decimation archive), all
        # shifted by the same rigid closure delta.
        surv = {
            i: (delta @ chain[i].astype(np.float64)).astype(np.float32)
            for i in range(0, 9, 2)
        }
        propagate_closure(kf_order, kf_corrected, kf_chain, surv)
        for i in kf_order:  # decimated (odd) entries must move identically
            np.testing.assert_allclose(
                kf_corrected[i],
                (delta @ chain[i].astype(np.float64)).astype(np.float32),
                atol=1e-4,
            )

    def test_ba_offsets_survive_and_nearest_survivor_delta_used(self):
        from vo_tpu.odometry.refiner import propagate_closure

        rng = np.random.default_rng(6)
        chain = _random_traj(rng, 5).astype(np.float32)
        kf_order = list(range(5))
        # kf 1 (decimated) AND kf 4 (survivor) carry small window-BA offsets
        # on top of the chain pose — both must ride through the closure.
        ba_off = np.eye(4, dtype=np.float32)
        ba_off[1, 3] = 0.05
        kf_corrected = {i: chain[i].copy() for i in kf_order}
        kf_corrected[1] = (ba_off @ chain[1].astype(np.float64)).astype(np.float32)
        kf_corrected[4] = (ba_off @ chain[4].astype(np.float64)).astype(np.float32)
        kf_chain = {i: chain[i].copy() for i in kf_order}
        d0 = np.eye(4)
        d0[0, 3] = 1.0
        d4 = np.eye(4)
        d4[0, 3] = 3.0
        surv = {
            0: (d0 @ chain[0].astype(np.float64)).astype(np.float32),
            4: (d4 @ chain[4].astype(np.float64)).astype(np.float32),
        }
        propagate_closure(kf_order, kf_corrected, kf_chain, surv)
        # kf 1 is nearest survivor 0: gets d0, BA offset preserved on top.
        np.testing.assert_allclose(
            kf_corrected[1],
            (d0 @ ba_off @ chain[1].astype(np.float64)).astype(np.float32),
            atol=1e-4,
        )
        # chain ledger stays BA-free.
        np.testing.assert_allclose(
            kf_chain[1], (d0 @ chain[1].astype(np.float64)).astype(np.float32), atol=1e-4
        )
        # kf 3 is nearest survivor 4: gets d4.
        np.testing.assert_allclose(
            kf_corrected[3], (d4 @ chain[3].astype(np.float64)).astype(np.float32), atol=1e-4
        )
        # Survivor 4's BA offset rides through the closure too (adjacent
        # anchors stay consistent at the BA-offset scale).
        np.testing.assert_allclose(
            kf_corrected[4],
            (d4 @ ba_off @ chain[4].astype(np.float64)).astype(np.float32),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            kf_chain[4], (d4 @ chain[4].astype(np.float64)).astype(np.float32), atol=1e-4
        )


class TestLoopCloserCapacity:
    def test_decimation_beyond_capacity(self):
        """Beyond max_keyframes the closer decimates instead of freezing."""
        from vo_tpu.io import kitti
        from vo_tpu.slam.loop_closure import ArchivedKeyframe, LoopCloser, LoopConfig

        calib = kitti.load_stereo_calib("/root/reference/kitti/00")
        cfg = LoopConfig(max_keyframes=8, min_gap=100)  # min_gap blocks detection
        lc = LoopCloser(calib, cfg)
        z2 = np.zeros((4, 2), np.float32)
        zd = np.zeros((4, 128), np.float32)
        zm = np.zeros(4, bool)
        for i in range(30):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = float(i)
            lc.add_keyframe(
                ArchivedKeyframe(
                    frame_idx=i, pose_c2w=pose, l_px=z2, r_px=z2, l_desc=zd, mask=zm
                )
            )
        assert lc.decimations >= 1
        assert len(lc.keyframes) <= cfg.max_keyframes
        # Newest keyframe always survives.
        assert lc.keyframes[-1].frame_idx == 29
        # Coverage spans the whole run (first keyframe kept).
        assert lc.keyframes[0].frame_idx == 0

    def test_decimation_reanchors_loop_edges(self):
        """Loop edges whose endpoint is decimated must survive, reanchored
        onto the nearest surviving keyframe with a consistent measurement
        (previously dropped — each closure's constraint died at the next
        decimation)."""
        from vo_tpu.io import kitti
        from vo_tpu.slam.loop_closure import ArchivedKeyframe, LoopCloser, LoopConfig

        calib = kitti.load_stereo_calib("/root/reference/kitti/00")
        cfg = LoopConfig(max_keyframes=8, min_gap=100)
        lc = LoopCloser(calib, cfg)
        z2 = np.zeros((4, 2), np.float32)
        zd = np.zeros((4, 128), np.float32)
        zm = np.zeros(4, bool)
        poses = []
        for i in range(8):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = float(i)
            poses.append(pose)
            lc.add_keyframe(
                ArchivedKeyframe(
                    frame_idx=i, pose_c2w=pose, l_px=z2, r_px=z2, l_desc=zd, mask=zm
                )
            )
        # Consistent loop edge between keyframes 1 and 7 (both odd: endpoint
        # 1 and 7... keep=0,2,4,6,7+newest — endpoint 1 will be decimated).
        Z = np.linalg.inv(poses[1].astype(np.float64)) @ poses[7].astype(np.float64)
        lc.loop_edges.append((1, 7, Z.astype(np.float32)))
        # 9th keyframe triggers decimation.
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 8.0
        lc.add_keyframe(
            ArchivedKeyframe(frame_idx=8, pose_c2w=pose, l_px=z2, r_px=z2, l_desc=zd, mask=zm)
        )
        assert lc.decimations == 1
        assert len(lc.loop_edges) == 1, "reanchored edge was dropped"
        a, b, Zn = lc.loop_edges[0]
        Ta = lc.keyframes[a].pose_c2w.astype(np.float64)
        Tb = lc.keyframes[b].pose_c2w.astype(np.float64)
        # Constraint consistency: T_a' @ Z' == T_b' (poses are exact here).
        np.testing.assert_allclose(Ta @ Zn, Tb, atol=1e-4)
