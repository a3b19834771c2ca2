"""Distributed components on the 8-device virtual CPU mesh (conftest XLA_FLAGS)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.config import MatcherConfig, MeshConfig, RansacConfig, SIFTConfig
from vo_tpu.dist import frontend_batch, mesh as mesh_mod, ransac_sharded
from vo_tpu.io import synthetic


def test_mesh_shapes():
    m = mesh_mod.make_mesh()
    assert m.shape["model"] == 8 and m.shape["data"] == 1
    m2 = mesh_mod.make_mesh(MeshConfig(data=2, model=4))
    assert m2.shape == {"data": 2, "model": 4}


@pytest.mark.slow
def test_sharded_ransac_matches_single(rng, kitti_calib, gt_poses):
    lm = synthetic.scatter_landmarks(rng, gt_poses[:10], 3000)
    tr = synthetic.make_tracks(
        rng, kitti_calib, gt_poses[2], gt_poses[3], lm, noise_px=0.3, outlier_frac=0.3
    )
    from vo_tpu.geom import triangulate

    X_prev = triangulate.triangulate_rectified(
        jnp.asarray(tr.px_prev_l, jnp.float32), jnp.asarray(tr.px_prev_r, jnp.float32), kitti_calib
    )
    n = tr.px_cur_l.shape[0]
    m = mesh_mod.make_mesh()
    cfg = RansacConfig(n_hypotheses=512)
    est = ransac_sharded.estimate_world_pose_sharded(
        jnp.asarray(tr.px_cur_l, jnp.float32),
        X_prev,
        jnp.ones(n, bool),
        kitti_calib,
        cfg,
        jax.random.PRNGKey(7),
        m,
    )
    assert bool(est.ok)
    got = np.asarray(est.pose_c2w)
    assert np.linalg.norm(got[:3, 3] - tr.rel_pose[:3, 3]) < 0.1
    assert np.linalg.norm(got[:3, :3] - tr.rel_pose[:3, :3]) < 0.01


def test_frame_parallel_detect():
    seq = synthetic.kitti_synthetic_sequence(
        n_frames=8, n_landmarks=600, seed=2, image_size=(128, 256)
    )
    frames = np.stack([seq.frame(i)[0] for i in range(8)]).astype(np.float32)
    m = mesh_mod.make_mesh(MeshConfig(data=8, model=1))
    cfg = SIFTConfig(max_keypoints=128, n_octaves=2)
    feats = frontend_batch.detect_batch(jnp.asarray(frames), cfg, m)
    assert feats.xy.shape == (8, 128, 2)
    counts = np.asarray(feats.mask.sum(axis=1))
    assert (counts > 5).all(), counts
    # Sharded result must equal the single-device vmap result.
    ref = jax.jit(jax.vmap(lambda im: __import__("vo_tpu.frontend.sift", fromlist=["sift"]).detect_and_describe(im, cfg)))(jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(feats.xy), np.asarray(ref.xy), atol=1e-5)


@pytest.mark.slow
def test_sharded_pose_graph_matches_single(rng, gt_poses):
    import jax.numpy as jnp

    from vo_tpu.ba import pose_graph
    from vo_tpu.config import MeshConfig
    from vo_tpu.dist import mesh as mesh_mod, pose_graph_sharded
    from vo_tpu.geom import se3

    K = 9
    gt = jnp.asarray(gt_poses[:K], jnp.float32)
    ei, ej, Z, em, ew = pose_graph.odometry_edges(gt)
    g = pose_graph.PoseGraph(
        T_c2w=gt, edge_i=ei, edge_j=ej, edge_T=Z, edge_mask=em, edge_weight=ew
    )
    # Perturb the poses so there is something to optimize.
    import numpy as np

    pert = np.asarray(gt).copy()
    pert[3][:3, 3] += [0.2, -0.1, 0.15]
    pert[6][:3, 3] += [-0.15, 0.05, 0.2]
    g = g._replace(T_c2w=jnp.asarray(pert))
    ref = pose_graph.optimize(g, iters=8)
    m = mesh_mod.make_mesh(MeshConfig(data=1, model=8))
    got = pose_graph_sharded.optimize_sharded(g, m, iters=8)
    np.testing.assert_allclose(np.asarray(got.T_c2w), np.asarray(ref.T_c2w), atol=2e-4)
    assert float(got.cost) < float(got.cost0)


@pytest.mark.slow
def test_scaling_harness_runs():
    from vo_tpu.dist import scaling

    rows = scaling.run(device_counts=(1, 4), frame_batch=4, image_size=(64, 128), n_hyp=256)
    assert len(rows) == 2
    assert rows[0]["devices"] == 1 and rows[1]["devices"] == 4
    assert rows[1]["frontend_efficiency"] > 0


def test_step_determinism(rng, kitti_calib):
    """Identical inputs -> bit-identical jitted step outputs (SURVEY §5 race/determinism)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vo_tpu.config import PipelineConfig, RansacConfig, SIFTConfig
    from vo_tpu.io import synthetic
    from vo_tpu.odometry.pipeline import init_state, make_jitted_step

    seq = synthetic.kitti_synthetic_sequence(
        n_frames=2, n_landmarks=500, seed=9, image_size=(128, 256)
    )
    cfg = PipelineConfig(
        sift=SIFTConfig(max_keypoints=128, n_octaves=2),
        ransac=RansacConfig(n_hypotheses=64),
        max_tracks=128,
    )
    step = make_jitted_step(seq.calib, cfg)
    l, r = seq.frame(0)
    l = jnp.asarray(l, jnp.float32)
    r = jnp.asarray(r, jnp.float32)
    key = jax.random.PRNGKey(3)
    s1, o1 = step(init_state(cfg), l, r, key)
    s2, o2 = step(init_state(cfg), l, r, key)
    np.testing.assert_array_equal(np.asarray(o1.pose_c2w), np.asarray(o2.pose_c2w))
    np.testing.assert_array_equal(np.asarray(s1.prev.desc if hasattr(s1.prev, 'desc') else s1.prev.l_desc), np.asarray(s2.prev.l_desc))
    np.testing.assert_array_equal(np.asarray(s1.prev.ids), np.asarray(s2.prev.ids))


@pytest.mark.slow
def test_integrated_mesh_run_matches_single(monkeypatch):
    """The PRODUCTION runner on a 2x4 mesh (detection data-sharded, RANSAC
    hypothesis-sharded — odometry.runner ``mesh=``, VERDICT r5 item 2) must
    reproduce the single-device trajectory. Hypothesis draws differ per
    shard (fold_in), so equivalence is at RANSAC-refinement tolerance, not
    bit-exact: both estimates refine on the same consensus set."""
    from vo_tpu.config import PipelineConfig
    from vo_tpu.eval import metrics
    from vo_tpu.odometry import runner

    seq = synthetic.kitti_synthetic_sequence(
        n_frames=8, n_landmarks=1500, seed=4, image_size=(188, 620)
    )
    cfg = PipelineConfig(
        sift=SIFTConfig(max_keypoints=384, n_octaves=3),
        ransac=RansacConfig(n_hypotheses=256),
        max_tracks=256,
    )
    mesh = mesh_mod.make_mesh(MeshConfig(data=2, model=4))
    res_mesh = runner.run_sequence(seq, cfg, warmup=False, mesh=mesh)
    res_single = runner.run_sequence(
        seq, cfg, warmup=False, progress=lambda i, s: None  # force single-step path
    )
    assert res_mesh.poses.shape == res_single.poses.shape
    assert np.array_equal(res_mesh.pose_ok, res_single.pose_ok)
    # Same consensus geometry: trajectories agree to refinement tolerance.
    d = np.linalg.norm(res_mesh.poses[:, :3, 3] - res_single.poses[:, :3, 3], axis=1)
    assert d.max() < 0.05, d
    a_mesh = metrics.ate(res_mesh.poses, seq.gt_poses)
    a_single = metrics.ate(res_single.poses, seq.gt_poses)
    assert abs(a_mesh["rmse"] - a_single["rmse"]) < 0.02
