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
