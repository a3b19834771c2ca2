"""Windowed BA inside the VO loop: trajectory not degraded, solver engaged."""
import numpy as np
import pytest

from vo_tpu.config import (
    BAConfig,
    LandmarkConfig,
    PipelineConfig,
    RansacConfig,
    SIFTConfig,
)
from vo_tpu.eval import metrics
from vo_tpu.io import synthetic
from vo_tpu.odometry import runner

pytestmark = pytest.mark.slow  # multi-minute on the 2-core CI host; fast path = -m "not slow"


@pytest.fixture(scope="module")
def seq():
    return synthetic.kitti_synthetic_sequence(
        n_frames=14, n_landmarks=1500, seed=6, image_size=(160, 320)
    )


def _cfg():
    return PipelineConfig(
        sift=SIFTConfig(max_keypoints=384, n_octaves=2),
        ransac=RansacConfig(n_hypotheses=128),
        landmarks=LandmarkConfig(capacity=30000),
        ba=BAConfig(window=5, max_points=512, iters=6, keyframe_every=2),
        max_tracks=384,
    )


def test_windowed_ba_runs_and_does_not_degrade(seq):
    cfg = _cfg()
    base = runner.run_sequence(seq, cfg, warmup=False)
    ba = runner.run_sequence(seq, cfg, warmup=False, use_ba=True)
    assert ba.poses.shape == base.poses.shape
    assert np.isfinite(ba.poses).all()
    a0 = metrics.ate(base.poses, seq.gt_poses)["rmse"]
    a1 = metrics.ate(ba.poses, seq.gt_poses)["rmse"]
    # BA must not blow up the trajectory; on clean synthetic data the
    # frame-to-frame estimate is already near-exact, so allow parity.
    assert a1 < max(2.0 * a0, 0.05), (a0, a1)


def test_windowed_ba_solver_engaged(seq):
    from vo_tpu.odometry.ba_runner import Keyframe, WindowedBA

    cfg = _cfg()
    wba = WindowedBA(seq.calib, cfg.ba)
    # Drive the real pipeline and feed keyframes manually to assert assembly.
    import jax
    import jax.numpy as jnp

    from vo_tpu.odometry.pipeline import init_state, make_jitted_step

    step = make_jitted_step(seq.calib, cfg)
    st = init_state(cfg)
    key = jax.random.PRNGKey(0)
    engaged = False
    for i in range(10):
        l, r = seq.frame(i)
        key, sub = jax.random.split(key)
        st, out = step(st, jnp.asarray(l, jnp.float32), jnp.asarray(r, jnp.float32), sub)
        if i > 0 and i % 2 == 0:
            wba.add_keyframe(
                Keyframe(
                    frame_idx=i,
                    pose_c2w=np.asarray(out.pose_c2w),
                    ids=np.asarray(st.prev.ids),
                    l_px=np.asarray(st.prev.l_xy),
                    r_px=np.asarray(st.prev.r_xy),
                    mask=np.asarray(st.prev.mask),
                )
            )
            if wba.optimize() is not None:
                engaged = True
    assert engaged
    assert wba.last_result is not None
    assert float(wba.last_result.cost) <= float(wba.last_result.cost0)
    assert int(wba.last_result.n_obs) > 30
