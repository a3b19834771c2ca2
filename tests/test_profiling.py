"""Observability utilities: stage timers, metrics JSONL, console telemetry."""
import json
import pytest

import numpy as np

from vo_tpu.utils import profiling


def test_stage_timer():
    t = profiling.StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["calls"] == 2 and s["b"]["calls"] == 1
    assert "a" in t.report()


def test_metrics_log_jsonl(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = profiling.MetricsLog(p)
    m.log(0, n_tracks=np.int64(5), err=np.float32(1.5), arr=np.array([1.0, 2.0]))
    m.log(1, n_tracks=7, err=0.5)
    m.close()
    rows = [json.loads(l) for l in open(p)]
    assert rows[0]["frame"] == 0 and rows[0]["n_tracks"] == 5
    assert rows[0]["arr"] == [1.0, 2.0]
    assert rows[1]["err"] == 0.5


def test_pretty_frame():
    rel = np.eye(4)
    rel[:3, 3] = [1.0, 0.0, 0.5]
    pose = np.eye(4)
    s = profiling.pretty_frame(7, rel, pose, dt=0.1)
    assert "frame 7" in s and "km/h" in s


@pytest.mark.slow
def test_runner_metrics_path(tmp_path):
    from vo_tpu.io import synthetic
    from vo_tpu.odometry import runner
    from vo_tpu.config import LandmarkConfig, PipelineConfig, RansacConfig, SIFTConfig

    seq = synthetic.kitti_synthetic_sequence(
        n_frames=3, n_landmarks=500, seed=5, image_size=(128, 256)
    )
    cfg = PipelineConfig(
        sift=SIFTConfig(max_keypoints=128, n_octaves=2),
        ransac=RansacConfig(n_hypotheses=64),
        landmarks=LandmarkConfig(capacity=5000),
        max_tracks=128,
    )
    p = str(tmp_path / "metrics.jsonl")
    runner.run_sequence(seq, cfg, n_frames=3, warmup=False, metrics_path=p)
    rows = [json.loads(l) for l in open(p)]
    assert len(rows) == 3
    assert {"n_tracks", "n_inliers", "inlier_ratio", "frame_ms"} <= set(rows[0])


def test_debug_utils():
    import jax.numpy as jnp

    from vo_tpu.utils import debug

    with debug.nan_debug():
        pass
    with debug.compile_logging():
        pass
    assert debug.check_determinism(lambda x: x * 2, jnp.arange(4.0))
    import itertools

    counter = itertools.count()
    assert not debug.check_determinism(lambda x: x + next(counter), jnp.arange(4.0))
