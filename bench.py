"""Headline benchmark: end-to-end VO frames/s on KITTI-resolution stereo.

Runs the full per-frame pipeline (SIFT detect+describe x2, stereo match,
4-view temporal cascade, batched triangulation, RANSAC-P3P, pose chain,
landmark insertion) over synthetic KITTI-geometry frames (real calib + real
GT poses from /root/reference/kitti; rendered textures) on the default JAX
device, and prints ONE JSON line.

Baseline anchor: the reference (MATLAB, single-threaded, scalar
triangulation loop VO.m:113-116, O(K*M) landmark scan VO.m:149) publishes no
fps; the camera rate of the dataset is 9.6 Hz (kitti/00/times.txt, SURVEY
S6) — the real-time bound the reference could not hit. ``vs_baseline`` is
frames/s divided by that 9.6 Hz real-time bound.
"""
from __future__ import annotations

import json
import time

import numpy as np

CAMERA_HZ = 9.6  # KITTI capture rate (kitti/00/times.txt) — the real-time bound
N_FRAMES = 30


class _Preloaded:
    """Pre-rendered frames so the timed loop measures device throughput, not host rasterization.

    Frames are pre-quantized to uint8 — the camera's native bit depth and
    what the real PNG loader (native/loader.cpp) hands the runner — so the
    timed loop ships 1 byte/px and does no host-side float math.
    """

    def __init__(self, seq, n):
        self.calib = seq.calib
        self.gt_poses = seq.gt_poses

        def q(img):
            a = np.asarray(img)
            if a.dtype != np.uint8:
                a = (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
            return a

        self.frames = [tuple(q(im) for im in seq.frame(i)) for i in range(n)]

    def __len__(self):
        return len(self.frames)

    def frame(self, i):
        return self.frames[i]


def main():
    import jax

    from vo_tpu.config import PipelineConfig
    from vo_tpu.eval import metrics
    from vo_tpu.io import synthetic
    from vo_tpu.odometry import runner

    seq = synthetic.kitti_synthetic_sequence(
        n_frames=N_FRAMES, n_landmarks=6000, seed=0
    )
    pre = _Preloaded(seq, N_FRAMES)
    cfg = PipelineConfig()
    # Warm run: compiles everything AND spins up the device/transfer path —
    # the first executed sequence after compile runs ~2x slower than steady
    # state on a tunneled TPU. The reported number is the steady-state
    # throughput of the second, identical run.
    runner.run_sequence(pre, cfg, n_frames=N_FRAMES)
    res = runner.run_sequence(pre, cfg, n_frames=N_FRAMES)

    ate = metrics.ate(res.poses, np.asarray(seq.gt_poses))
    fps = res.frames_per_sec
    print(
        json.dumps(
            {
                "metric": "frames_per_sec",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / CAMERA_HZ, 3),
                "ate_rmse_m": round(ate["rmse"], 4),
                "n_frames": N_FRAMES,
                "per_frame_ms": round(res.per_frame_ms, 2),
                "device": str(jax.devices()[0].platform),
            }
        )
    )


if __name__ == "__main__":
    main()
