"""Measure the CPU-equivalent reference baseline (BASELINE.json config 1).

The reference (MATLAB, single-threaded, scalar triangulation loop
VO.m:113-116, O(K*M) landmark scan VO.m:149) publishes no frames/s, so the
">=10x the reference pipeline" target (BASELINE.md) needs a measured anchor:
this runs the SAME full pipeline (identical config, full 1241x376 KITTI
geometry, 100 stereo frames) on the CPU backend and writes CPU_BASELINE.json
at the repo root. bench.py reads that file and reports
``vs_baseline = tpu_fps / cpu_fps``.

Frames are pre-rendered and pre-quantized so the timed loop measures the
pipeline, not host rasterization — the same protocol bench.py uses on TPU.

Usage:  python tools/measure_cpu_baseline.py [--frames 100]
"""
from __future__ import annotations

import argparse
import json
import os
import platform
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # after import: sitecustomize overrides the env var

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CPU_BASELINE.json"))
    args = ap.parse_args()

    from bench import _Preloaded  # same preload/quantize protocol as the TPU bench
    from vo_tpu.config import PipelineConfig
    from vo_tpu.eval import metrics
    from vo_tpu.io import synthetic
    from vo_tpu.odometry import runner

    seq = synthetic.kitti_synthetic_sequence(n_frames=args.frames, n_landmarks=6000, seed=0)
    pre = _Preloaded(seq, args.frames)
    cfg = PipelineConfig()
    # Warm run compiles; second run is the measured steady state.
    runner.run_sequence(pre, cfg, n_frames=args.frames)
    res = runner.run_sequence(pre, cfg, n_frames=args.frames)
    ate = metrics.ate(res.poses, np.asarray(seq.gt_poses))

    payload = {
        "cpu_fps": round(res.frames_per_sec, 4),
        "per_frame_ms": round(res.per_frame_ms, 2),
        "n_frames": args.frames,
        "ate_rmse_m": round(ate["rmse"], 4),
        "device": str(jax.devices()[0].platform),
        "cpu": platform.processor() or platform.machine(),
        "n_cpus": os.cpu_count(),
        "config": "BASELINE.json config 1: full pipeline, 1241x376, default PipelineConfig",
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
